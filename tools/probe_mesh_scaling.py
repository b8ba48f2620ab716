"""Virtual-mesh scaling probe (VERDICT r1 item 8): phrase-group renders
per second at dp = 1, 2, 4, 8 on the forced-CPU virtual mesh.

This measures SPMD overhead/scaling of the sharded full note render
(render_notes_sharded) — not TPU speed; the CPU backend stands in for
the mesh so the dp-scaling shape (dispatch + GSPMD partitioning costs)
is visible without multi-chip hardware.

Run: python tools/probe_mesh_scaling.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import __graft_entry__ as g  # noqa: E402

g._force_virtual_cpu(8)

import jax  # noqa: E402
import numpy as np  # noqa: E402

from goofer_tpu.parallel import make_mesh, render_notes_sharded  # noqa: E402
from goofer_tpu.sampler.phrase import ARRAY_ORDER  # noqa: E402
from goofer_tpu.sampler.render_core import default_scalars  # noqa: E402
from goofer_tpu.sampler.resampler import GooferResampler  # noqa: E402

SR, N_FFT, HOP = 44100, 1024, 256


def plan_note():
    ylen = 16384
    n_bins = N_FFT // 2 + 1
    t = ylen // HOP + 1
    env = (np.exp(-np.linspace(0, 5, n_bins))[:, None]
           * np.ones((1, t)) + 1e-5).astype(np.float32)
    f0i = np.full(ylen, 220.0)
    f0i[: ylen // 8] = 0.0
    vmask = (f0i > 75).astype(np.float64)
    forms = {i: np.full(t, 500.0 * i) for i in (1, 2, 3, 4)}
    r = GooferResampler("dry.wav", "/dev/null", "C4", 100, "t10B20", 0,
                        150, 40, 0, 100, 0, "!120", "AA", n_fft=N_FFT,
                        hop=HOP, autorender=False)
    return r.prepare(env, f0i, vmask, forms, SR, ylen, bucket=True)


def main():
    rs, arrays, scalars = plan_note()
    full = default_scalars()
    full.update(scalars)
    b_total = 8   # fixed batch; dp shards it
    axes = tuple(0 for _ in ARRAY_ORDER)
    stacked = [np.stack([np.asarray(arrays[k])] * b_total)
               for k in ARRAY_ORDER]
    sc = {k: np.stack([np.asarray(v, dtype=np.float32)] * b_total)
          for k, v in full.items()}
    keys = np.stack([np.zeros(b_total, np.uint32),
                     np.arange(b_total, dtype=np.uint32)], axis=1)

    for dp in (1, 2, 4, 8):
        mesh = make_mesh(dp, tp=1)
        t0 = time.perf_counter()
        out = render_notes_sharded(mesh, rs, axes, stacked, sc, keys)
        np.asarray(out)
        compile_s = time.perf_counter() - t0
        reps = 5
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = render_notes_sharded(mesh, rs, axes, stacked, sc, keys)
            np.asarray(out)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        print(f"dp={dp}: group({b_total} notes) med {med*1e3:8.1f} ms "
              f"-> {1.0/med:6.2f} groups/s  (first call {compile_s:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
