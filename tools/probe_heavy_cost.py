"""Compiled-cost attribution of the heavy 11-flag phrase graph.

`tools/probe_heavy_breakdown.py` ablates flag groups by wall clock;
this probe asks XLA itself: compile the heavy batched core and read
`compiled.cost_analysis()` (flops / bytes accessed / transcendentals),
then compare against the chip's paper numbers to see how far from
speed-of-light the graph runs and WHICH resource bounds it.

Also dumps the optimized-HLO op histogram (fusion count, fft calls,
scatter/gather survivors, while loops) — the structural facts that
decide TPU throughput.

Usage: python tools/probe_heavy_cost.py [--light]
"""
from __future__ import annotations

import collections
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> int:
    from goofer_tpu.cli import _setup_compile_cache

    _setup_compile_cache()
    import jax

    from bench import _make_voicebank_sample
    from goofer_tpu.sampler import phrase as ph

    light = "--light" in sys.argv
    tmp = tempfile.mkdtemp(prefix="goofer_cost_")
    src = os.path.join(tmp, "a.wav")
    _make_voicebank_sample(src, 44100)

    heavy = "" if light else "sh30sr30sg40su40sj20st-30vf40es30pd40fw20fsta50"
    scale = ["C4", "D4", "E4", "F4", "G4", "A4", "B4", "C5", "A3", "G3"]
    notes = [ph.NoteSpec(src, scale[i % 10], length=690, consonant=60,
                         flags=heavy + f"t{(i % 7 - 3) * 10}")
             for i in range(80)]

    planned, _ = ph.plan_phrase(notes)
    groups = ph.group_planned(planned)
    print(f"{len(groups)} graph group(s)")

    for (rs, _sk), members in groups.items():
        b = len(members)
        # rebuild the dispatch args exactly like render_phrase.dispatch
        from goofer_tpu import config
        from goofer_tpu.sampler.render_core import default_scalars

        b_pad = config.bucket_batch(b) if rs.masked else b
        axes, stacked = [], []
        for k in ph.ARRAY_ORDER:
            first = members[0].arrays[k]
            if all(m.arrays[k] is first for m in members):
                axes.append(None)
                stacked.append(np.asarray(first))
            else:
                axes.append(0)
                rows = [np.asarray(m.arrays[k]) for m in members]
                rows += [rows[-1]] * (b_pad - b)
                stacked.append(np.stack(rows))
        base = default_scalars()
        sc = {}
        for k, dflt in base.items():
            if np.isscalar(dflt):
                sc[k] = np.full(b_pad, float(members[0].scalars.get(k, dflt)),
                                dtype=np.float32)
            else:
                row = np.asarray(members[0].scalars.get(k, dflt),
                                 dtype=np.float32)
                sc[k] = np.stack([row] * b_pad)
        keys = np.zeros((b_pad, 2), dtype=np.uint32)

        fn = ph._batched_core(rs, tuple(axes), True)
        t0 = time.perf_counter()
        lowered = fn.lower(*stacked, sc, keys)
        compiled = lowered.compile()
        print(f"\n== group b={b} pad={b_pad} n={rs.n} "
              f"(lower+compile {time.perf_counter() - t0:.1f}s)")

        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if ca:
            flops = ca.get("flops", 0.0)
            bytes_ = ca.get("bytes accessed", 0.0)
            trans = ca.get("transcendentals", 0.0)
            print(f"  flops {flops / 1e9:.2f} G   bytes {bytes_ / 1e9:.2f} GB"
                  f"   transcendentals {trans / 1e9:.3f} G")
            # v5e paper numbers: ~197 TFLOP/s bf16 (so ~98 f32-ish via
            # MXU), ~819 GB/s HBM.  Elementwise f32 on the VPU is
            # bandwidth-bound, so bytes/819GB/s is the floor.
            print(f"  speed-of-light: bandwidth {bytes_ / 819e9 * 1e3:.1f} ms"
                  f"   matmul-f32 {flops / 9.8e13 * 1e3:.2f} ms")

        try:
            ma = compiled.memory_analysis()
            if ma:
                # what the 60-81 MB persistent-cache entries are MADE OF:
                # generated code vs argument/output/temp buffers
                for attr in ("generated_code_size_in_bytes",
                             "argument_size_in_bytes",
                             "output_size_in_bytes",
                             "temp_size_in_bytes",
                             "serialized_size_in_bytes"):
                    v = getattr(ma, attr, None)
                    if v is not None:
                        print(f"  {attr:32s} {v / 1e6:10.2f} MB")
        except Exception as e:
            print(f"  memory_analysis unavailable: {e}")

        hlo = compiled.as_text()
        ops = collections.Counter(
            m.group(1) for m in re.finditer(
                r"^\s+(?:ROOT )?%?[\w.-]+ = \S+ (\w+)\(", hlo, re.M))
        total = sum(ops.values())
        print(f"  optimized-HLO ops: {total} total; top:")
        for op, cnt in ops.most_common(14):
            print(f"    {op:28s} {cnt}")
        for bad in ("gather", "scatter", "while", "fft", "custom-call",
                    "all-gather", "sort"):
            if ops.get(bad):
                pass  # already in histogram; kept for grep-ability
    return 0


if __name__ == "__main__":
    sys.exit(main())
