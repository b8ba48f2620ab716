"""Per-op HBM-traffic attribution of the heavy 11-flag phrase graph.

`tools/probe_heavy_cost.py` showed the graph is bandwidth-bound end to
end (239 GB accessed vs 169 GFLOP at batch 69: arithmetic intensity
~0.7 flop/byte, speed-of-light 292 ms vs ~470 ms measured).  This probe
answers WHERE the bytes go: it parses the optimized HLO's entry
computation, estimates each top-level instruction's HBM traffic as
(operand bytes + output bytes), and ranks opcodes — labelling fusions
by the notable primitives inside them (fft / cumsum / gather / rng /
dot / reduce) so the totals map back to source-level stages.

The estimate double-counts producer/consumer pairs relative to XLA's
own cost model but preserves RANKING, which is what optimization needs.

Usage: python tools/probe_hbm_breakdown.py [--light] [--top N]
"""
from __future__ import annotations

import collections
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

_DT_BYTES = {"f32": 4, "f16": 2, "bf16": 2, "f64": 8, "s32": 4, "u32": 4,
             "s8": 1, "u8": 1, "pred": 1, "s16": 2, "u16": 2, "c64": 8,
             "s64": 8, "u64": 8, "c128": 16}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(type_str: str) -> int:
    """Total bytes of an HLO type string; handles tuples by summing."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        b = _DT_BYTES.get(dt)
        if b is None:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * b
    return total


_INSTR_RE = re.compile(
    r"^\s+(?:ROOT\s+)?(%?[\w.-]+)\s+=\s+((?:\([^)]*\)|[\w\[\],{}/ ]+?))\s+"
    r"(\w+)\((.*)$")

_NOTABLE = ("fft", "gather", "scatter", "cumsum", "rng", "dot",
            "reduce-window", "reduce", "sort", "while", "concatenate",
            "reverse", "dynamic-slice", "dynamic-update-slice", "iota",
            "pad", "transpose")


def main() -> int:
    from goofer_tpu.cli import _setup_compile_cache

    _setup_compile_cache()

    from bench import _make_voicebank_sample
    from goofer_tpu.sampler import phrase as ph

    light = "--light" in sys.argv
    top_n = 25
    if "--top" in sys.argv:
        top_n = int(sys.argv[sys.argv.index("--top") + 1])

    tmp = tempfile.mkdtemp(prefix="goofer_hbm_")
    src = os.path.join(tmp, "a.wav")
    _make_voicebank_sample(src, 44100)

    heavy = "" if light else "sh30sr30sg40su40sj20st-30vf40es30pd40fw20fsta50"
    scale = ["C4", "D4", "E4", "F4", "G4", "A4", "B4", "C5", "A3", "G3"]
    notes = [ph.NoteSpec(src, scale[i % 10], length=690, consonant=60,
                         flags=heavy + f"t{(i % 7 - 3) * 10}")
             for i in range(80)]

    planned, _ = ph.plan_phrase(notes)
    groups = ph.group_planned(planned)

    # reuse probe_heavy_cost's dispatch reconstruction
    from goofer_tpu import config
    from goofer_tpu.sampler.render_core import default_scalars

    for (rs, _sk), members in groups.items():
        b = len(members)
        if b < 16:          # the big group carries the cost story
            continue
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
        compiled = fn.lower(*stacked, sc, keys).compile()
        hlo = compiled.as_text()

        # ---- split into computations; map fused computation -> label ----
        comp_bodies: dict[str, str] = {}
        cur = None
        for line in hlo.splitlines():
            m = re.match(r"^(?:ENTRY\s+)?%?([\w.-]+)\s+\([^)]*\)\s*->", line)
            if m:
                cur = m.group(1)
                comp_bodies[cur] = ""
            elif cur is not None:
                comp_bodies[cur] += line + "\n"

        entry_name = None
        for line in hlo.splitlines():
            m = re.match(r"^ENTRY\s+%?([\w.-]+)", line)
            if m:
                entry_name = m.group(1)
                break

        def label_fusion(body: str) -> str:
            found = [op for op in _NOTABLE
                     if re.search(rf"\b{op}\(", body)]
            return "fusion[" + (",".join(found[:3]) or "elementwise") + "]"

        # per-instruction types: build var -> type map from every line
        var_type: dict[str, str] = {}
        for line in hlo.splitlines():
            m = _INSTR_RE.match(line)
            if m:
                var_type[m.group(1).lstrip("%")] = m.group(2)

        by_kind: collections.Counter = collections.Counter()
        count_kind: collections.Counter = collections.Counter()
        entry_body = comp_bodies.get(entry_name, "")
        for line in entry_body.splitlines():
            m = _INSTR_RE.match(line)
            if not m:
                continue
            name, ty, op, rest = m.groups()
            out_b = shape_bytes(ty)
            # operand bytes: resolve named operands from the call args
            opnd_b = 0
            for om in re.finditer(r"%([\w.-]+)", rest):
                t = var_type.get(om.group(1))
                if t:
                    opnd_b += shape_bytes(t)
            kind = op
            if op == "fusion":
                cm = re.search(r"calls=%?([\w.-]+)", rest)
                body = comp_bodies.get(cm.group(1), "") if cm else ""
                kind = label_fusion(body)
            elif op == "custom-call":
                tm = re.search(r'custom_call_target="([^"]+)"', rest)
                kind = f"custom-call[{tm.group(1) if tm else '?'}]"
            by_kind[kind] += out_b + opnd_b
            count_kind[kind] += 1

        total = sum(by_kind.values())
        print(f"group b={b} pad={b_pad} n={rs.n}: entry traffic estimate "
              f"{total / 1e9:.1f} GB across "
              f"{sum(count_kind.values())} top-level ops")
        for kind, byt in by_kind.most_common(top_n):
            print(f"  {kind:44s} {byt / 1e9:8.2f} GB  x{count_kind[kind]}")
        break
    return 0


if __name__ == "__main__":
    sys.exit(main())
