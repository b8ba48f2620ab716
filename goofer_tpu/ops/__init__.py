"""Pure-JAX DSP primitive layer (jit-able, static shapes).

Everything here is a pure function of arrays + static Python config,
designed to trace into a single XLA graph.  No mutable module state, no
host callbacks.

Import submodules directly (``from goofer_tpu.ops import stft`` would
shadow the module with its same-named function, so no function re-exports
live here).
"""
from goofer_tpu.ops import (  # noqa: F401
    envelope,
    filters,
    interp,
    jitter,
    pulse,
    scan_iir,
    stft,
    windows,
)
