"""Pure-JAX DSP primitive layer (jit-able, static shapes).

Everything here is a pure function of arrays + static Python config, designed
to trace into a single XLA graph.  No mutable module state, no host callbacks.
"""
from goofer_tpu.ops.windows import sqrt_hann_window, boost_curve, brightness_curve
from goofer_tpu.ops.filters import gaussian_kernel1d, gaussian_blur1d, gaussian_blur_freq
from goofer_tpu.ops.interp import (
    linear_interp,
    linear_interp_extrap,
    resample_1d,
    resample_2d,
)
from goofer_tpu.ops.stft import stft, istft, frame_count
from goofer_tpu.ops.scan_iir import (
    first_order_recurrence,
    one_pole_highpass,
    dynamic_one_pole_cascade,
)
from goofer_tpu.ops.pulse import lf_pulse_value, pulse_train, subharm_pulse_train
