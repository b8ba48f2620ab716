"""Gaussian smoothing as static-kernel convolution.

Matches the reference's hand-rolled ``gaussian_filter1d`` semantics
(ref: GOOFER.py:241-261): kernel radius ``int(truncate * sigma + 0.5)``,
normalized Gaussian taps, reflect padding, 'valid' convolution.

Sigma is always a host-side (static) float here, so the kernel is a
compile-time constant.  Small kernels lower to a direct conv on the VPU;
large kernels (long smoothing windows over per-sample tracks) use FFT
convolution, which XLA executes as a few rfft/irfft ops instead of a
multi-thousand-tap sliding window.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Above this many taps, convolution switches to the FFT path.
_FFT_CONV_THRESHOLD = 257


@functools.lru_cache(maxsize=None)
def gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """Normalized Gaussian taps; radius = int(truncate*sigma + 0.5)."""
    radius = int(truncate * float(sigma) + 0.5)
    t = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (t / float(sigma)) ** 2)
    k /= k.sum()
    return k.astype(np.float32)


def _conv_valid_lastaxis(x2d: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """'valid' correlation of each row of (B, L) with a symmetric kernel."""
    ksize = kernel.shape[0]
    if ksize >= _FFT_CONV_THRESHOLD:
        b, length = x2d.shape
        out_len = length - ksize + 1
        nfft = int(length)
        kf = jnp.fft.rfft(jnp.asarray(kernel, dtype=x2d.dtype), n=nfft)
        xf = jnp.fft.rfft(x2d, n=nfft, axis=-1)
        full = jnp.fft.irfft(xf * kf[None, :], n=nfft, axis=-1)
        # 'full' conv index k maps to valid index k - (ksize - 1)
        return jax.lax.dynamic_slice_in_dim(full, ksize - 1, out_len, axis=1)
    # Direct path: depthwise 1-D convolution.  Gaussian is symmetric so
    # correlation == convolution.
    lhs = x2d[:, None, :]  # (batch, chan=1, length)
    rhs = jnp.asarray(kernel, dtype=x2d.dtype)[None, None, :]  # (out_c, in_c, k)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out[:, 0, :]


def gaussian_blur1d(x: jnp.ndarray, sigma: float, axis: int = -1,
                    truncate: float = 4.0) -> jnp.ndarray:
    """Gaussian blur along ``axis`` with reflect padding (static sigma)."""
    if sigma is None or float(sigma) <= 0.0:
        return x
    kernel = gaussian_kernel1d(float(sigma), truncate)
    radius = (kernel.shape[0] - 1) // 2
    if radius <= 0:
        return x
    x = jnp.asarray(x)
    moved = jnp.moveaxis(x, axis, -1)
    shape = moved.shape
    flat = moved.reshape((-1, shape[-1]))
    pad_spec = [(0, 0), (radius, radius)]
    padded = jnp.pad(flat, pad_spec, mode="reflect")
    out = _conv_valid_lastaxis(padded, kernel)
    out = out.reshape(shape)
    return jnp.moveaxis(out, -1, axis)


def gaussian_blur_freq(env: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Blur a (n_bins, T) spectrogram-like array along the frequency axis."""
    return gaussian_blur1d(env, sigma, axis=0)


def gaussian_blur_complex_freq(S: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Frequency-axis blur of a complex spectrogram: blur re/im separately.

    The reference calls its real-valued gaussian_filter on complex data when
    smoothing voiced columns (ref: GOOFER.py:1143); numpy convolution then
    operates on complex values, equivalent to blurring parts independently.
    """
    re = gaussian_blur1d(jnp.real(S), sigma, axis=0)
    im = gaussian_blur1d(jnp.imag(S), sigma, axis=0)
    return jax.lax.complex(re, im)


def smooth_mask_downsampled(mask: jnp.ndarray, sigma: float = 100.0,
                            ds: int = 4) -> jnp.ndarray:
    """Soft voiced/unvoiced crossfade (ref: GOOFER.py:556-569).

    Downsample by ``ds``, blur with sigma/ds (floored at 1), then linearly
    resample back to the original length over a shared [0, 1] axis.
    """
    from goofer_tpu.ops.interp import resample_1d

    n = mask.shape[0]
    if ds > 1:
        short = mask[::ds].astype(jnp.float32)
    else:
        short = mask.astype(jnp.float32)
    sig_short = max(1.0, float(sigma) / max(1, ds))
    short_s = gaussian_blur1d(short, sig_short)
    if ds > 1:
        return resample_1d(short_s, n).astype(jnp.float32)
    return short_s.astype(jnp.float32)
