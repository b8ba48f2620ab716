"""Vectorized linear interpolation / resampling.

Replaces the reference's hand-rolled ``interp1d`` closure factory
(ref: GOOFER.py:173-239) with shape-static gather + lerp formulations that
trace into single fused XLA ops.  All variants support n >= 1 source points;
the single-point case (constant output) must be decided by static shape.
"""
from __future__ import annotations

import jax.numpy as jnp


def gather_lerp(x: jnp.ndarray, pos: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Sample ``x`` at fractional indices ``pos`` along ``axis``, clamping
    to the edges (edge-hold outside the support)."""
    x = jnp.asarray(x)
    n = x.shape[axis]
    pos = jnp.clip(pos, 0.0, n - 1.0)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, max(n - 2, 0))
    frac = (pos - lo).astype(x.dtype)
    a = jnp.take(x, lo, axis=axis)
    b = jnp.take(x, jnp.minimum(lo + 1, n - 1), axis=axis)
    if x.ndim > 1 and axis in (0, -x.ndim):
        frac_b = frac.reshape(frac.shape + (1,) * (x.ndim - 1))
    elif x.ndim > 1:
        frac_b = frac.reshape((1,) * (x.ndim - 1) + frac.shape)
    else:
        frac_b = frac
    return a * (1.0 - frac_b) + b * frac_b


def resample_1d(x: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """Linear resample of a 1-D array onto ``target_len`` points spanning the
    same [first, last] support (ref stretch_feature semantics,
    GOOFER.py:597-616)."""
    n = x.shape[0]
    if target_len == n:
        return x
    if n == 1:
        return jnp.full((target_len,), x[0], dtype=x.dtype)
    pos = jnp.linspace(0.0, float(n - 1), target_len)
    return gather_lerp(x, pos, axis=0)


def resample_2d(x: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """Linear resample of (n_bins, T) along the frame axis."""
    t = x.shape[1]
    if target_len == t:
        return x
    if t == 1:
        return jnp.repeat(x, target_len, axis=1)
    pos = jnp.linspace(0.0, float(t - 1), target_len)
    return gather_lerp(x, pos, axis=1)


def _edge_slopes(x: jnp.ndarray, y: jnp.ndarray):
    slope_left = (y[1] - y[0]) / (x[1] - x[0] + 1e-10)
    slope_right = (y[-1] - y[-2]) / (x[-1] - x[-2] + 1e-10)
    return slope_left, slope_right


def linear_interp(x: jnp.ndarray, y: jnp.ndarray, x_new: jnp.ndarray,
                  fill_value: float | None = None) -> jnp.ndarray:
    """np.interp-alike over a sorted grid ``x``.

    ``fill_value=None`` clamps outside the support (np.interp behaviour);
    a float fills outside the support with that constant
    (ref interp1d numeric fill, GOOFER.py:210-221).
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    out = jnp.interp(x_new, x, y)
    if fill_value is not None:
        inside = (x_new >= x[0]) & (x_new <= x[-1])
        out = jnp.where(inside, out, jnp.asarray(fill_value, dtype=out.dtype))
    return out


def linear_interp_extrap(x: jnp.ndarray, y: jnp.ndarray,
                         x_new: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation with end-slope linear extrapolation, matching the
    reference's fill_value='extrapolate' path (ref: GOOFER.py:204-237).
    Requires len(x) >= 2 (static)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    out = jnp.interp(x_new, x, y)
    slope_left, slope_right = _edge_slopes(x, y)
    out = jnp.where(x_new < x[0], y[0] + slope_left * (x_new - x[0]), out)
    out = jnp.where(x_new > x[-1], y[-1] + slope_right * (x_new - x[-1]), out)
    return out
