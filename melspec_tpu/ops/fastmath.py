"""Accurate elementwise transcendentals for the TPU VPU.

TPU's native ``log``/``log10``/``log1p`` are fast polynomial
approximations with absolute error up to ~5e-5 — measured on hardware,
and exactly the accuracy floor that capped the whisper-mel parity at
~1e-5 no matter how exact the DFT was. These replacements decompose
``x = m * 2^e`` with integer bit ops (exact), reduce ``m`` to
``[1/sqrt(2), sqrt(2))``, and evaluate ``ln m = 2 atanh(t)``,
``t = (m-1)/(m+1) in [-0.172, 0.172]`` with a 4-term odd series — abs
error ~3e-8 (sub-ulp for the mel pipelines' output range). ~15 VPU
flops per element; this is the dominant VPU cost of the fused mel
kernels' epilogues, so every op here is ~0.5% of kernel wall.

Pure ``jax.lax`` ops (bitcast/shift/add) — lowers in both XLA and
Mosaic (Pallas kernels).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_LOG10_2 = np.float32(np.log10(2.0))
_INV_LN10 = np.float32(1.0 / np.log(10.0))
_LN2 = np.float32(np.log(2.0))
# rounding offset for the exponent split: adding (2^23 - mantissa_field
# of float32(sqrt(2)) = 0x3504F3) before the shift makes the carry into
# the exponent field fire exactly when m >= f32(sqrt(2)) — the identical
# cutoff the old compare-and-halve branch used, in 3 integer ops
# instead of 6 (mask/or/bitcast/cmp/two selects)
_E_ROUND = np.int32((1 << 23) - 0x3504F3)


def _decompose(x: jnp.ndarray):
    """x = m * 2^e with m in [1/sqrt2, sqrt2); x must be positive normal.

    Bit-identical to the classic field-split + compare-and-halve: the
    rounded exponent is ``e0 + (mantissa_field >= 0x3504F3)`` and
    subtracting ``e << 23`` from the bits scales the mantissa by the
    exact power of two."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    e = ((bits + _E_ROUND) >> 23) - 127
    m = jax.lax.bitcast_convert_type(bits - (e << 23), jnp.float32)
    return m, e.astype(jnp.float32)


def _ln_mantissa(m: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
    """``scale * ln(m)`` for m in [1/sqrt2, sqrt2) via
    ``2 atanh((m-1)/(m+1))``; ``scale`` is folded into the series
    coefficients (one fewer multiply than scaling the result). The
    dropped t^9 term contributes <= 2*0.1716^9/9 ~ 2.9e-8 absolute —
    below one output ulp for the pipelines' [-10, 2] log range."""
    t = (m - 1.0) / (m + 1.0)
    t2 = t * t
    # scale * 2*(t + t^3/3 + t^5/5 + t^7/7), Horner in t^2
    p = jnp.float32(scale * 2.0 / 7.0)
    p = p * t2 + jnp.float32(scale * 2.0 / 5.0)
    p = p * t2 + jnp.float32(scale * 2.0 / 3.0)
    p = p * t2 + jnp.float32(scale * 2.0)
    return p * t


def log10_accurate(x: jnp.ndarray) -> jnp.ndarray:
    """Absolute error ~<= 1 output ulp for positive normal float32 x
    (native TPU log10: up to ~5e-5)."""
    m, e = _decompose(x)
    return e * _LOG10_2 + _ln_mantissa(m, scale=float(_INV_LN10))


def ln_accurate(x: jnp.ndarray) -> jnp.ndarray:
    """Natural log with the same construction."""
    m, e = _decompose(x)
    return e * _LN2 + _ln_mantissa(m)


def log10_best(x: jnp.ndarray, dtype) -> jnp.ndarray:
    """Accurate f32 log10 on the VPU; defer to jnp for wider dtypes (the
    bit decomposition is float32-specific and f64 log is already exact
    enough everywhere)."""
    if jnp.dtype(dtype) == jnp.float32:
        return log10_accurate(x)
    return jnp.log10(x)


def ln_best(x: jnp.ndarray, dtype) -> jnp.ndarray:
    if jnp.dtype(dtype) == jnp.float32:
        return ln_accurate(x)
    return jnp.log(x)
