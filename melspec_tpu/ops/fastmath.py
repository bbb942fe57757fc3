"""Accurate elementwise transcendentals for the TPU VPU.

TPU's native ``log``/``log10``/``log1p`` are fast polynomial
approximations with absolute error up to ~5e-5 — measured on hardware,
and exactly the accuracy floor that capped the whisper-mel parity at
~1e-5 no matter how exact the DFT was. These replacements decompose
``x = m * 2^e`` with integer bit ops (exact), reduce ``m`` to
``[1/sqrt(2), sqrt(2))``, and evaluate ``ln m = 2 atanh(t)``,
``t = (m-1)/(m+1) in [-0.172, 0.172]`` with a 5-term odd series — abs
error ~1e-7, output-ulp-limited. ~15 VPU flops per element; the mel
pipelines spend <1% of their time here.

Pure ``jax.lax`` ops (bitcast/shift/and/select) — lowers in both XLA and
Mosaic (Pallas kernels).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_LOG10_2 = np.float32(np.log10(2.0))
_INV_LN10 = np.float32(1.0 / np.log(10.0))
_LN2 = np.float32(np.log(2.0))
_SQRT2 = np.float32(np.sqrt(2.0))


def _decompose(x: jnp.ndarray):
    """x = m * 2^e with m in [1/sqrt2, sqrt2); x must be positive normal."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    e = ((bits >> 23) & 0xFF) - 127
    m_bits = (bits & 0x007FFFFF) | (127 << 23)
    m = jax.lax.bitcast_convert_type(m_bits, jnp.float32)  # [1, 2)
    hi = m >= _SQRT2
    m = jnp.where(hi, m * jnp.float32(0.5), m)  # exact
    e = jnp.where(hi, e + 1, e)
    return m, e.astype(jnp.float32)


def _ln_mantissa(m: jnp.ndarray) -> jnp.ndarray:
    """ln(m) for m in [1/sqrt2, sqrt2) via 2*atanh((m-1)/(m+1))."""
    t = (m - 1.0) / (m + 1.0)
    t2 = t * t
    # 2*(t + t^3/3 + t^5/5 + t^7/7 + t^9/9), Horner in t^2
    p = jnp.float32(2.0 / 9.0)
    p = p * t2 + jnp.float32(2.0 / 7.0)
    p = p * t2 + jnp.float32(2.0 / 5.0)
    p = p * t2 + jnp.float32(2.0 / 3.0)
    p = p * t2 + jnp.float32(2.0)
    return p * t


def log10_accurate(x: jnp.ndarray) -> jnp.ndarray:
    """Absolute error ~<= 1 output ulp for positive normal float32 x
    (native TPU log10: up to ~5e-5)."""
    m, e = _decompose(x)
    return e * _LOG10_2 + _ln_mantissa(m) * _INV_LN10


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
