
# Copyright 2026.
# Licensed under the Apache License, Version 2.0.
"""Faithful fast f32 exponential for the TPU kernels.

The CLOUDSC2 level body is VPU-op-bound with ~11 exponentials per
level-column (saturation pair, dqs/dT, detrainment, 5 autoconversion, 2
cuadjtqs iterations) — the largest single op-budget item.  ``fast_exp``
evaluates exp(x) for float32 as ``2^k * exp(r)`` with a Cody-Waite range
reduction (k = rint(x*log2e), r = x - k*ln2 split in two constants so the
reduction is exact in f32) and a degree-7 Taylor polynomial on
|r| <= ln2/2, then scales by 2^k through exponent-bit assembly.  Maximum
relative error ~2-3 f32 ulps over the scheme's argument range (verified in
``tests/test_nonlinear.py::test_fast_exp_faithful``), i.e. indistinguishable
from the platform exp at the f32 validation gates.

Cost: ~15 single-pass VPU ops (mul, rint, 2 FMA reduction, 7 FMA poly,
int convert/add/shift, bitcast, mul) — profitable only if the platform's
exp lowering is longer; see ``benchmarks/microbench_ops.py`` for the
measured per-op costs that gate its use.

float64 inputs fall through to ``jnp.exp`` (the f64 oracle path must stay
on the platform exp).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

#: Divide-strategy modes for :func:`rcp` / :func:`div` (selected by the
#: static ``Constants.FAST_DIV`` field):
#:
#: * ``"exact"``    — plain division (the default; bit-identical to the
#:   oracle, valid everywhere including the f64 ``lax.scan`` paths)
#: * ``"faithful"`` — hardware approximate reciprocal + one Newton step.
#:   Measured on v5e (``benchmarks/microbench_div.py``): same max relative
#:   error as the native divide on a 64-deep chain, at 0.81x the cost.
#: * ``"approx"``   — raw hardware approximate reciprocal, ~6e-6 relative
#:   error on v5e, 0.17x the divide cost.  Within the driver's f32
#:   validation gates (2e-4/1e-2) but NOT ulp-comparable to the oracle.
#:
#: The non-exact modes use ``pl.reciprocal`` and are therefore only legal
#: inside a Pallas kernel (or interpret mode); the scan paths must keep the
#: default.  Non-f32 operands always fall back to exact division.
DIV_MODES = ("exact", "faithful", "approx")


def rcp(x: jnp.ndarray, mode: str = "exact") -> jnp.ndarray:
    """1/x under the given divide strategy (see :data:`DIV_MODES`).

    Sub-2-D operands always use exact division: the Mosaic lowering of
    ``pl.reciprocal`` requires a vector type (a scalar operand crashes
    with ``F32Type ... has no element_type`` — hit by the TL/AD bodies'
    hoisted per-level scalars), and an approximate reciprocal of a
    loop-hoisted scalar saves nothing anyway.
    """
    if (
        mode == "exact"
        or x.dtype != jnp.float32
        or getattr(x, "ndim", 0) < 2
    ):
        return 1.0 / x
    r = pl.reciprocal(x, approx=True)
    if mode == "faithful":
        r = r * (2.0 - x * r)
    return r


def div(a, b: jnp.ndarray, mode: str = "exact") -> jnp.ndarray:
    """a/b under the given divide strategy (see :data:`DIV_MODES`)."""
    if mode == "exact" or b.dtype != jnp.float32:
        return a / b
    return a * rcp(b, mode)


def fmask(p: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Boolean predicate as a float {0, 1} mask in ``ref``'s dtype.

    Used by the ``Constants.MASK_SELECT`` mode of the level bodies: the
    branch-predication pattern ``where(p, x, 0)`` becomes the multiply
    ``x * fmask(p, x)`` — bit-exact for finite ``x`` (``x*1 == x``,
    ``x*0 == 0``) and one VPU multiply instead of a vector select
    (measured ~4 op-equivalents on v5e, ``benchmarks/microbench_ops.py``).
    The conversion is paid once per predicate and shared by every select
    on it (the TL body pairs each forward select with a perturbation
    select on the same predicate).
    """
    return p.astype(ref.dtype)


def sel0(p_or_m: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """``where(p, x, 0)`` — select on a bool predicate, multiply on a mask.

    Callers pass either the raw boolean predicate (``MASK_SELECT=False``:
    lowers to a vector select) or its :func:`fmask` (``MASK_SELECT=True``:
    lowers to a multiply).  The two forms are bit-identical for finite
    ``x``; the additive-update pattern ``where(p, a+b, a)`` is written
    ``a + sel0(p, b)`` (identical up to the sign of a zero).
    """
    if p_or_m.dtype == jnp.bool_:
        return jnp.where(p_or_m, x, jnp.zeros_like(x))
    return x * p_or_m

LOG2E = 1.4426950408889634
# Cody-Waite split of ln2: hi has its low mantissa bits zeroed so k*LN2_HI
# is exact for |k| < 2^15; lo carries the remainder
LN2_HI = 0.693359375
LN2_LO = -2.12194440e-4
#: Taylor coefficients 1/k! for exp(r) on |r| <= ln2/2
_COEF = tuple(1.0 / math.factorial(k) for k in range(8))


def fast_exp(x: jnp.ndarray) -> jnp.ndarray:
    """exp(x), faithful to ~2-3 ulps for float32; jnp.exp for other dtypes."""
    if x.dtype != jnp.float32:
        return jnp.exp(x)
    # clamp in the x domain BEFORE reduction: a huge-magnitude argument
    # (e.g. the autoconversion -(cldl/lcrit)^2 with a tiny cloud fraction)
    # must not reach the polynomial with an unreduced remainder.
    # exp(-87) ~ 1.6e-38 (f32 min normal) and exp(88) is near f32 max.
    x = jnp.clip(x, -87.0, 88.0)
    y = x * jnp.float32(LOG2E)
    k = jax.lax.round(y, jax.lax.RoundingMethod.TO_NEAREST_EVEN)
    # exact range reduction in the original domain (Cody-Waite)
    r = (x - k * jnp.float32(LN2_HI)) - k * jnp.float32(LN2_LO)
    p = jnp.float32(_COEF[7])
    for c in _COEF[6::-1]:
        p = p * r + jnp.float32(c)
    ki = k.astype(jnp.int32)
    scale = jax.lax.bitcast_convert_type(
        jax.lax.shift_left(ki + jnp.int32(127), jnp.int32(23)), jnp.float32
    )
    return p * scale
