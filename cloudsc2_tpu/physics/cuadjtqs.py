
# Copyright 2026.
# Licensed under the Apache License, Version 2.0.
"""Saturation-adjustment clipping (``cuadjtqs``): NL, TL and AD variants.

JAX re-implementation of the reference gtscript functions:

* nonlinear: ``physics/nonlinear/_stencils/cuadjtqs.py:22-68``
* tangent-linear: ``physics/tangent_linear/_stencils/cuadjtqs.py:22-84``
* adjoint: ``physics/adjoint/_stencils/cuadjtqs.py:22-158``

Two fixed Newton-like iterations; the phase constants (liquid vs ice) are
selected ONCE from the input temperature and held fixed across both
iterations, exactly as in the reference (``ICALL == 0`` path).  All functions
are pointwise over arrays of any shape.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from cloudsc2_tpu.params import Constants


class _Phase(NamedTuple):
    z3es: jnp.ndarray
    z4es: jnp.ndarray
    z5alcp: jnp.ndarray
    zaldcp: jnp.ndarray


def _select_phase(t: jnp.ndarray, c: Constants) -> _Phase:
    """Liquid constants for ``t > RTT``, ice otherwise (reference ``:54-63``)."""
    warm = t > c.RTT
    return _Phase(
        z3es=jnp.where(warm, c.R3LES, c.R3IES),
        z4es=jnp.where(warm, c.R4LES, c.R4IES),
        z5alcp=jnp.where(warm, c.R5ALVCP, c.R5ALSCP),
        zaldcp=jnp.where(warm, c.RALVDCP, c.RALSDCP),
    )


def _nl_iter(ap, t, q, p: _Phase, c: Constants):
    """One adjustment iteration (reference ``f_cuadjtqs_nl_0``, ``:24-35``)."""
    foeew = c.R2ES * jnp.exp(p.z3es * (t - c.RTT) / (t - p.z4es))
    qsat = jnp.minimum(foeew / ap, c.ZQMAX)
    cor = 1.0 / (1.0 - c.RETV * qsat)
    qsat = qsat * cor
    z2s = p.z5alcp / (t - p.z4es) ** 2.0
    cond = (q - qsat) / (1.0 + qsat * cor * z2s)
    return t + p.zaldcp * cond, q - cond


def cuadjtqs_nl(ap, t, q, c: Constants):
    """Nonlinear two-iteration saturation adjustment."""
    p = _select_phase(t, c)
    t, q = _nl_iter(ap, t, q, p, c)
    t, q = _nl_iter(ap, t, q, p, c)
    return t, q


def _tl_iter(ap, ap_i, t, t_i, q, q_i, p: _Phase, c: Constants):
    """One TL iteration (reference ``f_cuadjtqs_tl_0``, ``:24-51``)."""
    qp = 1.0 / ap
    qp_i = -ap_i / ap**2.0
    foeew = c.R2ES * jnp.exp(p.z3es * (t - c.RTT) / (t - p.z4es))
    foeew_i = foeew * p.z3es * t_i * (c.RTT - p.z4es) / (t - p.z4es) ** 2.0
    qsat = qp * foeew
    qsat_i = qp_i * foeew + qp * foeew_i
    clip = qsat > c.ZQMAX
    qsat = jnp.where(clip, c.ZQMAX, qsat)
    qsat_i = jnp.where(clip, 0.0, qsat_i)
    cor = 1.0 / (1.0 - c.RETV * qsat)
    cor_i = c.RETV * qsat_i / (1.0 - c.RETV * qsat) ** 2.0
    qsat_i = qsat_i * cor + qsat * cor_i
    qsat = qsat * cor
    z2s = p.z5alcp / (t - p.z4es) ** 2.0
    z2s_i = -2.0 * p.z5alcp * t_i / (t - p.z4es) ** 3.0
    cond = (q - qsat) / (1.0 + qsat * cor * z2s)
    cond_i = (q_i - qsat_i) / (1.0 + qsat * cor * z2s) - (q - qsat) * (
        qsat_i * cor * z2s + qsat * cor_i * z2s + qsat * cor * z2s_i
    ) / (1.0 + qsat * cor * z2s) ** 2.0
    return t + p.zaldcp * cond, t_i + p.zaldcp * cond_i, q - cond, q_i - cond_i


def cuadjtqs_tl(ap, ap_i, t, t_i, q, q_i, c: Constants):
    """Tangent-linear two-iteration saturation adjustment."""
    p = _select_phase(t, c)
    t, t_i, q, q_i = _tl_iter(ap, ap_i, t, t_i, q, q_i, p, c)
    t, t_i, q, q_i = _tl_iter(ap, ap_i, t, t_i, q, q_i, p, c)
    return t, t_i, q, q_i


def _fwd_iter_traj(ap, t, q, p: _Phase, c: Constants):
    """Forward iteration storing the trajectory needed by the reverse sweep."""
    foeew = c.R2ES * jnp.exp(p.z3es * (t - c.RTT) / (t - p.z4es))
    qsat0 = foeew / ap
    clip = qsat0 > c.ZQMAX
    qsat_unc = jnp.where(clip, c.ZQMAX, qsat0)
    cor = 1.0 / (1.0 - c.RETV * qsat_unc)
    qsat = qsat_unc * cor
    z2s = p.z5alcp / (t - p.z4es) ** 2.0
    cond = (q - qsat) / (1.0 + qsat * cor * z2s)
    traj = (t, q, foeew, qsat_unc, qsat, cor, z2s, clip)
    return t + p.zaldcp * cond, q - cond, traj


def cuadjtqs_ad(ap, ap_i, t, t_i, q, q_i, c: Constants):
    """Adjoint of the two-iteration saturation adjustment.

    Matches the reference hand-written adjoint
    (``physics/adjoint/_stencils/cuadjtqs.py:52-158``): recompute both
    iterations storing per-iteration trajectory, then sweep back through
    iteration 2 and iteration 1.  Returns ``(ap_i, t, t_i, q, q_i)`` where
    ``t, q`` are the adjusted (forward) values.
    """
    p = _select_phase(t, c)
    t1, q1, traj1 = _fwd_iter_traj(ap, t, q, p, c)
    t2, q2, traj2 = _fwd_iter_traj(ap, t1, q1, p, c)

    qp_i = jnp.zeros_like(ap)
    for traj in (traj2, traj1):
        targ, q_in, foeew, qsat_unc, qsat, cor, z2s, clip = traj
        cond1_i = -q_i + p.zaldcp * t_i
        denom = 1.0 + qsat * cor * z2s
        q_i = q_i + cond1_i / denom
        qsat_i = -cond1_i / denom - cond1_i * (q_in - qsat) * cor * z2s / denom**2.0
        cor_i = -cond1_i * (q_in - qsat) * qsat * z2s / denom**2.0
        z2s_i = -cond1_i * (q_in - qsat) * qsat * cor / denom**2.0
        targ_i = -2.0 * z2s_i * p.z5alcp / (targ - p.z4es) ** 3.0
        cor_i = cor_i + qsat_i * qsat_unc
        qsat_i = qsat_i * cor
        qsat_i = qsat_i + cor_i * c.RETV / (1.0 - c.RETV * qsat_unc) ** 2.0
        qsat_i = jnp.where(clip, 0.0, qsat_i)
        foeew_i = qsat_i / ap
        qp_i = qp_i + qsat_i * foeew
        targ_i = targ_i + (
            foeew_i
            * c.R2ES
            * p.z3es
            * (c.RTT - p.z4es)
            * jnp.exp(p.z3es * (targ - c.RTT) / (targ - p.z4es))
            / (targ - p.z4es) ** 2.0
        )
        t_i = t_i + targ_i
    ap_i = ap_i - qp_i / ap**2.0
    return ap_i, t2, t_i, q2, q_i
