
# Copyright 2026.
# Licensed under the Apache License, Version 2.0.
"""NaN-robustness property tests on pathological inputs.

The vectorized physics predicates every per-column branch with
``jnp.where`` over *guarded* operands (safe denominators, clamped sqrt
arguments) so that no lane ever produces NaN — the design invariant that
makes ``jax.jvp``/``jax.vjp`` of the scheme well defined (see
physics/nonlinear.py module docstring).  These tests drive the NL/TL/AD
scan paths through states engineered to sit on the guarded edges:

* fully saturated columns (q >> qsat: the Letreut–Li ``high`` regime and
  the supsat clip),
* bone-dry columns (q = ql = qi = 0: zero cloud, zero flux, the
  ``clc <= ZEPS2`` autoconversion guard and the ``lu < ZEPS2``
  detrainment guard),
* temperatures pinned exactly at the RTT / RTICE branch thresholds
  (melt, phase split, supsaturation-factor edges),
* zero convective fluxes and detrainment everywhere.

Each case must produce finite tendencies, diagnostics, TL derivatives and
AD cotangents — in both precisions for the NL path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloudsc2_tpu import iox, make_constants
from cloudsc2_tpu.physics.adjoint import cloudsc2_ad
from cloudsc2_tpu.physics.diagnostics import eta_levels
from cloudsc2_tpu.physics.increment import state_increment
from cloudsc2_tpu.physics.nonlinear import cloudsc2_nl
from cloudsc2_tpu.physics.saturation import saturation
from cloudsc2_tpu.physics.tangent_linear import cloudsc2_tl
from cloudsc2_tpu.validation.symmetry import DIAG_NAMES, TEND_NAMES

NCOLS, NLEV = 128, 53


def _base_state(dtype):
    _, state, dt = iox.synthesize_input(ncols=NCOLS, nlev=NLEV, seed=7, dtype=dtype)
    return {k: jnp.asarray(v) for k, v in state.items()}, dt


def _finalize(s, c):
    s["eta"] = eta_levels(s["ap"], s["aph"])
    s["qsat"] = saturation(s["ap"], s["t"], kflag=1, lphylin=c.LPHYLIN, c=c)
    return s


def _mutate(s, case, c):
    z = jnp.zeros_like(s["q"])
    if case == "saturated":
        s["qsat"] = saturation(s["ap"], s["t"], kflag=1, lphylin=c.LPHYLIN, c=c)
        s["q"] = 2.0 * s["qsat"]
        s["supsat"] = 0.1 * s["qsat"]
    elif case == "dry":
        s["q"] = z
        s["ql"] = z
        s["qi"] = z
        s["supsat"] = z
        s["tnd_cml_q"] = z
        s["tnd_cml_ql"] = z
        s["tnd_cml_qi"] = z
    elif case == "threshold_t":
        # every level exactly at a branch threshold, alternating RTT/RTICE
        rtt = jnp.full_like(s["t"], c.RTT)
        rtice = jnp.full_like(s["t"], c.RTICE)
        mask = (jnp.arange(NLEV)[:, None] % 2 == 0)
        s["t"] = jnp.where(mask, rtt, rtice)
        s["tnd_cml_t"] = jnp.zeros_like(s["t"])
    elif case == "no_convection":
        s["lu"] = z
        s["lude"] = z
        s["mfu"] = z
        s["mfd"] = z
    return s


CASES = ("saturated", "dry", "threshold_t", "no_convection")


def _assert_finite(tree, label):
    for k, v in tree.items():
        arr = np.asarray(v)
        assert np.isfinite(arr).all(), f"{label}[{k}] has non-finite values"


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("dtype", [np.float64, np.float32])
@pytest.mark.parametrize("mask_select", [False, True])
def test_nl_finite(case, dtype, mask_select):
    # mask_select=True is the high-risk lowering here: a masked-out lane
    # that evaluates to inf/NaN survives a 0*x multiply (select would
    # discard it), so the guarded-operand invariant must hold lane-exactly
    c = make_constants(lphylin=True, ldrain1d=False).replace(MASK_SELECT=mask_select)
    s, dt = _base_state(dtype)
    s = _finalize(_mutate(s, case, c), c)
    tends, diags = cloudsc2_nl(s, dt, c)
    _assert_finite(tends, "tends")
    _assert_finite(diags, "diags")
    clc = np.asarray(diags["clc"])
    assert (clc >= 0).all() and (clc <= 1).all()
    assert (np.asarray(diags["fplsl"]) >= 0).all()
    assert (np.asarray(diags["fplsn"]) >= 0).all()


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("mask_select", [False, True])
def test_tl_ad_finite(case, mask_select):
    c = make_constants(lphylin=True, ldrain1d=False).replace(MASK_SELECT=mask_select)
    s, dt = _base_state(np.float64)
    s = _finalize(_mutate(s, case, c), c)
    s.update(state_increment(s, 0.01, ignore_supsat=True))
    tends_tl, diags_tl = cloudsc2_tl(s, dt, c)
    _assert_finite(tends_tl, "tl_tends")
    _assert_finite(diags_tl, "tl_diags")

    s_ad = dict(s)
    for name in TEND_NAMES:
        s_ad["tnd_" + name] = tends_tl[name]
        s_ad["tnd_" + name + "_i"] = tends_tl[name + "_i"]
    for name in DIAG_NAMES:
        s_ad[name + "_i"] = diags_tl[name + "_i"]
    tends_ad, diags_ad = cloudsc2_ad(s_ad, dt, c)
    _assert_finite(tends_ad, "ad_tends")
    _assert_finite(diags_ad, "ad_diags")
