
# Copyright 2026.
# Licensed under the Apache License, Version 2.0.
"""Nonlinear scheme vs. the independent scalar oracle."""
import jax.numpy as jnp
import numpy as np
import pytest

from cloudsc2_tpu import make_constants
from cloudsc2_tpu.physics.nonlinear import cloudsc2_nl
from cloudsc2_tpu.physics.saturation import saturation

from cloudsc2_tpu.oracle import oracle_nonlinear, oracle_saturation


def test_saturation_matches_oracle(state_with_qsat, constants):
    _, state, _ = state_with_qsat
    got = saturation(state["ap"], state["t"], kflag=1, lphylin=True, c=constants)
    want = oracle_saturation(np.asarray(state["ap"]), np.asarray(state["t"]), constants)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-13, atol=0)


def test_saturation_nonlinear_branch(state_with_qsat, constants):
    _, state, _ = state_with_qsat
    for kflag in (1, 2):
        got = saturation(state["ap"], state["t"], kflag=kflag, lphylin=False, c=constants)
        want = oracle_saturation(
            np.asarray(state["ap"]), np.asarray(state["t"]), constants,
            kflag=kflag, lphylin=False,
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-13, atol=0)


@pytest.mark.parametrize("levapls2", [False, True])
def test_nonlinear_matches_oracle(state_with_qsat, levapls2):
    _, state, dt = state_with_qsat
    c = make_constants(lphylin=True, ldrain1d=False)
    if levapls2:
        c = c.replace(LEVAPLS2=True)
    tends, diags = cloudsc2_nl(state, dt, c)
    np_state = {k: np.asarray(v) for k, v in state.items()}
    tends_o, diags_o = oracle_nonlinear(np_state, dt, c)
    for name in ("t", "q", "ql", "qi"):
        np.testing.assert_allclose(
            np.asarray(tends[name]), tends_o[name], rtol=1e-10, atol=1e-13, err_msg=name
        )
    for name in ("clc", "covptot", "fplsl", "fplsn", "fhpsl", "fhpsn"):
        np.testing.assert_allclose(
            np.asarray(diags[name]), diags_o[name], rtol=1e-10, atol=1e-13, err_msg=name
        )


def test_nonlinear_physical_invariants(state_with_qsat, constants):
    _, state, dt = state_with_qsat
    tends, diags = cloudsc2_nl(state, dt, constants)
    clc = np.asarray(diags["clc"])
    assert (clc >= 0).all() and (clc <= 1).all()
    assert (np.asarray(diags["fplsl"]) >= 0).all()
    assert (np.asarray(diags["fplsn"]) >= 0).all()
    # the synthetic workload must actually precipitate — an all-zero flux
    # field would make every invariant above vacuous
    assert np.asarray(diags["fplsl"]).max() > 0
    assert np.asarray(diags["fplsn"]).max() > 0
    assert clc.max() > 0
    for v in {**tends, **diags}.values():
        assert not np.isnan(np.asarray(v)).any()


def test_nonlinear_columns_independent(state_with_qsat, constants):
    """Columns are embarrassingly parallel: a column subset gives identical results."""
    _, state, dt = state_with_qsat
    tends, _ = cloudsc2_nl(state, dt, constants)
    sub = {k: (v if v.ndim == 1 else v[:, 10:20]) for k, v in state.items()}
    tends_sub, _ = cloudsc2_nl(sub, dt, constants)
    np.testing.assert_array_equal(np.asarray(tends["t"])[:, 10:20], np.asarray(tends_sub["t"]))


def test_nonlinear_matches_oracle_ldrain1d(state_with_qsat):
    """LDRAIN1D=True vs the independent oracle: exercises the 1-D rain
    configuration (lcrit=1.9*RCLCRIT, icrit=1e-4, evaporation active)."""
    _, state, dt = state_with_qsat
    c = make_constants(lphylin=True, ldrain1d=True)
    tends, diags = cloudsc2_nl(state, dt, c)
    np_state = {k: np.asarray(v) for k, v in state.items()}
    tends_o, diags_o = oracle_nonlinear(np_state, dt, c)
    for name in ("t", "q", "ql", "qi"):
        np.testing.assert_allclose(
            np.asarray(tends[name]), tends_o[name], rtol=1e-10, atol=1e-13, err_msg=name
        )
    for name in ("clc", "covptot", "fplsl", "fplsn", "fhpsl", "fhpsn"):
        np.testing.assert_allclose(
            np.asarray(diags[name]), diags_o[name], rtol=1e-10, atol=1e-13, err_msg=name
        )


def test_fast_exp_faithful():
    """fast_exp is a faithful f32 exponential (~1 ulp max) over the scheme's
    argument range, underflows huge-negative arguments harmlessly, and
    passes f64 through to the platform exp (the oracle path)."""
    import jax
    import jax.numpy as jnp

    from cloudsc2_tpu.physics.fastmath import fast_exp

    f = jax.jit(fast_exp)
    rng = np.random.default_rng(0)
    xs = np.concatenate([
        rng.uniform(-90.0, 10.0, 200_000),
        rng.uniform(-1e-3, 1e-3, 50_000),
        np.array([0.0, -87.0, 4.5]),
    ]).astype(np.float32)
    got = np.asarray(f(jnp.asarray(xs)), np.float64)
    want = np.exp(xs.astype(np.float64))
    # faithfulness holds above the flush-to-min-normal clamp (x >= -87);
    # below, results flush into [0, min-normal] (asserted separately)
    mask = want > 1e-37
    rel = np.abs(got[mask] - want[mask]) / want[mask]
    assert rel.max() < 2.4e-7, rel.max()  # ~2 f32 ulps
    # huge-negative arguments underflow without polynomial blow-up
    ext = np.asarray(f(jnp.asarray(np.array([-1e8, -500.0], np.float32))))
    assert (ext >= 0).all() and (ext < 2e-38).all(), ext
    # f64 passes through bit-exactly to the platform exp
    x64 = jnp.asarray(np.array([0.5, -3.0, 10.0]), jnp.float64)
    np.testing.assert_array_equal(np.asarray(fast_exp(x64)), np.exp(np.asarray(x64)))


def test_mask_select_bit_exact(state_with_qsat):
    """``Constants.MASK_SELECT=True`` (float-mask multiplies instead of
    vector selects at every ``where(p, x, 0)``-class site in the level
    bodies) is bit-identical to the default select lowering for NL and TL,
    with and without LREGCL.  The AD is ``jax.vjp`` of the TL, and the
    mask-mode forward graph transposes to a differently-associated
    cotangent accumulation — identical to ~1e-12 relative (measured worst,
    LREGCL on, amplified through the two cuadjtqs iterations), asserted at
    rtol=1e-11."""
    from cloudsc2_tpu.physics.adjoint import cloudsc2_ad
    from cloudsc2_tpu.physics.increment import state_increment
    from cloudsc2_tpu.physics.tangent_linear import cloudsc2_tl

    _, state, dt = state_with_qsat
    s_tl = dict(state)
    s_tl.update(state_increment(state, 0.01))

    for lregcl in (True, False):
        c0 = make_constants(lphylin=True, ldrain1d=False, lregcl=lregcl)
        c1 = c0.replace(MASK_SELECT=True)

        for pair0, pair1, tag in [
            (cloudsc2_nl(state, dt, c0), cloudsc2_nl(state, dt, c1), "nl"),
            (cloudsc2_tl(s_tl, dt, c0), cloudsc2_tl(s_tl, dt, c1), "tl"),
        ]:
            for d0, d1 in zip(pair0, pair1):
                assert d0.keys() == d1.keys()
                for k in d0:
                    np.testing.assert_array_equal(
                        np.asarray(d0[k]), np.asarray(d1[k]),
                        err_msg=f"{tag}/{k} lregcl={lregcl}",
                    )

        # AD: seed with the TL outputs the way the symmetry test does
        s_ad = dict(s_tl)
        tends_tl, diags_tl = cloudsc2_tl(s_tl, dt, c0)
        for n in ("t", "q", "ql", "qi"):
            s_ad["tnd_" + n] = tends_tl[n]
            s_ad["tnd_" + n + "_i"] = tends_tl[n + "_i"]
        for n in ("clc", "covptot", "fhpsl", "fhpsn", "fplsl", "fplsn"):
            s_ad[n + "_i"] = diags_tl[n + "_i"]
        for d0, d1 in zip(cloudsc2_ad(s_ad, dt, c0), cloudsc2_ad(s_ad, dt, c1)):
            assert d0.keys() == d1.keys()
            for k in d0:
                np.testing.assert_allclose(
                    np.asarray(d0[k]), np.asarray(d1[k]),
                    rtol=1e-11, atol=1e-16,
                    err_msg=f"ad/{k} lregcl={lregcl}",
                )


def test_cuadjtqs_compact_matches_reference_form():
    """CUADJ_COMPACT is exact algebra: the compact cor-free condensation
    quotient agrees with the reference-shaped form to f64 rounding across
    the state space (physics/cuadjtqs.py:_nl_iter)."""
    from cloudsc2_tpu.physics.cuadjtqs import cuadjtqs_nl

    rng = np.random.default_rng(11)
    n = 4096
    ap = jnp.asarray(rng.uniform(2e3, 1.1e5, n))
    t = jnp.asarray(rng.uniform(180.0, 320.0, n))
    q = jnp.asarray(rng.uniform(0.0, 3e-2, n))
    c = make_constants(lphylin=True, ldrain1d=False)
    t_c, q_c = cuadjtqs_nl(ap, t, q, c)
    t_r, q_r = cuadjtqs_nl(ap, t, q, c.replace(CUADJ_COMPACT=False))
    np.testing.assert_allclose(np.asarray(t_c), np.asarray(t_r), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(q_c), np.asarray(q_r), rtol=1e-11, atol=1e-18
    )
