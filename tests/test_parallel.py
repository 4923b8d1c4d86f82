
# Copyright 2026.
# Licensed under the Apache License, Version 2.0.
"""Column-sharded distribution on a virtual 8-device CPU mesh.

The reference has no distributed machinery (SURVEY.md §2.3); these tests
validate the new capability: sharded results are bitwise-identical to
single-device results (columns are independent, so domain decomposition
must be exact), and the full NL+TL+AD pipeline compiles and keeps the
adjoint symmetry under sharding.
"""
import jax
import jax.numpy as jnp
import numpy as np

from cloudsc2_tpu.parallel.mesh import (
    column_mesh,
    pad_columns,
    shard_state,
    unpad_columns,
)
from cloudsc2_tpu.parallel.step import forward_step, full_step, make_sharded_fn
from cloudsc2_tpu.physics.nonlinear import cloudsc2_nl


def test_mesh_shape():
    mesh = column_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("node", "device")


def test_pad_unpad_roundtrip(synth):
    _, state, _ = synth
    padded, ncols = pad_columns(state, 128)
    assert ncols == 100
    for k, v in padded.items():
        if np.ndim(v) == 2:
            assert v.shape[1] == 128
            np.testing.assert_array_equal(v[:, 100:], np.repeat(v[:, :1], 28, axis=1))
    out = unpad_columns(padded, ncols)
    for k, v in out.items():
        if np.ndim(v) == 2:
            assert np.asarray(v).shape[-1] == 100, k
        np.testing.assert_array_equal(np.asarray(v), np.asarray(state[k]), err_msg=k)


def test_sharded_nl_matches_single_device(state_with_qsat, constants):
    """Sharded NL matches the unsharded run per column to rounding.

    (Not bitwise: padding the column axis changes SIMD vector widths, which
    legally perturbs transcendental lowering by ~1 ulp.)
    """
    _, state, dt = state_with_qsat
    tends_ref, diags_ref = jax.tree.map(np.asarray, cloudsc2_nl(state, dt, constants))

    mesh = column_mesh(8)
    padded, ncols = pad_columns(state, 8)
    sharded = shard_state(padded, mesh)
    # the inputs must actually be distributed: one shard per device
    assert len(sharded["ap"].addressable_shards) == 8
    tends, diags = cloudsc2_nl(sharded, dt, constants)
    # and the outputs must stay distributed (no silent full replication)
    assert len(tends["t"].addressable_shards) == 8
    tends = unpad_columns(jax.tree.map(np.asarray, tends), ncols)
    diags = unpad_columns(jax.tree.map(np.asarray, diags), ncols)

    for name in tends_ref:
        np.testing.assert_allclose(
            tends[name], tends_ref[name], rtol=1e-12, atol=1e-18, err_msg=name
        )
    for name in diags_ref:
        np.testing.assert_allclose(
            diags[name], diags_ref[name], rtol=1e-12, atol=1e-18, err_msg=name
        )


def test_full_step_sharded_symmetry(synth, constants):
    """The full NL+TL+AD pipeline runs column-sharded and the adjoint
    symmetry <Mx,Mx> = <x,M*(Mx)> holds per column under the mesh."""
    _, state, dt = synth
    state = {k: jnp.asarray(v) for k, v in state.items()}
    mesh = column_mesh(8)
    padded, ncols = pad_columns(state, 8)
    sharded = shard_state(padded, mesh)

    step = make_sharded_fn(full_step, mesh, sharded, dt=dt, c=constants)
    tends, norm1, norm2 = step(sharded)
    n1 = np.asarray(norm1)[:ncols]
    n2 = np.asarray(norm2)[:ncols]
    assert np.abs(n1).max() > 0, "dead TL/AD pipeline: all norms zero"
    eps = np.finfo(n2.dtype).eps
    err = np.abs(n1 - n2) / np.maximum(eps * np.abs(n2), 1e-300)
    assert err.max() < 1e4, err.max()


def test_shard_map_pallas_forward_step(constants):
    """The Pallas kernel runs under shard_map: each device executes the
    kernel on its local lane-aligned column shard, no communication."""
    from cloudsc2_tpu import iox
    from cloudsc2_tpu.parallel.step import make_sharded_forward_step

    _, state_np, dt = iox.synthesize_input(ncols=8 * 4096, nlev=137, seed=0, dtype=np.float32)
    state = {k: jnp.asarray(v, jnp.float32) for k, v in state_np.items()}
    t_ref, _ = jax.jit(lambda s: forward_step(s, dt, constants, impl="scan"))(state)

    mesh = column_mesh(8)
    sharded = shard_state(state, mesh)
    step = make_sharded_forward_step(mesh, dt=dt, c=constants, impl="pallas-interpret")
    t_s, d_s = step(sharded)
    for n in t_ref:
        np.testing.assert_allclose(
            np.asarray(t_s[n]), np.asarray(t_ref[n]), rtol=3e-5, atol=1e-7, err_msg=n
        )
    _, d_ref = jax.jit(lambda s: forward_step(s, dt, constants, impl="scan"))(state)
    for n in ("clc", "covptot", "fplsl", "fplsn", "fhpsl", "fhpsn"):
        np.testing.assert_allclose(
            np.asarray(d_s[n]), np.asarray(d_ref[n]), rtol=3e-5, atol=1e-5, err_msg=n
        )


def test_shard_map_eta_from_global_column0(constants):
    """eta is defined from the GLOBAL column 0 (reference
    common/diagnostics.py:28-45).  With column-varying ``ap/aph_s`` ratios
    (e.g. IFS hybrid A+B*ps coordinates) a shard-local eta recompute would
    silently diverge; the sharded step must match the unsharded one."""
    from cloudsc2_tpu import iox
    from cloudsc2_tpu.parallel.step import make_sharded_forward_step

    _, state_np, dt = iox.synthesize_input(ncols=64, nlev=137, seed=3, dtype=np.float32)
    # break the synthetic workload's column-uniform eta: perturb ap with a
    # per-column, per-level factor so ap/aph_s genuinely varies by column
    nlev, ncols = state_np["ap"].shape
    w = 0.02 * np.sin(np.arange(ncols) + 1.0)[None, :]
    h = np.linspace(0.0, 1.0, nlev)[:, None]
    state_np["ap"] = state_np["ap"] * (1.0 + w * h).astype(np.float32)
    state = {k: jnp.asarray(v, jnp.float32) for k, v in state_np.items()}

    t_ref, d_ref = jax.jit(lambda s: forward_step(s, dt, constants, impl="scan"))(state)

    mesh = column_mesh(8)
    sharded = shard_state(state, mesh)
    step = make_sharded_forward_step(mesh, dt=dt, c=constants, impl="scan")
    t_s, d_s = step(sharded)
    for n in t_ref:
        np.testing.assert_allclose(
            np.asarray(t_s[n]), np.asarray(t_ref[n]), rtol=1e-6, atol=0, err_msg=n
        )
    for n in ("clc", "covptot", "fplsl", "fplsn"):
        np.testing.assert_allclose(
            np.asarray(d_s[n]), np.asarray(d_ref[n]), rtol=1e-6, atol=0, err_msg=n
        )


def test_forward_step_jit_cache_stable(state_with_qsat, constants):
    """forward_step is a single jittable unit (saturation fused with NL)."""
    _, state, dt = state_with_qsat
    state = {k: v for k, v in state.items() if k not in ("eta", "qsat")}
    step = jax.jit(lambda s: forward_step(s, dt, constants))
    tends, diags = step(state)
    assert not np.isnan(np.asarray(tends["t"])).any()
    assert np.asarray(diags["fplsl"]).shape[0] == 138


def test_sharded_forward_step_compiles_to_zero_collectives(constants):
    """Columns are independent (SURVEY.md §2.3): the sharded forward step
    must lower to per-device local compute with NO cross-device
    communication — collectives appear only in the validation norms."""
    from cloudsc2_tpu import iox
    from cloudsc2_tpu.parallel.step import make_sharded_forward_step

    _, state_np, dt = iox.synthesize_input(ncols=8 * 128, nlev=16, seed=0, dtype=np.float32)
    state = {k: jnp.asarray(v, jnp.float32) for k, v in state_np.items()}
    from cloudsc2_tpu.physics.diagnostics import eta_levels

    mesh = column_mesh(8)
    sharded = shard_state(state, mesh)
    # eta (global column 0, loop-invariant) is derived once OUTSIDE the hot
    # step by make_sharded_forward_step; the compiled step itself must stay
    # collective-free
    sharded["eta"] = eta_levels(state["ap"], state["aph"])
    step = make_sharded_forward_step(mesh, dt=dt, c=constants, impl="scan")
    hlo = step.jitted.lower(sharded).compile().as_text()
    for coll in ("all-gather", "all-reduce", "collective-permute", "all-to-all"):
        assert coll not in hlo, f"unexpected collective {coll} in sharded forward step"
