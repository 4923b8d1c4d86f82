
# Copyright 2026.
# Licensed under the Apache License, Version 2.0.
"""Sharded step functions: the full NL + TL + AD pipeline under one ``jit``.

The framework's "training step" analogue is the complete symmetry-test
pipeline (reference ``physics/adjoint/validation.py:132-165``): saturation →
state increment → tangent-linear (forward + directional derivative) →
adjoint (forward recompute + reverse sweep) → the two validation norms.
It exercises every kernel plus the only collectives in the system (the
global max over per-column norms).  Under a column-sharded mesh the whole
pipeline is embarrassingly parallel except that final reduction.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from cloudsc2_tpu.params import Constants
from cloudsc2_tpu.parallel.mesh import state_shardings
from cloudsc2_tpu.physics.adjoint import cloudsc2_ad
from cloudsc2_tpu.physics.diagnostics import eta_levels
from cloudsc2_tpu.physics.increment import state_increment
from cloudsc2_tpu.physics.nonlinear import cloudsc2_nl
from cloudsc2_tpu.physics.saturation import saturation
from cloudsc2_tpu.physics.tangent_linear import cloudsc2_tl
from cloudsc2_tpu.validation.symmetry import (
    DIAG_NAMES,
    TEND_NAMES,
    SymmetryTest,
)

Array = jnp.ndarray


from cloudsc2_tpu.dispatch import use_pallas as _use_pallas


def _nl_impl(state: Dict[str, Array], dt: float, c: Constants, impl: str):
    """Select the NL implementation: hand-written Pallas kernel on TPU for
    f32 with lane-aligned columns, ``lax.scan`` otherwise (CPU, f64, or
    ragged column counts).  ``pallas-interpret`` forces the kernel in
    interpreter mode (CPU testing)."""
    if _use_pallas(state, impl):
        from cloudsc2_tpu.pallas.nonlinear import cloudsc2_nl_pallas

        if impl == "pallas-tiled":
            from cloudsc2_tpu.dispatch import _tiled_boundary

            return _tiled_boundary(cloudsc2_nl_pallas)(state, dt, c)
        return cloudsc2_nl_pallas(
            state, dt, c, interpret=impl == "pallas-interpret"
        )
    return cloudsc2_nl(state, dt, c)


def forward_step(
    state: Dict[str, Array], dt: float, c: Constants, impl: str = "auto"
) -> Tuple[Dict[str, Array], Dict[str, Array]]:
    """Saturation + nonlinear scheme (the reference hot loop,
    ``drivers/run_nonlinear.py:115-119``).  ``diags["qsat"]`` carries the
    Saturation component's output on the Pallas path.

    The Pallas path computes saturation as an XLA op feeding the unrolled
    NL kernel rather than fusing it into the kernel: measured on v5e
    (benchmarks/sweep_nl.py history), XLA-saturation + unroll=2 kernel runs
    15.9M cols/s vs 14.7M for the fused kernel — the in-kernel saturation
    lengthens the level body's dependency chains by more than the qsat HBM
    round trip costs.  (Round 1 measured the opposite on the pre-
    strength-reduced body; ``fuse_saturation=True`` remains available on
    :func:`cloudsc2_nl_pallas`.)

    A caller-provided ``state["eta"]`` is used as-is; eta is only derived
    here when missing.  This matters under ``shard_map``: eta is defined
    from the *global* column 0 (reference ``common/diagnostics.py:28-45``),
    so a shard-local recompute would silently diverge whenever ``ap/aph_s``
    varies per column — :func:`make_sharded_forward_step` computes it once
    globally and passes it in replicated.

    It also matters for performance when this function is traced inside a
    loop: eta is loop-invariant, but XLA does not hoist the fallback
    derivation (and the scalar-operand chain it feeds) out of a
    ``fori_loop`` — measured +1.3 ms/step on v5e at the benchmark shape
    (same-process A/B, bench.py).  Hot loops should pass eta in, as the
    drivers (EtaLevels before the timed loop) and bench.py do.
    """
    s = dict(state)
    if "eta" not in s:
        s["eta"] = eta_levels(s["ap"], s["aph"])
    s["qsat"] = saturation(s["ap"], s["t"], kflag=1, lphylin=c.LPHYLIN, c=c)
    if _use_pallas(s, impl):
        from cloudsc2_tpu.pallas.nonlinear import cloudsc2_nl_pallas

        if impl == "pallas-tiled":
            from cloudsc2_tpu.dispatch import _tiled_boundary

            tends, diags = _tiled_boundary(cloudsc2_nl_pallas)(s, dt, c)
        else:
            tends, diags = cloudsc2_nl_pallas(
                s, dt, c, interpret=impl == "pallas-interpret"
            )
        diags["qsat"] = s["qsat"]
        return tends, diags
    return _nl_impl(s, dt, c, impl)


def full_step(
    state: Dict[str, Array], dt: float, c: Constants, factor: float = 0.01
) -> Tuple[Dict[str, Array], Array, Array]:
    """The complete NL + TL + AD pipeline with symmetry norms.

    Returns ``(nl_tendencies, norm1, norm2)`` where the norms are the
    per-column ``<Mx, Mx>`` and ``<x, M*(Mx)>`` of the symmetry test.
    """
    s = dict(state)
    if "eta" not in s:
        # under jit/GSPMD this reads the global column 0 (correct); only
        # shard_map callers must pass eta in (see forward_step docstring)
        s["eta"] = eta_levels(s["ap"], s["aph"])
    s["qsat"] = saturation(s["ap"], s["t"], kflag=1, lphylin=c.LPHYLIN, c=c)

    incr = state_increment(s, factor, ignore_supsat=True)
    s.update(incr)
    tends_tl, diags_tl = cloudsc2_tl(s, dt, c)
    # the TL computes the full forward trajectory alongside the directional
    # derivative and returns the forward tendencies (reference TL outputs
    # ``out_tnd_*``, ``tangent_linear/microphysics.py:46-242``) — reuse
    # them instead of re-running the NL scheme; the reference's symmetry
    # protocol does the same (``adjoint/validation.py:132-151``)
    tends_nl = {n: tends_tl[n] for n in TEND_NAMES}
    norm1 = SymmetryTest.get_norm1(tends_tl, diags_tl)

    for name in TEND_NAMES:
        s["tnd_" + name] = tends_tl[name]
        s["tnd_" + name + "_i"] = tends_tl[name + "_i"]
    for name in DIAG_NAMES:
        s[name + "_i"] = diags_tl[name + "_i"]
    tends_ad, diags_ad = cloudsc2_ad(s, dt, c)
    norm2 = SymmetryTest.get_norm2(incr, tends_ad, diags_ad)
    return tends_nl, norm1, norm2


def make_sharded_fn(fn, mesh: Mesh, state: Dict[str, Array], *, dt: float, c: Constants):
    """Jit ``fn(state, dt, c)`` with column shardings pinned on the inputs.

    Outputs inherit shardings from the computation (GSPMD propagation); the
    vertical scan is local, so no resharding occurs in the hot path.
    """
    in_shardings = (state_shardings(state, mesh),)
    return jax.jit(
        partial(fn, dt=dt, c=c),
        in_shardings=in_shardings,
    )


def make_sharded_physics(fn, mesh: Mesh):
    """Wrap a physics scheme ``fn(state, dt, c) -> (dict, dict)`` to run
    column-sharded under ``shard_map`` on ``mesh``.

    The generic sibling of :func:`make_sharded_forward_step` used by the
    Taylor/symmetry protocols (driver ``--sharded``): 2-D fields are
    column-sharded, 1-D fields (eta) replicated; each device runs the
    scheme on its local column shard — no communication, columns are
    independent (SURVEY.md §2.3).  Works for the ``lax.scan`` paths and the
    Pallas kernels alike (GSPMD cannot partition a ``pallas_call``, so the
    kernels require ``shard_map``; per-shard columns must then stay
    lane-aligned).  One compiled step per (dt, c, state structure) — the
    returned callable is constructed once per protocol run and reused.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from cloudsc2_tpu.parallel.mesh import MESH_AXES

    spec2d = P(None, MESH_AXES)
    nshards = mesh.devices.size

    @partial(jax.jit, static_argnames=("dt", "c"))
    def step(state, dt, c):
        def local_fn(s):
            return fn(s, dt, c)

        def spec_for(v):
            return spec2d if v.ndim == 2 else P()

        in_specs = ({k: spec_for(v) for k, v in state.items()},)
        # discover the output key sets on the PER-DEVICE shard shapes (as
        # make_sharded_forward_step: the Pallas lane-alignment check must
        # see what each device sees)
        local_abs = {
            k: jax.ShapeDtypeStruct(
                (v.shape[0], v.shape[1] // nshards) if v.ndim == 2 else v.shape,
                v.dtype,
            )
            for k, v in state.items()
        }
        out_abs = jax.eval_shape(local_fn, local_abs)
        out_specs = tuple({k: spec2d for k in d} for d in out_abs)
        return shard_map(
            local_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )(state)

    return step


def make_sharded_forward_step(
    mesh: Mesh, *, dt: float, c: Constants, impl: str = "auto"
):
    """Column-sharded forward step via ``shard_map``.

    GSPMD cannot partition a ``pallas_call`` automatically, so the Pallas
    fast path runs under ``shard_map``: each device executes the kernel on
    its local column shard (which must stay lane-aligned per shard); there
    is no communication — columns are independent (SURVEY.md §2.3).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from cloudsc2_tpu.parallel.mesh import MESH_AXES

    spec2d = P(None, MESH_AXES)

    def local_fn(state):
        return forward_step(state, dt, c, impl=impl)

    def wrapped(state):
        # 1-D fields (the eta coordinate) are replicated; 2-D fields are
        # column-sharded (same rank rule as mesh.state_shardings)
        def spec_for(v):
            return spec2d if v.ndim == 2 else P()

        in_specs = ({k: spec_for(v) for k, v in state.items()},)
        # discover the diag key set (the fused Pallas path adds "qsat") by
        # abstractly tracing on the PER-DEVICE shard shapes — the Pallas
        # eligibility check (lane-aligned local columns) must see what each
        # device sees, not the global shape
        nshards = mesh.devices.size
        local_abs = {
            k: jax.ShapeDtypeStruct(
                (v.shape[0], v.shape[1] // nshards) if v.ndim == 2 else v.shape,
                v.dtype,
            )
            for k, v in state.items()
        }
        diag_keys = jax.eval_shape(local_fn, local_abs)[1].keys()
        out_specs = ({k: spec2d for k in ("t", "q", "ql", "qi")},
                     {k: spec2d for k in diag_keys})
        # check_vma=False: pallas_call outputs carry no varying-mesh-axis
        # annotation; the kernel is purely local so the check adds nothing
        return shard_map(
            local_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )(state)

    jitted = jax.jit(wrapped)

    def call(state):
        # eta is defined from the GLOBAL column 0 (reference
        # common/diagnostics.py:28-45) — a shard-local recompute inside
        # shard_map would silently diverge whenever ap/aph_s varies per
        # column.  It is also loop-invariant, so derive it once here,
        # eagerly and replicated, keeping the hot compiled step free of
        # collectives (columns are independent, SURVEY.md §2.3).
        if "eta" not in state:
            state = dict(state)
            eta = eta_levels(state["ap"], state["aph"])
            state["eta"] = jax.device_put(
                eta, jax.sharding.NamedSharding(mesh, P())
            )
        return jitted(state)

    call.jitted = jitted  # the hot compiled step, exposed for HLO inspection
    return call
