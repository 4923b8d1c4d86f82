
# Copyright 2026.
# Licensed under the Apache License, Version 2.0.
"""Pallas TPU kernel for the nonlinear CLOUDSC2 scheme.

The TPU-native realization of the reference ``cloudsc2_nl`` stencil
(``physics/nonlinear/_stencils/cloudsc2.py:24-399``), sharing its per-level
physics with the ``lax.scan`` path (:func:`cloudsc2_tpu.physics.nonlinear.
nl_level` is called *inside* the kernel), so the two implementations cannot
drift.

Layout: ``(nlev, ncols)`` fields are viewed as ``(nlev, 8, ncols // 8)`` so
each level slice is a native ``(8, 128k)`` VPU tile — the column axis fills
both the sublane and lane dimensions.  The kernel grid is
``(column_tiles, level_blocks)``; the level axis iterates fastest and TPU
grid execution is sequential, so the vertical carry (rain/snow flux,
precipitation cover — the reference's ``tmp_*`` IJ fields,
``microphysics.py:131-133``) lives in a VMEM scratch that persists across
level blocks.  Each level block streams ``KB`` levels of all 16 inputs
HBM→VMEM (double-buffered by the pallas pipeline) and writes 10 outputs —
one HBM round trip total, which is the roofline for this memory-bound
scheme.

The tropopause search (a cross-level reduction needed *before* level 0's
cloud-cover computation, reference ``cloudsc2.py:106-111``) cannot live in
the top-down kernel sweep; it is fused with the first-guess temperature and
saturation pre-pass in plain jnp (XLA fuses these into one cheap pass).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cloudsc2_tpu.params import Constants
from cloudsc2_tpu.physics.nonlinear import NLCarry, nl_level, tropopause_eta

Array = jnp.ndarray

#: level-block height (grid steps stream KB levels at a time)
KB = 16
#: lane width of one column tile (columns per tile = 8 * WB)
WB = 512

#: per-level input fields, in kernel argument order
LEVEL_INPUTS = (
    "ap", "aph0", "aph1", "lu_next", "lude", "mfd", "mfu", "q", "qi", "ql",
    "qsat", "supsat", "t_fg", "tnd_cml_q", "tnd_cml_qi", "tnd_cml_ql",
)
#: per-level outputs, in kernel result order
LEVEL_OUTPUTS = (
    "tnd_t", "tnd_q", "tnd_ql", "tnd_qi", "clc", "covptot",
    "fplsl", "fplsn", "fhpsl", "fhpsn",
)


def _kernel(eta_ref, scalm_ref, *refs, dt: float, c: Constants):
    level_refs = refs[: len(LEVEL_INPUTS)]
    trpaus_ref, aph_s_ref = refs[len(LEVEL_INPUTS) : len(LEVEL_INPUTS) + 2]
    out_refs = refs[len(LEVEL_INPUTS) + 2 : -1]
    carry_ref = refs[-1]

    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _init():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    trpaus = trpaus_ref[...]
    aph_s = aph_s_ref[...]

    def body(i, carry):
        x = {name: ref[i] for name, ref in zip(LEVEL_INPUTS, level_refs)}
        g = kb * KB + i
        x["eta"] = eta_ref[g, 0]
        x["scalm"] = scalm_ref[g, 0]
        carry, outs, _ = nl_level(carry, x, aph_s, trpaus, dt, c)
        outs["fhpsl"] = -outs["fplsl"] * c.RLVTT
        outs["fhpsn"] = -outs["fplsn"] * c.RLSTT
        for name, ref in zip(LEVEL_OUTPUTS, out_refs):
            ref[i] = outs[name]
        return carry

    carry = NLCarry(carry_ref[0], carry_ref[1], carry_ref[2])
    carry = jax.lax.fori_loop(0, KB, body, carry, unroll=1)
    carry_ref[0], carry_ref[1], carry_ref[2] = carry


def _pad_levels(x: Array, kp: int) -> Array:
    return jnp.pad(x, ((0, kp - x.shape[0]),) + ((0, 0),) * (x.ndim - 1), mode="edge")


@partial(jax.jit, static_argnames=("dt", "c", "interpret"))
def cloudsc2_nl_pallas(
    state: Dict[str, Array], dt: float, c: Constants, interpret: bool = False
) -> Tuple[Dict[str, Array], Dict[str, Array]]:
    """Drop-in replacement for :func:`cloudsc2_tpu.physics.nonlinear.
    cloudsc2_nl` backed by the Pallas kernel.

    Requires ``ncols`` to be a multiple of ``8 * WB`` (2048); use
    :func:`cloudsc2_tpu.parallel.mesh.pad_columns` otherwise.  float32 only
    (TPU Mosaic has no f64); the ``lax.scan`` path remains the f64 oracle.
    """
    nlev, ncols = state["ap"].shape
    dtype = state["ap"].dtype
    if ncols % (8 * WB) != 0:
        raise ValueError(f"ncols={ncols} must be a multiple of {8 * WB}")
    w = ncols // 8
    nj = w // WB
    kp = math.ceil(nlev / KB) * KB
    nkb = kp // KB

    eta = state["eta"].astype(dtype)
    zeps1 = 1e-12
    scalm = jnp.asarray(0.9, dtype) * jnp.maximum(eta - 0.2, zeps1) ** 0.2

    t_fg = state["t"] + dt * state["tnd_cml_t"]
    trpaus = tropopause_eta(eta, t_fg)
    lu = state["lu"]
    lu_next = jnp.concatenate([lu[1:], jnp.zeros_like(lu[:1])], axis=0)

    def view(x):  # (nlev, ncols) -> (kp, 8, w), edge-padded levels
        return _pad_levels(x, kp).reshape(kp, 8, w)

    level_arrays = {
        "ap": state["ap"],
        "aph0": state["aph"][:-1],
        "aph1": state["aph"][1:],
        "lu_next": lu_next,
        "lude": state["lude"],
        "mfd": state["mfd"],
        "mfu": state["mfu"],
        "q": state["q"],
        "qi": state["qi"],
        "ql": state["ql"],
        "qsat": state["qsat"],
        "supsat": state["supsat"],
        "t_fg": t_fg,
        "tnd_cml_q": state["tnd_cml_q"],
        "tnd_cml_qi": state["tnd_cml_qi"],
        "tnd_cml_ql": state["tnd_cml_ql"],
    }
    inputs = [view(level_arrays[n]) for n in LEVEL_INPUTS]
    inputs.append(trpaus.reshape(8, w))
    inputs.append(state["aph"][-1].reshape(8, w))

    eta_in = _pad_levels(eta, kp).reshape(kp, 1)
    scalm_in = _pad_levels(scalm, kp).reshape(kp, 1)

    level_spec = pl.BlockSpec(
        (KB, 8, WB), lambda j, kb: (kb, 0, j), memory_space=pltpu.VMEM
    )
    col_spec = pl.BlockSpec((8, WB), lambda j, kb: (0, j), memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    out_shape = [jax.ShapeDtypeStruct((kp, 8, w), dtype) for _ in LEVEL_OUTPUTS]

    outs = pl.pallas_call(
        partial(_kernel, dt=dt, c=c),
        grid=(nj, nkb),
        in_specs=[smem_spec, smem_spec]
        + [level_spec] * len(LEVEL_INPUTS)
        + [col_spec, col_spec],
        out_specs=[level_spec] * len(LEVEL_OUTPUTS),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((3, 8, WB), dtype)],
        interpret=interpret,
    )(eta_in, scalm_in, *inputs)

    named = dict(zip(LEVEL_OUTPUTS, outs))

    def back(x):  # (kp, 8, w) -> (nlev, ncols)
        return x.reshape(kp, ncols)[:nlev]

    zrow = jnp.zeros((1, ncols), dtype)
    fplsl = jnp.concatenate([zrow, back(named["fplsl"])], axis=0)
    fplsn = jnp.concatenate([zrow, back(named["fplsn"])], axis=0)
    fhpsl = jnp.concatenate([zrow, back(named["fhpsl"])], axis=0)
    fhpsn = jnp.concatenate([zrow, back(named["fhpsn"])], axis=0)
    tends = {
        "t": back(named["tnd_t"]),
        "q": back(named["tnd_q"]),
        "ql": back(named["tnd_ql"]),
        "qi": back(named["tnd_qi"]),
    }
    diags = {
        "clc": back(named["clc"]),
        "covptot": back(named["covptot"]),
        "fplsl": fplsl,
        "fplsn": fplsn,
        "fhpsl": fhpsl,
        "fhpsn": fhpsn,
    }
    return tends, diags
