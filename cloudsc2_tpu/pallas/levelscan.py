
# Copyright 2026.
# Licensed under the Apache License, Version 2.0.
"""Generic Pallas harness for vertical-scan column physics.

All CLOUDSC2 schemes share one execution shape: a strictly sequential
top-down sweep over levels with a small per-column carry, over thousands of
independent columns (SURVEY.md §5 "long-context" analogue).  This harness
factors the TPU memory orchestration out of the physics:

* ``(nlev, ncols)`` fields are viewed ``(nlev, 8, ncols // 8)`` so a level
  slice is a native ``(8, 128k)`` VPU tile;
* the kernel grid is ``(column_tiles, level_blocks)`` — the level axis
  iterates fastest, TPU grid execution is sequential, and the carry lives
  in a VMEM scratch persisting across level blocks;
* every level block streams ``kb`` levels of all inputs HBM→VMEM
  (double-buffered by the pallas pipeline) and writes all outputs: exactly
  one HBM round trip, the roofline for these memory-bound schemes;
* per-level scalars (eta coordinate, ``scalm``) ride in SMEM.

The per-level physics body is the same function used by the ``lax.scan``
reference path, so kernels cannot drift from their f64 oracle.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _pad_levels(x: Array, kp: int, zero: bool = False) -> Array:
    pad = ((0, kp - x.shape[0]),) + ((0, 0),) * (x.ndim - 1)
    return jnp.pad(x, pad) if zero else jnp.pad(x, pad, mode="edge")


def level_scan_pallas(
    body: Callable,
    *,
    level_inputs: Dict[str, Array],
    col_inputs: Dict[str, Array],
    scalar_inputs: Dict[str, Array],
    out_names: Sequence[str],
    ncarry: int,
    kb: int,
    wb: int,
    reverse: bool = False,
    interpret: bool = False,
    unroll: int = 1,
    zero_pad_names: Sequence[str] = (),
    pre_body: Callable | None = None,
) -> Dict[str, Array]:
    """Run ``body`` as a Pallas level scan.

    ``body(carry, x, col, k)`` receives the carry (tuple of ``ncarry``
    ``(8, wb)`` arrays, zero-initialized at the top), the per-level input
    dict ``x`` (``(8, wb)`` tiles plus the scalar inputs as 0-d values),
    the per-column dict ``col``, and returns ``(carry, outs)`` with
    ``outs`` keyed by ``out_names``.  Returns the stacked outputs as
    ``(nlev, ncols)`` arrays.

    ``pre_body(xb, col)``, if given, runs ONCE per level block before the
    sequential loop, on the whole block: ``xb`` holds the level inputs as
    ``(kb, 8, wb)`` tensors and the scalar inputs as ``(kb, 1, 1)``
    columns (broadcastable against the blocks); it returns a dict of
    ``(kb, 8, wb)`` tensors whose per-level rows are merged into ``x``
    for ``body``.  Use it to evaluate the carry-independent part of the
    physics as bulk tensor ops (full VPU utilization, no loop-carried
    dependency) so only the carry-dependent tail iterates.  Keys must not
    collide with level-input names.  On a ragged edge block the rows past
    the last real level hold unspecified values — ``pre_body`` must be
    elementwise along the level axis so those rows stay inert (they are
    never read by the loop nor stored).

    ``unroll >= kb`` replaces the in-block level loop with a fully static
    Python loop (static VMEM row indices), letting Mosaic software-pipeline
    the independent per-level computations across the sequential carry
    chain — the VPU-latency-hiding analogue of the reference backends'
    k-loop unrolling.  Intermediate values run a manual partial unroll
    (``unroll`` levels per ``fori_loop`` iteration — Mosaic's ``fori_loop``
    only supports full unroll) and must divide ``kb`` exactly.
    (Measured on v5e: neither helps — the kernels are VPU-op-bound and
    Mosaic already pipelines the rolled loop well.)

    ``reverse=True`` sweeps levels bottom-up (the adjoint direction,
    reference ``computation(BACKWARD)``, ``adjoint/_stencils/cloudsc2.py:
    479-996``): the carry is zero-initialized at the *bottom* and level
    blocks stream in reverse.

    ``zero_pad_names`` marks level inputs that are cotangent *seeds*: in
    the padded layout (``unroll > 1``) they are zero-padded instead of
    edge-padded.  ``reverse`` with ``unroll > 1`` requires every seed input
    to be listed here AND a body that is linear in (carry, seeds) — then
    the padded levels (swept first, from zero carry) contribute exactly
    zero to the carry cotangents, while their edge-padded trajectory
    inputs keep every linearization coefficient finite.  The rolled
    default (``unroll == 1``) is unpadded (ragged edge block), so seeds
    pass through exactly with no conditions.
    """
    if reverse and unroll > 1 and not zero_pad_names:
        raise ValueError(
            "reverse=True with unroll>1 requires zero_pad_names: the padded "
            "layout would otherwise feed edge-padded cotangent seeds into "
            "the reverse carry"
        )
    if pre_body is not None and unroll < kb:
        raise ValueError(
            "pre_body requires unroll >= kb (fully static level loop): the "
            "block results are vector values, which cannot be dynamically "
            "row-indexed by a traced fori_loop counter inside Mosaic"
        )
    names = tuple(level_inputs)
    col_names = tuple(col_inputs)
    scal_names = tuple(scalar_inputs)
    out_names = tuple(out_names)

    sample = next(iter(level_inputs.values()))
    nlev, ncols = sample.shape
    dtype = sample.dtype
    if dtype == jnp.float64:
        raise ValueError(
            "Pallas kernels require single precision (TPU Mosaic has no f64); "
            "use the lax.scan implementation (the f64 oracle) instead"
        )
    if ncols % (8 * wb) != 0:
        raise ValueError(f"ncols={ncols} must be a multiple of {8 * wb}")
    w = ncols // 8
    nj = w // wb
    kp = math.ceil(nlev / kb) * kb
    nkb = kp // kb
    u = max(min(unroll, kb), 1)
    # Default (rolled) path: NO level padding.  137 levels is prime, so any
    # kb > 1 needs a ragged edge block; padding instead would copy every
    # input and output array per call (~1.2 GB of HBM traffic per step at
    # the benchmark shape).  Pallas handles the partial edge block natively
    # (out-of-bounds rows are neither read by the loop nor stored back);
    # the in-kernel trip count is clamped to the valid rows.  The unroll>1
    # experimental variants need static trip counts, so they keep the
    # padded layout.
    ragged = u == 1
    klev = nlev if ragged else kp

    def kernel(*refs):
        n_s, n_l, n_c, n_o = len(scal_names), len(names), len(col_names), len(out_names)
        scal_refs = refs[:n_s]
        level_refs = refs[n_s : n_s + n_l]
        col_refs = refs[n_s + n_l : n_s + n_l + n_c]
        out_refs = refs[n_s + n_l + n_c : n_s + n_l + n_c + n_o]
        carry_ref = refs[-1]

        kb_id = pl.program_id(1)

        @pl.when(kb_id == 0)
        def _init():
            carry_ref[...] = jnp.zeros_like(carry_ref)

        col = {n: r[...] for n, r in zip(col_names, col_refs)}
        # block index in array space (the index_map already reverses blocks)
        ar_kb = (nkb - 1 - kb_id) if reverse else kb_id
        # rows of this block that exist in the (possibly ragged) array
        valid = jnp.minimum(kb, nlev - ar_kb * kb) if ragged else kb

        if pre_body is not None:
            xb = {n: r[...] for n, r in zip(names, level_refs)}
            for n, r in zip(scal_names, scal_refs):
                # (kb, 8, wb) broadcast of the block's per-level scalars —
                # Mosaic has no tiny-vector shapes ((kb,1,1) reshape is an
                # unsupported shape cast), so splat each SMEM scalar to a
                # full row; clamped reads keep the ragged edge block in
                # bounds (the extra rows are never consumed)
                xb[n] = jnp.concatenate(
                    [
                        jnp.full((1, 8, wb), r[jnp.minimum(ar_kb * kb + i, nlev - 1), 0], dtype=dtype)
                        for i in range(kb)
                    ],
                    axis=0,
                )
            preb = pre_body(xb, col)
            clash = set(preb) & set(names)
            if clash:
                raise ValueError(f"pre_body keys shadow level inputs: {sorted(clash)}")
        else:
            preb = {}

        def step_at(row, carry):
            x = {n: r[row] for n, r in zip(names, level_refs)}
            g = ar_kb * kb + row
            for n, r in zip(scal_names, scal_refs):
                x[n] = r[g, 0]
            for n, v in preb.items():
                x[n] = v[row]
            carry, outs = body(carry, x, col, g)
            for n, r in zip(out_names, out_refs):
                r[row] = outs[n]
            return carry

        carry = tuple(carry_ref[j] for j in range(ncarry))
        if u >= kb:
            for i in range(kb):
                carry = step_at((kb - 1 - i) if reverse else i, carry)
        elif u > 1:
            # manual partial unroll: Mosaic's fori_loop only supports full
            # unroll, so widen the loop body by hand — u levels per
            # iteration gives the scheduler a u-times-larger block of
            # mostly carry-independent work to pipeline
            if kb % u != 0:
                raise ValueError(f"unroll={u} must divide kb={kb}")

            def block(b, carry):
                for j in range(u):
                    i = b * u + j
                    carry = step_at((kb - 1 - i) if reverse else i, carry)
                return carry

            carry = jax.lax.fori_loop(0, kb // u, block, carry)
        else:
            # rolled default: iterate only the valid rows (top-down:
            # 0..valid-1; bottom-up: valid-1..0 — the ragged rows sit at
            # the high end of the edge block in both directions)
            carry = jax.lax.fori_loop(
                0,
                valid,
                lambda i, c: step_at((valid - 1 - i) if reverse else i, c),
                carry,
            )
        for j in range(ncarry):
            carry_ref[j] = carry[j]

    if reverse:
        level_spec = pl.BlockSpec(
            (kb, 8, wb), lambda j, k: (nkb - 1 - k, 0, j), memory_space=pltpu.VMEM
        )
    else:
        level_spec = pl.BlockSpec(
            (kb, 8, wb), lambda j, k: (k, 0, j), memory_space=pltpu.VMEM
        )
    col_spec = pl.BlockSpec((8, wb), lambda j, k: (0, j), memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    if ragged:
        ins = (
            [scalar_inputs[n].astype(dtype).reshape(nlev, 1) for n in scal_names]
            + [level_inputs[n].reshape(nlev, 8, w) for n in names]
            + [col_inputs[n].reshape(8, w) for n in col_names]
        )
    else:
        zset = frozenset(zero_pad_names)
        unknown = zset - set(names)
        if unknown:
            raise ValueError(f"zero_pad_names not in level_inputs: {sorted(unknown)}")
        ins = (
            [_pad_levels(scalar_inputs[n].astype(dtype), kp).reshape(kp, 1) for n in scal_names]
            + [_pad_levels(level_inputs[n], kp, zero=n in zset).reshape(kp, 8, w) for n in names]
            + [col_inputs[n].reshape(8, w) for n in col_names]
        )
    outs = pl.pallas_call(
        kernel,
        grid=(nj, nkb),
        in_specs=[smem_spec] * len(scal_names)
        + [level_spec] * len(names)
        + [col_spec] * len(col_names),
        out_specs=[level_spec] * len(out_names),
        out_shape=[jax.ShapeDtypeStruct((klev, 8, w), dtype) for _ in out_names],
        scratch_shapes=[pltpu.VMEM((ncarry, 8, wb), dtype)],
        # column tiles are independent (carry re-zeroed at each tile's first
        # level block); only the level axis must run sequentially
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(*ins)

    return {n: o.reshape(klev, ncols)[:nlev] for n, o in zip(out_names, outs)}
