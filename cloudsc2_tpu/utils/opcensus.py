
# Copyright 2026.
# Licensed under the Apache License, Version 2.0.
"""Static VPU op census of traced physics bodies.

Counts jaxpr primitives of one level of a scheme body.  Two uses:

* ``weighted`` totals (``WEIGHTS``: div = 14 measured v5e op-equivalents,
  ``benchmarks/microbench_div.py``) predict throughput *shifts* from pure
  code changes without a chip — they overestimate absolute cost because the
  kernels hide op latency with ILP (measured: FAST_DIV gains only ~1-2%
  despite divides being ~1/3 of the weighted budget).
* ``issue`` totals (1 per computational primitive) feed the serial-issue
  compute roofline in ``bench.py``: the kernels are VPU-issue-bound, so the
  ceiling is (measured VPU op rate) / (issued ops per column).

Shape-only primitives (broadcasts, converts, reshapes) are excluded from
both counts — they lower to vector-register plumbing, not VPU issues.
"""
from __future__ import annotations

import collections
from typing import Callable, Counter, Sequence

import jax

#: measured v5e op-equivalents relative to one VPU mul
#: (benchmarks/microbench_div.py, microbench_ops.py)
WEIGHTS = {"div": 14.0, "exp": 3.0, "tanh": 6.0, "sqrt": 3.0, "rsqrt": 3.0,
           "pow": 14.0, "integer_pow": 2.0}

#: metadata/layout primitives that issue no VPU op
NON_ISSUING = frozenset({
    "broadcast_in_dim", "convert_element_type", "reshape", "squeeze",
    "slice", "concatenate", "transpose", "copy", "stop_gradient",
})


def census(fn: Callable, args: Sequence) -> Counter:
    """Primitive counts of ``fn(*args)`` (recursing into sub-jaxprs)."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    counts: Counter = collections.Counter()

    def walk(jx):
        for eqn in jx.eqns:
            counts[eqn.primitive.name] += 1
            for p in eqn.params.values():
                if hasattr(p, "jaxpr"):
                    walk(p.jaxpr)
                if isinstance(p, (list, tuple)):
                    for q in p:
                        if hasattr(q, "jaxpr"):
                            walk(q.jaxpr)

    walk(jaxpr.jaxpr)
    return counts


def issue_count(counts: Counter) -> int:
    """VPU-issued ops under the serial-issue model (1 per computational
    primitive, shape plumbing excluded)."""
    return sum(v for k, v in counts.items() if k not in NON_ISSUING)


def weighted_count(counts: Counter) -> float:
    """Measured-op-equivalent total (see WEIGHTS)."""
    return sum(
        WEIGHTS.get(k, 1.0) * v for k, v in counts.items() if k not in NON_ISSUING
    )


def nl_step_ops_per_column(c, dt: float, nlev: int) -> dict:
    """Per-column op budget of the full forward step (saturation + NL),
    the unit ``bench.py`` times.

    Counts one level of :func:`~cloudsc2_tpu.physics.nonlinear.nl_level`
    (the kernel body, traced on the folded input streams exactly as the
    Pallas wrapper feeds it) plus one level of the XLA-side saturation, and
    multiplies by ``nlev``.  The per-column assembly outside the level
    bodies (first-guess combines, fhpsl/fhpsn scalings, the chain's eps
    update — ~10 ops per level-column total) is excluded and keeps the
    ceiling slightly optimistic, which is the correct direction for a
    roofline denominator.
    """
    import jax.numpy as jnp

    from cloudsc2_tpu.physics.nonlinear import NLCarry, nl_level
    from cloudsc2_tpu.physics.saturation import saturation

    col = jnp.ones((8,), jnp.float32)
    x = {k: col for k in (
        "ap", "dp", "lu_next", "lude", "mfd", "mfu", "q2", "ql_fg", "qi_fg",
        "qsat", "t_fg", "crh_rh2", "crh_deta1", "crh_rsq",
    )}
    x["eta"] = jnp.float32(0.5)
    x["scalm"] = jnp.float32(0.1)
    carry = NLCarry(col, col, col)
    nl_counts = census(
        lambda cr, xx: nl_level(cr, xx, col, col, dt, c)[:2], (carry, x)
    )
    sat_counts = census(
        lambda ap, t: saturation(ap, t, kflag=1, lphylin=c.LPHYLIN, c=c),
        (col, col),
    )
    issue = (issue_count(nl_counts) + issue_count(sat_counts)) * nlev
    weighted = (weighted_count(nl_counts) + weighted_count(sat_counts)) * nlev
    return {"issue_ops_per_col": issue, "weighted_ops_per_col": weighted}
