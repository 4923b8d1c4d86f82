"""Static per-level VPU op census of the physics bodies.

Traces one level of ``nl_level`` / ``tl_level`` (and the adjoint's
``jax.vjp``-of-TL reverse body) to a jaxpr and counts primitives.  This is
the precise form of the op-budget arithmetic in ``benchmarks/README.md``:
the kernels are VPU-issue-bound, div costs ~14 op-equivalents on v5e
(``microbench_div.py``) while mul/add/select cost ~1, so the weighted
total predicts kernel throughput shifts from pure code changes without a
chip (used during the round-2 tunnel outage to size the TL strength
reduction before it could be measured).

Run: ``JAX_PLATFORMS=cpu python benchmarks/opcount.py``
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from cloudsc2_tpu import make_constants
from cloudsc2_tpu.physics.nonlinear import NLCarry, nl_level
from cloudsc2_tpu.physics.tangent_linear import TLCarry, tl_level

from cloudsc2_tpu.utils.opcensus import WEIGHTS, census  # noqa: E402,F401

#: folded stream names plus the raw fields (both provided so the census
#: also runs against pre-fold revisions of the level bodies; each revision
#: reads only its own set, the other keys are inert dict entries)
NL_INPUTS = (
    "ap", "dp", "lu_next", "lude", "mfd", "mfu", "q2", "ql_fg", "qi_fg",
    "qsat", "t_fg",
    "q", "ql", "qi", "supsat", "tnd_cml_q", "tnd_cml_ql", "tnd_cml_qi",
)
TL_EXTRA = (
    "ap_i", "dp_i", "lu_next_i", "lude_i", "mfd_i", "mfu_i",
    "q2_i", "ql_fg_i", "qi_fg_i", "qsat_i", "t_fg_i",
    "q_i", "ql_i", "qi_i", "supsat_i", "t_i",
    "tnd_cml_q_i", "tnd_cml_ql_i", "tnd_cml_qi_i", "tnd_cml_t_i",
)


def report(name, counts):
    total = sum(counts.values())
    weighted = sum(WEIGHTS.get(k, 1.0) * v for k, v in counts.items())
    hot = {k: counts[k] for k in
           ("div", "exp", "tanh", "sqrt", "rsqrt", "mul", "add", "sub",
            "select_n", "max", "min", "lt", "gt", "ge", "le")
           if counts.get(k)}
    print(json.dumps({"body": name, "primitives": total,
                      "weighted_op_equivalents": round(weighted, 1),
                      "hot": hot}))


def main():
    c = make_constants(lphylin=True, ldrain1d=False)
    dt = 600.0
    n = 8
    col = jnp.ones((n,), jnp.float32)
    x = {k: col for k in NL_INPUTS}
    x["eta"] = jnp.float32(0.5)
    x["scalm"] = jnp.float32(0.1)
    carry3 = NLCarry(col, col, col)

    report("nl_level", census(
        lambda carry, xx: nl_level(carry, xx, col, col, dt, c)[:2], (carry3, x)
    ))

    xt = dict(x)
    xt.update({k: col for k in TL_EXTRA})
    carry6 = TLCarry(col, col, col, col, col, col)
    report("tl_level", census(
        lambda carry, xx: tl_level(carry, xx, col, col, col, dt, c), (carry6, xt)
    ))

    # the AD reverse body: vjp of tl_level in its perturbation arguments
    # (as pallas/adjoint.py builds it)
    def ad_body(ci, seeds):
        def lin(ci_, xi):
            carry = TLCarry(col, col, col, *ci_)
            carry_out, outs = tl_level(
                carry, {**x, **xi}, col, jnp.zeros_like(col), col, dt, c
            )
            return ((carry_out.rfl_i, carry_out.sfl_i, carry_out.covptot_i),
                    tuple(outs[k] for k in ("tnd_t_i", "tnd_q_i", "tnd_ql_i",
                                            "tnd_qi_i", "clc_i", "covptot_i",
                                            "fplsl_i", "fplsn_i")))
        z = jnp.zeros_like(col)
        zi = {k: z for k in TL_EXTRA}
        _, vjp = jax.vjp(lin, ci, zi)
        return vjp(seeds)

    z = jnp.zeros_like(col)
    seeds = ((z, z, z), tuple(z for _ in range(8)))
    report("ad_reverse (vjp of tl_level)", census(ad_body, ((z, z, z), seeds)))


if __name__ == "__main__":
    main()
