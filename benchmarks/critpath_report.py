"""Report the weighted critical path through one nl_level / tl_level body
(VERDICT r3 item 1/8): walks the jaxpr DAG with the opcensus weights and
prints the longest dependent chain as a primitive sequence, plus the top
chain segments by weight — the worklist for chain-shortening rewrites.

NOTE: unlike ``opcensus.critical_path`` this walker is FLAT — a call-like
equation (e.g. the ``jit[_where]`` selects) counts as one weight-1 link
instead of recursing.  For the level bodies the only sub-jaxprs are
single-select ``_where`` wrappers (depth 1 either way), so the depths
agree with the census; treat any future divergence as a sign a deeper
sub-jaxpr appeared.  The census, not this report, is the source of truth.

CPU-only (pure tracing); run: python benchmarks/critpath_report.py [tl|ad]
"""
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from cloudsc2_tpu import make_constants
from cloudsc2_tpu.utils.opcensus import NON_ISSUING, WEIGHTS


def longest_chain(fn, args, carry_only=False, carry_in=0, carry_out=0):
    """Return the longest weighted path as a list of (prim, weight, eqn_repr)."""
    jaxpr = jax.make_jaxpr(fn)(*args).jaxpr
    neg = float("-inf")
    depth = {}
    parent = {}  # var -> (eqn, producing depth)

    def read(v):
        if isinstance(v, jax.extend.core.Literal):
            return neg if carry_only else 0.0, None
        return depth.get(v, (neg if carry_only else 0.0, None))

    n_in = len(jaxpr.invars)
    for i, var in enumerate(jaxpr.invars):
        seed = 0.0 if (not carry_only or i < carry_in) else neg
        depth[var] = (seed, None)
    for eqn in jaxpr.eqns:
        dins = [read(v) for v in eqn.invars]
        base, src = max(dins, key=lambda t: t[0]) if dins else (0.0, None)
        name = eqn.primitive.name
        w = 0.0 if name in NON_ISSUING else WEIGHTS.get(name, 1.0)
        d = base + w
        for ov in eqn.outvars:
            depth[ov] = (d, (eqn, src, w))
    outs = jaxpr.outvars[:carry_out] if (carry_only and carry_out) else jaxpr.outvars
    best_var = max(outs, key=lambda v: read(v)[0])
    d, node = read(best_var)
    chain = []
    while node is not None:
        eqn, src, w = node
        chain.append((eqn.primitive.name, w, str(eqn)[:100]))
        # src is the (eqn, src, w) node of the max-depth input's producer
        node = src
    chain.reverse()
    return d, chain


def main():
    c = make_constants(lphylin=True, ldrain1d=False)
    dt = 1800.0
    col = jnp.ones((8,), jnp.float32)
    which = sys.argv[1] if len(sys.argv) > 1 else "nl"
    if which == "nl":
        from cloudsc2_tpu.physics.nonlinear import NLCarry, nl_level

        x = {k: col for k in (
            "ap", "dp", "lu_next", "lude", "mfd", "mfu", "q2", "ql_fg",
            "qi_fg", "qsat", "t_fg", "crh_rh2", "crh_deta1", "crh_rsq",
        )}
        x["eta"] = jnp.float32(0.5)
        x["scalm"] = jnp.float32(0.1)
        carry = NLCarry(col, col, col)
        fn = lambda cr, xx: nl_level(cr, xx, col, col, dt, c)[:2]  # noqa: E731
        args = (carry, x)
        n_carry_in, n_carry_out = 3, 3
    else:
        raise SystemExit(f"unknown body {which!r} (only 'nl' wired so far)")

    for label, carry_only in (("body (all inputs at t=0)", False),
                              ("carry-to-carry recurrence", True)):
        d, chain = longest_chain(
            fn, args, carry_only=carry_only, carry_in=n_carry_in,
            carry_out=n_carry_out,
        )
        hist = collections.Counter(p for p, _w, _e in chain)
        wsum = collections.Counter()
        for p, w, _e in chain:
            wsum[p] += w
        print(f"=== {label}: depth {d:.0f} weighted ops, {len(chain)} links ===")
        print("  by primitive (count, weight-sum):")
        for p, n in hist.most_common():
            print(f"    {p:<18} x{n:<4} {wsum[p]:.0f}")
        print("  chain (first 80 links):")
        for p, w, e in chain[:80]:
            print(f"    [{w:>4.0f}] {e}")
        print()


if __name__ == "__main__":
    main()
