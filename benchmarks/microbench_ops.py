"""Per-op VPU throughput on the attached TPU: add/mul/div/sqrt/exp/tanh/log.

Method: apply the op N times SERIALLY UNROLLED inside one jitted function —
XLA fuses the whole chain into a single kernel, so HBM is touched once and
the chain cost is N dependent ops per element.  The slope between N=192 and
N=32 gives ns/op/element net of the single memory round trip and dispatch.
(A fori_loop chain does NOT work for this: every iteration is its own
HBM-bound kernel execution, and all ops measure identical — the bandwidth,
not the op.)
"""
import json
import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

SHAPE = (137, 65536)
LONG, SHORT = 96, 16
REPS = 64  # outer fori_loop repeats of the fused chain to swamp tunnel noise

OPS = {
    # every step must be algebraically UNFOLDABLE: an affine chain like
    # x+c or x*c composes into a single op and XLA's simplifier collapses
    # it (measured: affine chains time as zero ops).  mul2 is the 2-op
    # baseline (sub+mul, logistic map, stays near 1.0 for x0=1.2345).
    "mul2": lambda x: x * (2.0 - x),
    "div": lambda x: 1.25 / (x + 1.0),
    "sqrt": lambda x: jnp.sqrt(x + 1.0),
    "rsqrt": lambda x: jax.lax.rsqrt(x + 1.0),
    "exp": lambda x: jnp.exp(-x) + 1.0,
    "exp2": lambda x: jnp.exp2(-x) + 1.0,
    "tanh": lambda x: jnp.tanh(x) + 1.0,
    "log": lambda x: jnp.log(x + 1.0),
    "pow0.2": lambda x: (x + 1.2) ** 0.2,
    "where": lambda x: jnp.where(x > 1.5, x * 0.5, x) + 0.25,
    "fast_exp": None,  # filled below: the Cody-Waite exp2-based exp
}
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cloudsc2_tpu.physics.fastmath import fast_exp
OPS["fast_exp"] = lambda x: fast_exp(-x) + 1.0


@partial(jax.jit, static_argnames=("name", "n"))
def chain(x, name, n):
    op = OPS[name]

    def body(_, v):
        for _ in range(n):  # unrolled: one fused kernel, n serial ops
            v = op(v)
        return v

    return jax.lax.fori_loop(0, REPS, body, x)


def fetch(x):
    return float(x[0, 0])


def main():
    x0 = jnp.full(SHAPE, 1.2345, jnp.float32)
    nelem = SHAPE[0] * SHAPE[1]
    base = None
    for name in OPS:
        fetch(chain(x0, name, SHORT))
        fetch(chain(x0, name, LONG))
        samples = []
        for _ in range(3):
            t0 = time.perf_counter(); fetch(chain(x0, name, SHORT)); ts = time.perf_counter() - t0
            t0 = time.perf_counter(); fetch(chain(x0, name, LONG)); tl = time.perf_counter() - t0
            per = (tl - ts) / (LONG - SHORT) / REPS
            samples.append(per)
        best_val = sorted(samples)[len(samples)//2]
        ns_per_elem = best_val / nelem * 1e9
        if base is None:
            base = ns_per_elem
        print(json.dumps({"op": name, "ns_per_elem": round(ns_per_elem, 5),
                          "vs_mul2": round(ns_per_elem / base, 2),
                          "t_short_ms": round(ts * 1e3, 2),
                          "t_long_ms": round(tl * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
