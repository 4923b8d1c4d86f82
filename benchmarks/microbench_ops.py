"""Per-op VPU throughput on the attached TPU: add/mul/div/sqrt/exp/tanh/log.

Method: jitted chain x = op(x + eps*i) repeated K times over a (137, 65536)
f32 array; slope between K=64 and K=8 gives ns/op/element net of dispatch.
"""
import time, json
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from functools import partial

SHAPE = (137, 65536)
LONG, SHORT = 256, 32

OPS = {
    "add": lambda x: x + 1.000001,
    "mul": lambda x: x * 1.000001,
    "div": lambda x: 1.000001 / x,
    "sqrt": lambda x: jnp.sqrt(x) + 1.0,
    "rsqrt": lambda x: jax.lax.rsqrt(x) + 1.0,
    "exp": lambda x: jnp.exp(-x) + 1.0,
    "exp2": lambda x: jnp.exp2(-x) + 1.0,
    "tanh": lambda x: jnp.tanh(x) + 1.0,
    "log": lambda x: jnp.log(x) + 1.0,
    "pow2.0": lambda x: (x * 0.5) ** 2.0 + 1.0,
    "pow0.2": lambda x: x ** 0.2 + 1.0,
    "where": lambda x: jnp.where(x > 1.5, x * 0.5, x) + 0.25,
}


@partial(jax.jit, static_argnames=("name", "n"))
def chain(x, name, n):
    op = OPS[name]
    return jax.lax.fori_loop(0, n, lambda i, v: op(v), x)


def fetch(x):
    return float(x[0, 0])


x0 = jnp.full(SHAPE, 1.2345, jnp.float32)
nelem = SHAPE[0] * SHAPE[1]
base = None
for name in OPS:
    fetch(chain(x0, name, SHORT))
    fetch(chain(x0, name, LONG))
    best = None
    for _ in range(3):
        t0 = time.perf_counter(); fetch(chain(x0, name, SHORT)); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); fetch(chain(x0, name, LONG)); tl = time.perf_counter() - t0
        per = (tl - ts) / (LONG - SHORT)
        best = per if best is None else min(best, per)
    ns_per_elem = best / nelem * 1e9
    if base is None:
        base = ns_per_elem
    print(json.dumps({"op": name, "ns_per_elem": round(ns_per_elem, 4),
                      "vs_add": round(ns_per_elem / base, 2)}), flush=True)
