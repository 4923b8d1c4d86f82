"""Divide-strategy microbench INSIDE a Mosaic kernel on the attached TPU.

The XLA-fusion microbench (``microbench_ops.py``) showed divide ~14
mul-equivalents and exp only ~3 — so the ~18 divides per level-column, not
the transcendentals, dominate the CLOUDSC2 kernel op budget.  This bench
measures, inside a real Pallas kernel, the per-op cost of:

* ``div``      — plain ``a / b`` (Mosaic's native lowering)
* ``rcp``      — ``pl.reciprocal(b, approx=False)`` * a
* ``rcpx``     — ``pl.reciprocal(b, approx=True)`` * a  (no refinement)
* ``rcpx1``    — approx + 1 Newton step  (~1e-5 rel: NOT faithful for f32)
* ``rcpx2``    — approx + 2 Newton steps (~1 ulp: faithful)

plus each variant's max relative error against f64 NumPy.  The result gates
``cloudsc2_tpu.physics.fastmath.rcp`` (the divide strategy used by the f32
Pallas kernels).

Timing: chain-difference between LONG and SHORT in-kernel serial
applications (cancels dispatch + tunnel latency), REPS outer grid steps.
"""
import json
import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

ROWS, COLS = 137, 65536
BLOCK_COLS = 2048
LONG, SHORT = 96, 16
REPS = 64


def _nr(b, r, steps):
    for _ in range(steps):
        r = r * (2.0 - b * r)
    return r


VARIANTS = {
    # each step maps x -> 1.25/(x+1.0): a logistic-like bounded chain the
    # simplifier cannot collapse (matches microbench_ops.py's "div" row)
    "div": lambda x: 1.25 / (x + 1.0),
    "rcp": lambda x: 1.25 * pl.reciprocal(x + 1.0, approx=False),
    "rcpx": lambda x: 1.25 * pl.reciprocal(x + 1.0, approx=True),
    "rcpx1": lambda x: 1.25 * _nr(x + 1.0, pl.reciprocal(x + 1.0, approx=True), 1),
    "rcpx2": lambda x: 1.25 * _nr(x + 1.0, pl.reciprocal(x + 1.0, approx=True), 2),
}


def make_chain(name, n):
    op = VARIANTS[name]

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        for _ in range(n):
            x = op(x)
        o_ref[...] = x

    call = pl.pallas_call(
        kernel,
        grid=(COLS // BLOCK_COLS,),
        in_specs=[pl.BlockSpec((ROWS, BLOCK_COLS), lambda i: (0, i))],
        out_specs=pl.BlockSpec((ROWS, BLOCK_COLS), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((ROWS, COLS), jnp.float32),
    )

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, REPS, lambda _, v: call(v), x)

    return run


def fetch(x):
    return float(x[0, 0])


def main():
    x0 = jnp.full((ROWS, COLS), 1.2345, jnp.float32)
    nelem = ROWS * COLS

    # accuracy first: one application on a wide operand range
    rng = np.random.default_rng(0)
    xs = jnp.asarray(
        np.concatenate([
            rng.uniform(1e-6, 1.0, COLS // 2),
            rng.uniform(1.0, 1e6, COLS // 2),
        ]).astype(np.float32).reshape(1, COLS).repeat(ROWS, 0)
    )
    ref = 1.25 / (np.asarray(xs[0], np.float64) + 1.0)
    for name in VARIANTS:
        run = make_chain(name, 1)
        got = np.asarray(jax.jit(lambda v: run(v))(xs)[0], np.float64)
        # one run() applies the op REPS times; recompute the reference chain
        r = np.asarray(xs[0], np.float64)
        for _ in range(REPS):
            r = 1.25 / (r + 1.0)
        rel = np.abs(got - r) / np.abs(r)
        print(json.dumps({"variant": name, "chain_rel_err": float(rel.max())}),
              flush=True)

    base = None
    for name in VARIANTS:
        short = make_chain(name, SHORT)
        long_ = make_chain(name, LONG)
        fetch(short(x0))
        fetch(long_(x0))
        samples = []
        for _ in range(3):
            t0 = time.perf_counter(); fetch(short(x0)); ts = time.perf_counter() - t0
            t0 = time.perf_counter(); fetch(long_(x0)); tl = time.perf_counter() - t0
            per = (tl - ts) / (LONG - SHORT) / REPS
            samples.append(per)
        best_val = sorted(samples)[len(samples) // 2]  # median: min() is noise-biased
        ns = best_val / nelem * 1e9
        if base is None:
            base = ns
        print(json.dumps({"variant": name, "ns_per_elem": round(ns, 5),
                          "vs_div": round(ns / base, 3),
                          "t_short_ms": round(ts * 1e3, 2),
                          "t_long_ms": round(tl * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
