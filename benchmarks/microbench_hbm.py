"""Raw HBM read bandwidth: the physics kernels' two fetch patterns.

VERDICT r4 next #1 asks whether the large-batch falloff (effective HBM
~320 GB/s at 4k resident columns -> ~155 GB/s at 65k) is STRIDE-driven
(the global ``(nlev, 8, w)`` layout fetches 2 KB segments strided 32 KB at
65k, but is incidentally contiguous at 4k where w == wb) or
FOOTPRINT-driven (bytes touched per step).  This strips the physics out:
a Pallas kernel with the exact level-scan grid/BlockSpecs that only sums
each block into an (8, wb) accumulator (~kb vector adds per element-row —
negligible against memory), over S independent input streams.

Patterns:
* ``global``: array ``(nlev, 8, w)``, block ``(kb, 8, wb)`` at ``(k,0,j)``
  (the shipped kernels' layout)
* ``tile``: array ``(nj, nlev, 8, wb)``, block ``(1, kb, 8, wb)`` at
  ``(j,k,0,0)`` (tile-contiguous: one burst per block)

The crossing tells the story: stride-driven -> tile >> global at 65k and
tile(65k) ~= global(4k); footprint-driven -> both fall together as ncols
(or S) grows.

Usage: python benchmarks/microbench_hbm.py [lg2_ncols ...] (default 12 16)
Env: HBM_STREAMS (default 10 ~ the NL kernel's input stream count)
"""
import json, math, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NLEV = 137
KB = 16
WB = 512
S = int(os.environ.get("HBM_STREAMS", "10"))
LONG, SHORT = 32, 4


def make_reader(ncols, tile):
    w = ncols // 8
    nj = w // WB
    nkb = math.ceil(NLEV / KB)

    def kernel(*refs):
        seq_ref = refs[0]
        ins = refs[1 : 1 + S]
        out = refs[1 + S]
        acc = refs[-1]
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            acc[...] = jnp.full_like(acc, seq_ref[0])

        s = acc[...]
        for r in ins:
            blk = r[0] if tile else r[...]
            s = s + jnp.sum(blk, axis=0)
        acc[...] = s

        @pl.when(t == nkb - 1)
        def _fin():
            out[...] = acc[...]

    if tile:
        in_spec = pl.BlockSpec((1, KB, 8, WB), lambda j, k: (j, k, 0, 0),
                               memory_space=pltpu.VMEM)
        shape = (nj, NLEV, 8, WB)
    else:
        in_spec = pl.BlockSpec((KB, 8, WB), lambda j, k: (k, 0, j),
                               memory_space=pltpu.VMEM)
        shape = (NLEV, 8, w)
    out_spec = pl.BlockSpec((8, WB), lambda j, k: (0, j), memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        grid=(nj, nkb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [in_spec] * S,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((8, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, WB), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
    )
    return call, shape


@partial(jax.jit, static_argnames=("n", "ncols", "tile"))
def chain(streams, n, ncols, tile):
    call, _shape = make_reader(ncols, tile)

    def body(i, tot):
        # the per-iteration SMEM scalar keeps the call loop-variant (no
        # hoist); its cost is one SMEM word
        o = call(jnp.full((1,), i, jnp.float32), *streams)
        return tot + o[0, 0]

    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))


def run(ncols, tile):
    _call, shape = make_reader(ncols, tile)
    key = jax.random.PRNGKey(0)
    streams = [
        jax.random.uniform(jax.random.fold_in(key, i), shape, jnp.float32)
        for i in range(S)
    ]
    float(chain(streams, SHORT, ncols, tile))
    float(chain(streams, LONG, ncols, tile))
    per = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(chain(streams, SHORT, ncols, tile))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chain(streams, LONG, ncols, tile))
        tl = time.perf_counter() - t0
        per.append((tl - ts) / (LONG - SHORT))
    med = sorted(per)[len(per) // 2]
    gbytes = S * NLEV * ncols * 4 / 1e9
    print(json.dumps({
        "ncols": ncols, "tile": tile, "streams": S,
        "step_bytes_gb": round(gbytes, 3), "per_step_ms": round(med * 1e3, 3),
        "read_gb_per_s": round(gbytes / med, 1),
    }), flush=True)


SIZES = [int(a) for a in sys.argv[1:]] or [12, 16]
for lg in SIZES:
    for tile in (False, True):
        try:
            run(1 << lg, tile)
        except Exception as e:
            print(json.dumps({"ncols": 1 << lg, "tile": tile,
                              "error": str(e)[:200]}), flush=True)
