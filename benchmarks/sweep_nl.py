"""Sweep KB/WB/unroll for the NL Pallas kernel on a TPU.

Measured on v5e (65,536 cols x 137 levels, f32), round-2 final (post
stream-folding + strength reduction): kb=16/wb=512/unroll=2 (default)
18.82M cols/s; 24/512/2 18.61M; 8/512/2 18.44M; 8/1024/2 18.43M;
16/512/1 18.22M; 16/256/2 17.79M.  kb=24 now compiles (the stream folding
freed VMEM) but does not beat the default; kb=32 still crashes the remote
Mosaic compiler, with or without unroll.  Pre-folding round-1 numbers:
all variants within 1% of 15.7M.
Run with PYTHONPATH set so the package resolves: see benchmarks/README.md.
"""
import time, json, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from functools import partial
from cloudsc2_tpu import iox, make_constants
from cloudsc2_tpu.physics.diagnostics import eta_levels
from cloudsc2_tpu.physics.saturation import saturation
from cloudsc2_tpu.pallas.nonlinear import cloudsc2_nl_pallas

NCOLS = 1 << 16
NLEV = 137
LONG, SHORT = 32, 4

_, s, dt = iox.synthesize_input(ncols=4096, nlev=NLEV, seed=0, dtype=np.float32)
reps = NCOLS // 4096
state = {
    k: (jnp.tile(jnp.asarray(v, jnp.float32), (1, reps)) if v.ndim == 2 else jnp.asarray(v, jnp.float32))
    for k, v in s.items()
}
c = make_constants(lphylin=True, ldrain1d=False)
state["eta"] = eta_levels(state["ap"], state["aph"])
state["qsat"] = saturation(state["ap"], state["t"], kflag=1, lphylin=True, c=c)


@partial(jax.jit, static_argnames=("n", "kb", "wb", "unroll"))
def chain(state, n, kb, wb, unroll):
    def body(_, st):
        tends, _d = cloudsc2_nl_pallas(st, dt, c, kb=kb, wb=wb, unroll=unroll)
        st = dict(st)
        st["t"] = st["t"] + jnp.asarray(1e-30, st["t"].dtype) * tends["t"]
        return st

    return jax.lax.fori_loop(0, n, body, dict(state))["t"]


def fetch(x):
    return float(jnp.sum(x[0]))


VARIANTS = [
    (16, 512, 1),   # default
    (16, 512, 2),
    (16, 512, 8),
    (8, 512, 1),
    # lane-width sweep: a level slice is an (8, wb) tile = wb/128 vregs per
    # op; wider tiles give the scheduler more independent vregs per op to
    # hide VPU latency (the kernel runs ~2.5x above its op-budget estimate,
    # pointing at dependency stalls, not op count)
    (8, 1024, 1),
    (4, 1024, 1),
    (4, 2048, 1),
    (16, 256, 1),
    (8, 256, 1),
]



if len(sys.argv) > 1:  # CLI combos "kb,wb,unroll"; interleaved sampling
    VARIANTS = [tuple(int(x) for x in t.split(",")) for t in sys.argv[1:]]
SAMPLES = int(os.environ.get("SWEEP_SAMPLES", "5"))

live = []
for cfg in VARIANTS:
    try:
        t0 = time.time()
        fetch(chain(state, SHORT, *cfg))
        fetch(chain(state, LONG, *cfg))
        print(json.dumps({"cfg": cfg, "compile_s": time.time() - t0}), flush=True)
        live.append(cfg)
    except Exception as e:
        print(json.dumps({"cfg": cfg, "error": str(e)[:200]}), flush=True)

per = {cfg: [] for cfg in live}
for _ in range(SAMPLES):
    for cfg in live:  # interleaved: tunnel drift hits all combos equally
        t0 = time.perf_counter()
        fetch(chain(state, SHORT, *cfg))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        fetch(chain(state, LONG, *cfg))
        tl = time.perf_counter() - t0
        per[cfg].append((tl - ts) / (LONG - SHORT))
for cfg in live:
    med = sorted(per[cfg])[len(per[cfg]) // 2]  # median: min() is noise-biased
    print(json.dumps({
        "cfg": cfg, "per_step_ms": med * 1e3, "cols_per_sec": NCOLS / med,
    }), flush=True)
