"""Software-pipelined NL kernel A/B (round 4): phase A of level k+1
computed in the same loop body as phase B of level k (`pipeline=True`,
levelscan `pre_row`).  The serial-roofline bracketing motivates this: the
kernel runs at 0.60 of the zero-overlap body-chain ceiling but only 0.30
of the perfect-overlap carry-chain ceiling — if the explicit pipeline lets
phase A's issue fill phase B's chain stalls, the recurrence shrinks to the
carry chain and up to ~2x is on the table.

Variants: (kb, wb, unroll, pipeline).  unroll must be 1 or >= kb with
pipeline.  Same-process interleaved sampling, median over SWEEP_SAMPLES.
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


@partial(jax.jit, static_argnames=("n", "kb", "wb", "unroll", "pipeline"))
def chain(state, n, kb, wb, unroll, pipeline):
    def body(_, st):
        tends, _d = cloudsc2_nl_pallas(
            st, dt, c, kb=kb, wb=wb, unroll=unroll, pipeline=bool(pipeline)
        )
        st = dict(st)
        st["t"] = st["t"] + jnp.asarray(1e-30, st["t"].dtype) * tends["t"]
        return st

    return jax.lax.fori_loop(0, n, body, dict(state))["t"]


def fetch(x):
    return float(jnp.sum(x[0]))


VARIANTS = [
    (16, 512, 2, 0),   # round-4 default (baseline)
    (16, 512, 1, 1),   # rolled pipeline at the default tile
    (16, 256, 1, 1),   # narrower lanes (more VMEM headroom for carried pre)
    (8, 512, 1, 1),
    (10, 512, 1, 1),
    (8, 512, 99, 1),   # fully-unrolled pipeline (static rows)
    (16, 512, 1, 0),   # rolled non-pipelined control (isolates the lever)
]


if len(sys.argv) > 1:  # CLI combos "kb,wb,unroll,pipeline"
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
