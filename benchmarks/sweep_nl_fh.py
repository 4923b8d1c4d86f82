"""Measure the merged NL kernel after moving fhpsl/fhpsn out of the kernel
(two fewer output streams, 72 MB less HBM write per step) and the effect of
column count on throughput.  Timed unit = saturation + NL (bench.py's)."""
import time, json
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

NLEV = 137
LONG, SHORT = 32, 4
ROUNDS = 5

c = make_constants(lphylin=True, ldrain1d=False)


def make_state(ncols):
    _, s, dt = iox.synthesize_input(ncols=4096, nlev=NLEV, seed=0, dtype=np.float32)
    reps = ncols // 4096
    state = {
        k: (jnp.tile(jnp.asarray(v, jnp.float32), (1, reps)) if v.ndim == 2 else jnp.asarray(v, jnp.float32))
        for k, v in s.items()
    }
    state["eta"] = eta_levels(state["ap"], state["aph"])
    state["qsat"] = saturation(state["ap"], state["t"], kflag=1, lphylin=True, c=c)
    return state, dt


@partial(jax.jit, static_argnames=("n", "dt"))
def chain(state, n, dt):
    def body(_, st):
        st = dict(st)
        st["qsat"] = saturation(st["ap"], st["t"], kflag=1, lphylin=True, c=c)
        tends, _d = cloudsc2_nl_pallas(st, dt, c)
        st["t"] = st["t"] + jnp.asarray(1e-30, st["t"].dtype) * tends["t"]
        return st

    return jax.lax.fori_loop(0, n, body, dict(state))["t"]


def fetch(x):
    return float(jnp.sum(x[0]))


jobs = []
for ncols in (1 << 16, 1 << 17):
    state, dt = make_state(ncols)
    t0 = time.time()
    fetch(chain(state, SHORT, dt)); fetch(chain(state, LONG, dt))
    print(json.dumps({"ncols": ncols, "compile_s": round(time.time() - t0, 1)}), flush=True)
    jobs.append((ncols, state, dt, []))

for _ in range(ROUNDS):
    for ncols, state, dt, samples in jobs:
        t0 = time.perf_counter(); fetch(chain(state, SHORT, dt)); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); fetch(chain(state, LONG, dt)); tl = time.perf_counter() - t0
        samples.append((tl - ts) / (LONG - SHORT))

for ncols, state, dt, samples in jobs:
    per = sorted(samples)[len(samples) // 2]
    print(json.dumps({
        "ncols": ncols, "per_step_ms": round(per * 1e3, 3),
        "cols_per_sec": round(ncols / per),
    }), flush=True)
