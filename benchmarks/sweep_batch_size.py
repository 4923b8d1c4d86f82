"""Throughput vs resident column count (round 4): the forward step's
per-column rate falls monotonically as the working set widens (23.4M
cols/s at 4,096 columns -> 18.2M at 65,536 -> 10.8M at 262,144 on v5e),
and a chunked-call A/B (16 x 4,096-col pallas_calls inside one jit vs one
65,536-col call) is FLAT at 17.4-18.3M — so the effect tracks the total
HBM-resident state, not the kernel's grid width, and cannot be recovered
by call chunking.  Consequence for pods: sharding columns thinner RAISES
per-chip rate (super-linear column-throughput scaling into the ~8k-col
regime).  Chain lengths are sized so every LONG chain is >= ~180 ms (the
short-chain slopes at small sizes are tunnel-noise-dominated: a 5-sample
short-chain run once read 42M cols/s at 8,192 columns).
"""
import time, json, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from functools import partial
from cloudsc2_tpu import iox, make_constants
from cloudsc2_tpu.parallel.step import forward_step
from cloudsc2_tpu.physics.diagnostics import eta_levels

c = make_constants(lphylin=True, ldrain1d=False)
_, s, dt = iox.synthesize_input(ncols=4096, nlev=137, seed=0, dtype=np.float32)
base = {k: jnp.asarray(v, jnp.float32) for k, v in s.items()}

@partial(jax.jit, static_argnames=("n",))
def chain(state, n):
    def body(_, st):
        tends, _d = forward_step(st, dt, c)
        st = dict(st)
        st["t"] = st["t"] + jnp.asarray(1e-30, st["t"].dtype) * tends["t"]
        return st
    return jax.lax.fori_loop(0, n, body, dict(state))["t"]

def fetch(x):
    return float(jnp.sum(x[0]))

# chain lengths sized so the LONG chain is >= ~180 ms at every size
CFG = {4096: (1024, 128), 8192: (1024, 128), 16384: (512, 64),
       32768: (256, 32), 65536: (64, 8)}
SAMPLES = 7
states = {}
for nc, (L, S) in CFG.items():
    reps = nc // 4096
    st = {k: (jnp.tile(v, (1, reps)) if v.ndim == 2 else v) for k, v in base.items()}
    st["eta"] = eta_levels(st["ap"], st["aph"])
    states[nc] = st
    fetch(chain(st, S)); fetch(chain(st, L))
per = {nc: [] for nc in CFG}
for _ in range(SAMPLES):
    for nc, (L, S) in CFG.items():
        t0 = time.perf_counter(); fetch(chain(states[nc], S)); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); fetch(chain(states[nc], L)); tl = time.perf_counter() - t0
        per[nc].append((tl - ts) / (L - S))
for nc in CFG:
    med = sorted(per[nc])[len(per[nc]) // 2]
    print(json.dumps({"ncols": nc, "per_step_ms": med * 1e3,
                      "cols_per_sec": nc / med}), flush=True)
