"""Sweep KB/WB for the TL Pallas kernel on a TPU.

Measured on v5e (round-2 final, post strength-reduction + stream folding):
kb=8/wb=512 (default) 9.42M cols/s; 16/256 9.31M; 8/256 9.35M; 4/512 9.05M.
(Pre-reduction round-1 numbers: 8/256 8.78M; 16/256 8.67M; 8/512 8.53M.)
"""
import time, json, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from functools import partial
from cloudsc2_tpu import iox, make_constants
from cloudsc2_tpu.physics.diagnostics import eta_levels
from cloudsc2_tpu.physics.saturation import saturation
from cloudsc2_tpu.physics.increment import state_increment
from cloudsc2_tpu.pallas.tangent_linear import cloudsc2_tl_pallas

NCOLS = 1 << 16
NLEV = 137
LONG, SHORT = 24, 4

_, s, dt = iox.synthesize_input(ncols=4096, nlev=NLEV, seed=0, dtype=np.float32)
reps = NCOLS // 4096
state = {k: (jnp.tile(jnp.asarray(v, jnp.float32), (1, reps)) if v.ndim == 2 else jnp.asarray(v, jnp.float32)) for k, v in s.items()}
c = make_constants(lphylin=True, ldrain1d=False)
state["eta"] = eta_levels(state["ap"], state["aph"])
state["qsat"] = saturation(state["ap"], state["t"], kflag=1, lphylin=True, c=c)
state.update(state_increment(state, 0.01))

@partial(jax.jit, static_argnames=("n", "kb", "wb", "unroll"))
def chain(state, n, kb, wb, unroll):
    def body(_, st):
        tends, _d = cloudsc2_tl_pallas(st, dt, c, kb=kb, wb=wb, unroll=unroll)
        st = dict(st)
        st["t"] = st["t"] + jnp.asarray(1e-30, st["t"].dtype) * tends["t"]
        return st
    return jax.lax.fori_loop(0, n, body, dict(state))["t"]

def fetch(x):
    return float(jnp.sum(x[0]))



COMBOS = (
    [tuple(int(x) for x in t.split(",")) for t in sys.argv[1:]]
    if len(sys.argv) > 1
    else [(16, 256, 2), (8, 512, 2), (8, 256, 2), (4, 512, 2)]
)
SAMPLES = int(os.environ.get("SWEEP_SAMPLES", "5"))

live = []
for cfg in COMBOS:
    try:
        t0 = time.time()
        fetch(chain(state, SHORT, *cfg)); fetch(chain(state, LONG, *cfg))
        print(json.dumps({"cfg": cfg, "compile_s": time.time() - t0}), flush=True)
        live.append(cfg)
    except Exception as e:
        print(json.dumps({"cfg": cfg, "error": str(e)[:160]}), flush=True)

per = {cfg: [] for cfg in live}
for _ in range(SAMPLES):
    for cfg in live:  # interleaved: tunnel drift hits all combos equally
        t0 = time.perf_counter(); fetch(chain(state, SHORT, *cfg)); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); fetch(chain(state, LONG, *cfg)); tl = time.perf_counter() - t0
        per[cfg].append((tl - ts) / (LONG - SHORT))
for cfg in live:
    med = sorted(per[cfg])[len(per[cfg]) // 2]  # median: min() is noise-biased
    print(json.dumps({"cfg": cfg, "per_step_ms": med*1e3,
                      "cols_per_sec": NCOLS/med}), flush=True)
