"""Sweep KB/WB for the AD (fwd trajectory + reverse transpose) kernels.

Measured on v5e (round-2 final, post strength-reduction + stream folding):
kb=8/wb=512 (default) 9.03M cols/s; 16/256 8.84M; 8/256 8.72M.
NOTE the two chain-timing pitfalls documented in the step dependence
comment below and in CLAUDE.md.
"""
import time, json
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
from cloudsc2_tpu.pallas.adjoint import cloudsc2_ad_pallas
from cloudsc2_tpu.validation.symmetry import DIAG_NAMES, TEND_NAMES

NCOLS = 1 << 16
NLEV = 137
LONG, SHORT = 32, 4

_, s, dt = iox.synthesize_input(ncols=4096, nlev=NLEV, seed=0, dtype=np.float32)
reps = NCOLS // 4096
state = {k: (jnp.tile(jnp.asarray(v, jnp.float32), (1, reps)) if v.ndim == 2 else jnp.asarray(v, jnp.float32)) for k, v in s.items()}
c = make_constants(lphylin=True, ldrain1d=False)
state["eta"] = eta_levels(state["ap"], state["aph"])
state["qsat"] = saturation(state["ap"], state["t"], kflag=1, lphylin=True, c=c)
state.update(state_increment(state, 0.01, ignore_supsat=True))
tt, dd = cloudsc2_tl_pallas(state, dt, c)
for n in TEND_NAMES:
    state["tnd_" + n] = tt[n]
    state["tnd_" + n + "_i"] = tt[n + "_i"]
for n in DIAG_NAMES:
    state[n + "_i"] = dd[n + "_i"]
state = {k: jax.device_put(v) for k, v in state.items()}

@partial(jax.jit, static_argnames=("n", "kb", "wb"))
def chain(state, n, kb, wb):
    def body(_, st):
        tends, _d = cloudsc2_ad_pallas(st, dt, c, kb=kb, wb=wb)
        st = dict(st)
        # depend on a REVERSE-kernel output (cml_t_i cotangent): depending
        # only on the forward tendency lets XLA DCE the whole reverse kernel
        st["t"] = st["t"] + jnp.asarray(1e-30, st["t"].dtype) * tends["cml_t_i"]
        return st
    return jax.lax.fori_loop(0, n, body, dict(state))["t"]

def fetch(x):
    return float(jnp.sum(x[0]))

for kb, wb in [(16, 256), (8, 256), (8, 512)]:
    try:
        t0 = time.time()
        fetch(chain(state, SHORT, kb, wb)); fetch(chain(state, LONG, kb, wb))
        compile_s = time.time() - t0
        samples = []
        for _ in range(3):
            t0 = time.perf_counter(); fetch(chain(state, SHORT, kb, wb)); ts = time.perf_counter() - t0
            t0 = time.perf_counter(); fetch(chain(state, LONG, kb, wb)); tl = time.perf_counter() - t0
            per = (tl - ts) / (LONG - SHORT)
            samples.append(per)
        best_val = sorted(samples)[len(samples) // 2]  # median: min() is noise-biased
        print(json.dumps({"kb": kb, "wb": wb, "per_step_ms": best_val*1e3,
                          "cols_per_sec": NCOLS/best_val, "compile_s": compile_s}), flush=True)
    except Exception as e:
        print(json.dumps({"kb": kb, "wb": wb, "error": str(e)[:160]}), flush=True)
