"""A/B the AD forward-sweep level-block height: the reverse kernel is
VMEM-bound at kb=8, but the forward trajectory is the NL kernel whose
measured-best is kb=16 — the tiles are independent knobs."""
import time, json
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from functools import partial
from cloudsc2_tpu import iox, make_constants
from cloudsc2_tpu.physics.diagnostics import eta_levels
from cloudsc2_tpu.physics.increment import state_increment
from cloudsc2_tpu.physics.saturation import saturation
from cloudsc2_tpu.pallas.adjoint import cloudsc2_ad_pallas
from cloudsc2_tpu.pallas.tangent_linear import cloudsc2_tl_pallas
from cloudsc2_tpu.validation.symmetry import DIAG_NAMES, TEND_NAMES

NCOLS = 1 << 16
NLEV = 137
LONG, SHORT = 32, 4
ROUNDS = 5

_, s_np, dt = iox.synthesize_input(ncols=4096, nlev=NLEV, seed=0, dtype=np.float32)
reps = NCOLS // 4096
s = {
    k: (jnp.tile(jnp.asarray(v, jnp.float32), (1, reps)) if v.ndim == 2 else jnp.asarray(v, jnp.float32))
    for k, v in s_np.items()
}
c = make_constants(lphylin=True, ldrain1d=False)
s["eta"] = eta_levels(s["ap"], s["aph"])
s["qsat"] = saturation(s["ap"], s["t"], kflag=1, lphylin=True, c=c)
s.update(state_increment(s, 0.01, ignore_supsat=True))
tends_tl, diags_tl = cloudsc2_tl_pallas(s, dt, c)
for name in TEND_NAMES:
    s["tnd_" + name] = tends_tl[name]
    s["tnd_" + name + "_i"] = tends_tl[name + "_i"]
for name in DIAG_NAMES:
    s[name + "_i"] = diags_tl[name + "_i"]


@partial(jax.jit, static_argnames=("n", "fwd_kb"))
def chain(state, n, fwd_kb):
    def body(_, st):
        tends, diags = cloudsc2_ad_pallas(st, dt, c, fwd_kb=fwd_kb)
        st = dict(st)
        eps = jnp.asarray(1e-30, st["t"].dtype)
        st["t"] = st["t"] + eps * tends["t"] + eps * diags["t_i"]
        return st

    return jax.lax.fori_loop(0, n, body, dict(state))["t"]


def fetch(x):
    return float(jnp.sum(x[0]))


jobs = []
for fwd_kb in (8, 16):
    t0 = time.time()
    fetch(chain(s, SHORT, fwd_kb)); fetch(chain(s, LONG, fwd_kb))
    print(json.dumps({"fwd_kb": fwd_kb, "compile_s": round(time.time() - t0, 1)}), flush=True)
    jobs.append((fwd_kb, []))

for _ in range(ROUNDS):
    for fwd_kb, samples in jobs:
        t0 = time.perf_counter(); fetch(chain(s, SHORT, fwd_kb)); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); fetch(chain(s, LONG, fwd_kb)); tl = time.perf_counter() - t0
        samples.append((tl - ts) / (LONG - SHORT))

for fwd_kb, samples in jobs:
    per = sorted(samples)[len(samples) // 2]
    print(json.dumps({
        "fwd_kb": fwd_kb, "per_step_ms": round(per * 1e3, 3),
        "cols_per_sec": round(NCOLS / per),
    }), flush=True)
