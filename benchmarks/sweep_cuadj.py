"""Same-process A/B: compact (cor-free) vs reference-shaped cuadjtqs for
the NL / TL / AD Pallas kernels (VERDICT r3 item 8 — census-driven op diet).

The compact form (physics/cuadjtqs.py:_nl_iter) removes 4 divides/level
from the kernels (2 per Newton iteration: the shared foeew/ap via the
off-chain rap, and cor by multiplying the condensation quotient through by
u^2).  Census deltas (opcensus, weighted): NL carry chain 22,057 -> 14,385
ops/col (-35%), body chain -23%, weighted total -7%, issue count unchanged.
This A/B measures which model (issue vs latency) the kernels actually obey.

Usage: python benchmarks/sweep_cuadj.py [nl|tl|ad ...]
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from cloudsc2_tpu import iox, make_constants
from cloudsc2_tpu.physics.diagnostics import eta_levels
from cloudsc2_tpu.physics.increment import state_increment
from cloudsc2_tpu.physics.saturation import saturation
from cloudsc2_tpu.pallas.adjoint import cloudsc2_ad_pallas
from cloudsc2_tpu.pallas.nonlinear import cloudsc2_nl_pallas
from cloudsc2_tpu.pallas.tangent_linear import cloudsc2_tl_pallas
from cloudsc2_tpu.validation.symmetry import DIAG_NAMES, TEND_NAMES

NCOLS = 1 << 16
NLEV = 137
LONG, SHORT = 24, 4
SAMPLES = int(os.environ.get("SWEEP_SAMPLES", "5"))

_, s, dt = iox.synthesize_input(ncols=4096, nlev=NLEV, seed=0, dtype=np.float32)
reps = NCOLS // 4096
state = {
    k: (jnp.tile(jnp.asarray(v, jnp.float32), (1, reps)) if v.ndim == 2
        else jnp.asarray(v, jnp.float32))
    for k, v in s.items()
}
C_COMPACT = make_constants(lphylin=True, ldrain1d=False)
C_REF = C_COMPACT.replace(CUADJ_COMPACT=False)
state["eta"] = eta_levels(state["ap"], state["aph"])
state["qsat"] = saturation(state["ap"], state["t"], kflag=1, lphylin=True, c=C_COMPACT)
state.update(state_increment(state, 0.01, ignore_supsat=True))
tt, dd = cloudsc2_tl_pallas(state, dt, C_COMPACT)
for n in TEND_NAMES:
    state["tnd_" + n] = tt[n]
    state["tnd_" + n + "_i"] = tt[n + "_i"]
for n in DIAG_NAMES:
    state[n + "_i"] = dd[n + "_i"]
state = {k: jax.device_put(v) for k, v in state.items()}

SCHEMES = {
    "nl": cloudsc2_nl_pallas,
    "tl": cloudsc2_tl_pallas,
    "ad": cloudsc2_ad_pallas,
}


@partial(jax.jit, static_argnames=("n", "scheme", "compact"))
def chain(state, n, scheme, compact):
    c = C_COMPACT if compact else C_REF

    def body(_, st):
        tends, diags = SCHEMES[scheme](st, dt, c)
        st = dict(st)
        eps = jnp.asarray(1e-30, st["t"].dtype)
        if scheme == "nl":
            st["t"] = st["t"] + eps * tends["t"]
        elif scheme == "tl":
            st["t"] = st["t"] + eps * tends["t"] + eps * tends["t_i"]
        else:  # ad: consume a reverse-sweep output or XLA DCEs it
            st["t"] = st["t"] + eps * tends["t"] + eps * diags["t_i"]
        return st

    return jax.lax.fori_loop(0, n, body, dict(state))["t"]


def fetch(x):
    return float(jnp.sum(x[0]))


def main():
    schemes = sys.argv[1:] or ["nl", "tl", "ad"]
    keys = [(s, comp) for s in schemes for comp in (True, False)]
    live = []
    for key in keys:
        try:
            t0 = time.time()
            fetch(chain(state, SHORT, *key))
            fetch(chain(state, LONG, *key))
            print(json.dumps({"key": key, "compile_s": time.time() - t0}),
                  flush=True)
            live.append(key)
        except Exception as e:
            print(json.dumps({"key": key, "error": str(e)[:200]}), flush=True)

    per = {key: [] for key in live}
    for _ in range(SAMPLES):
        for key in live:  # interleaved: tunnel drift hits all keys equally
            t0 = time.perf_counter()
            fetch(chain(state, SHORT, *key))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            fetch(chain(state, LONG, *key))
            tl = time.perf_counter() - t0
            per[key].append((tl - ts) / (LONG - SHORT))
    out = {}
    for key in live:
        med = float(np.median(per[key]))
        out[key] = NCOLS / med
        print(json.dumps({
            "key": key, "per_step_ms": med * 1e3, "cols_per_sec": NCOLS / med,
        }), flush=True)
    for scheme in schemes:
        a, b = out.get((scheme, True)), out.get((scheme, False))
        if a and b:
            print(json.dumps({"scheme": scheme, "compact_vs_ref": a / b}),
                  flush=True)


if __name__ == "__main__":
    main()
