"""Same-process lax.scan vs Pallas A/B for NL / TL / AD (ADVICE r2 #1).

README.md's "vs XLA scan" ratios previously divided current kernel numbers
by round-1 scan baselines — but the strength reductions live in the SHARED
level bodies, so the scan path sped up too.  This script times both
implementations of each scheme interleaved in ONE process (the only
comparison this repo trusts) so the ratios are apples-to-apples.

Usage: python benchmarks/sweep_scan_vs_pallas.py [nl|tl|ad ...]
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
from cloudsc2_tpu.physics.nonlinear import cloudsc2_nl
from cloudsc2_tpu.physics.saturation import saturation
from cloudsc2_tpu.physics.tangent_linear import cloudsc2_tl
from cloudsc2_tpu.physics.adjoint import cloudsc2_ad
from cloudsc2_tpu.pallas.adjoint import cloudsc2_ad_pallas
from cloudsc2_tpu.pallas.nonlinear import cloudsc2_nl_pallas
from cloudsc2_tpu.pallas.tangent_linear import cloudsc2_tl_pallas
from cloudsc2_tpu.validation.symmetry import DIAG_NAMES, TEND_NAMES

NCOLS = 1 << 16
NLEV = 137
LONG, SHORT = 24, 4
SAMPLES = 5

_, s, dt = iox.synthesize_input(ncols=4096, nlev=NLEV, seed=0, dtype=np.float32)
reps = NCOLS // 4096
state = {
    k: (jnp.tile(jnp.asarray(v, jnp.float32), (1, reps)) if v.ndim == 2
        else jnp.asarray(v, jnp.float32))
    for k, v in s.items()
}
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

# tiled-native variants (round 5): the chain state lives tiled
from cloudsc2_tpu.pallas.levelscan import tile_state

state_t = tile_state(state, 512)

SCHEMES = {
    ("nl", "scan"): lambda st: cloudsc2_nl(st, dt, c),
    ("nl", "pallas"): lambda st: cloudsc2_nl_pallas(st, dt, c),
    ("nl", "tiled"): lambda st: cloudsc2_nl_pallas(
        st, dt, c, tile_layout=True, state_tiled=True),
    ("tl", "scan"): lambda st: cloudsc2_tl(st, dt, c),
    ("tl", "pallas"): lambda st: cloudsc2_tl_pallas(st, dt, c),
    ("tl", "tiled"): lambda st: cloudsc2_tl_pallas(
        st, dt, c, tile_layout=True, state_tiled=True, unroll=1),
    ("ad", "scan"): lambda st: cloudsc2_ad(st, dt, c),
    ("ad", "pallas"): lambda st: cloudsc2_ad_pallas(st, dt, c),
    ("ad", "tiled"): lambda st: cloudsc2_ad_pallas(
        st, dt, c, tile_layout=True, state_tiled=True),
}


@partial(jax.jit, static_argnames=("n", "key"))
def chain(state, n, key):
    scheme, _impl = key

    def body(_, st):
        tends, diags = SCHEMES[key](st)
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
    keys = [k for k in SCHEMES if k[0] in schemes]
    live = []
    for key in keys:
        st0 = state_t if key[1] == "tiled" else state
        try:
            t0 = time.time()
            fetch(chain(st0, SHORT, key))
            fetch(chain(st0, LONG, key))
            print(json.dumps({"key": key, "compile_s": time.time() - t0}),
                  flush=True)
            live.append(key)
        except Exception as e:
            print(json.dumps({"key": key, "error": str(e)[:200]}), flush=True)

    per = {key: [] for key in live}
    for _ in range(SAMPLES):
        for key in live:  # interleaved: tunnel drift hits all keys equally
            st0 = state_t if key[1] == "tiled" else state
            t0 = time.perf_counter()
            fetch(chain(st0, SHORT, key))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            fetch(chain(st0, LONG, key))
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
        a, b = out.get((scheme, "pallas")), out.get((scheme, "scan"))
        if a and b:
            print(json.dumps({"scheme": scheme, "pallas_vs_scan": a / b}),
                  flush=True)
        t = out.get((scheme, "tiled"))
        if t and b:
            print(json.dumps({"scheme": scheme, "tiled_vs_scan": t / b}),
                  flush=True)


if __name__ == "__main__":
    main()
