"""TL and AD chains under tiled-native storage vs the global layout.

Follow-up to sweep_nl_tiled.py (NL: 19.2M -> 28.1-29.1M cols/s at 65k,
rolled kb 16-28): the TL and AD kernels are MORE stream-bound than NL
(22 and 21+ streams), so the contiguous-burst win should be at least as
large.  Chain protocol = bench.py's chain_tl/chain_ad (kernel only; the
state prep runs once outside), long/short difference, interleaved samples.

Usage: python benchmarks/sweep_tl_ad_tiled.py [scheme:kb[,wb] ...]
  e.g.  python benchmarks/sweep_tl_ad_tiled.py tl:g tl:10 tl:16 ad:g ad:10
  ("g" = global-layout default config as shipped)
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
from cloudsc2_tpu.physics.increment import state_increment
from cloudsc2_tpu.physics.saturation import saturation
from cloudsc2_tpu.pallas.tangent_linear import cloudsc2_tl_pallas
from cloudsc2_tpu.pallas.adjoint import cloudsc2_ad_pallas
from cloudsc2_tpu.pallas.levelscan import tile_state

NCOLS = 1 << 16
NLEV = 137
WB = 512
LONG, SHORT = 16, 2
c = make_constants(lphylin=True, ldrain1d=False)

_, s0, dt = iox.synthesize_input(ncols=4096, nlev=NLEV, seed=0, dtype=np.float32)
reps = NCOLS // 4096
state = {
    k: (jnp.tile(jnp.asarray(v, jnp.float32), (1, reps)) if v.ndim == 2
        else jnp.asarray(v, jnp.float32))
    for k, v in s0.items()
}
state["eta"] = eta_levels(state["ap"], state["aph"])
state["qsat"] = saturation(state["ap"], state["t"], kflag=1, lphylin=True, c=c)
state.update(state_increment(state, 0.01, ignore_supsat=True))

tt, dd = cloudsc2_tl_pallas(state, dt, c)
s_ad = dict(state)
for n in ("t", "q", "ql", "qi"):
    s_ad["tnd_" + n] = tt[n]
    s_ad["tnd_" + n + "_i"] = tt[n + "_i"]
for n in ("clc", "covptot", "fhpsl", "fhpsn", "fplsl", "fplsn"):
    s_ad[n + "_i"] = dd[n + "_i"]

state_t = tile_state(state, WB)
s_ad_t = tile_state(s_ad, WB)


@partial(jax.jit, static_argnames=("n", "kb", "tiled", "t_only"))
def chain_tl(st0, n, kb, tiled, t_only=False):
    def body(_, st):
        tends, _d = cloudsc2_tl_pallas(
            st, dt, c, kb=kb, tile_layout=tiled, state_tiled=tiled,
            unroll=1 if tiled else None, tangent_only=t_only,
        )
        st = dict(st)
        eps = jnp.asarray(1e-30, st["t"].dtype)
        if not t_only:
            st["t"] = st["t"] + eps * tends["t"]
        st["t_i"] = st["t_i"] + eps * tends["t_i"]
        return st

    s = jax.lax.fori_loop(0, n, body, dict(st0))
    return s["t"] + s["t_i"]


@partial(jax.jit, static_argnames=("n", "kb", "resident"))
def chain_ad_fused(st0, n, kb, resident):
    from cloudsc2_tpu.pallas.adjoint import cloudsc2_ad_pallas_fused

    def body(_, st):
        tends, diags = cloudsc2_ad_pallas_fused(
            st, dt, c, kb=kb, state_tiled=True, resident=resident,
        )
        st = dict(st)
        eps = jnp.asarray(1e-30, st["t"].dtype)
        st["t"] = st["t"] + eps * tends["t"] + eps * diags["t_i"]
        return st

    return jax.lax.fori_loop(0, n, body, dict(st0))["t"]


@partial(jax.jit, static_argnames=("n", "kb", "fwd_kb", "tiled", "c_only"))
def chain_ad(st0, n, kb, fwd_kb, tiled, c_only=False):
    def body(_, st):
        tends, diags = cloudsc2_ad_pallas(
            st, dt, c, kb=kb, fwd_kb=fwd_kb,
            tile_layout=tiled, state_tiled=tiled, cotangent_only=c_only,
        )
        st = dict(st)
        eps = jnp.asarray(1e-30, st["t"].dtype)
        st["t"] = st["t"] + (
            eps * diags["t_i"] if c_only
            else eps * tends["t"] + eps * diags["t_i"]
        )
        return st

    return jax.lax.fori_loop(0, n, body, dict(st0))["t"]


def fetch(x):
    return float(jnp.sum(x[0]))


ARGS = sys.argv[1:] or ["tl:g", "tl:10", "tl:16", "tl:20", "ad:g", "ad:10", "ad:16"]
SAMPLES = int(os.environ.get("SWEEP_SAMPLES", "5"))

RUNNERS = {}
for a in ARGS:
    scheme, spec = a.split(":")
    if scheme in ("tl", "tlo"):
        t_only = scheme == "tlo"
        if spec == "g":
            RUNNERS[a] = lambda n, to=t_only: chain_tl(state, n, None, False, to)
        else:
            parts = [int(x) for x in spec.split(",")]
            kb = parts[0]
            twb = parts[1] if len(parts) > 1 else WB
            st_v = state_t if twb == WB else tile_state(state, twb)
            RUNNERS[a] = lambda n, kb=kb, to=t_only, st=st_v: chain_tl(
                st, n, kb, True, to
            )
    elif scheme in ("adf", "adfr"):
        parts = [int(x) for x in spec.split(",")]
        kb = parts[0]
        fwb = parts[1] if len(parts) > 1 else WB
        st_f = s_ad_t if fwb == WB else tile_state(s_ad, fwb)
        RUNNERS[a] = lambda n, kb=kb, r=scheme == "adfr", st=st_f: (
            chain_ad_fused(st, n, kb, r)
        )
    else:
        c_only = scheme == "ado"
        if spec == "g":
            RUNNERS[a] = lambda n, co=c_only: chain_ad(
                s_ad, n, None, None, False, co
            )
        else:
            parts = [int(x) for x in spec.split(",")]
            kb = parts[0]
            fkb = parts[1] if len(parts) > 1 else None
            RUNNERS[a] = lambda n, kb=kb, fkb=fkb, co=c_only: chain_ad(
                s_ad_t, n, kb, fkb, True, co
            )

live = []
for name, run in RUNNERS.items():
    try:
        t0 = time.time()
        fetch(run(SHORT))
        fetch(run(LONG))
        print(json.dumps({"cfg": name, "compile_s": round(time.time() - t0, 1)}), flush=True)
        live.append(name)
    except Exception as e:
        print(json.dumps({"cfg": name, "error": str(e)[:200]}), flush=True)

per = {v: [] for v in live}
for _ in range(SAMPLES):
    for name in live:
        run = RUNNERS[name]
        t0 = time.perf_counter()
        fetch(run(SHORT))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        fetch(run(LONG))
        tl = time.perf_counter() - t0
        per[name].append((tl - ts) / (LONG - SHORT))
for name in live:
    pos = sorted(s for s in per[name] if s > 0) or [float('nan')]
    med = pos[len(pos) // 2]
    print(json.dumps({
        "cfg": name, "per_step_ms": round(med * 1e3, 3),
        "cols_per_sec": None if med != med else round(NCOLS / med),
    }), flush=True)
