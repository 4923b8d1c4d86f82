"""Per-chip rate vs resident columns under tiled-native storage (NL/TL/AD).

VERDICT r4 next #5: turn the batch-size curve into a quantitative
pod-scaling projection.  Each ncols is a "per-chip share" of a
column-sharded pod run (columns are independent; the sharded path runs
identical per-device kernels with zero collectives), so per-chip rate at
ncols/chip × chips = pod throughput.  Round 4's curve (28.2M at 4k vs
19.5M at 65k) implied super-linear scaling; the round-5 tiled layout
recovered the 65k rate, so this re-measures the curve that the
projection table in benchmarks/README.md §Round 5 is built from.

Usage: python benchmarks/sweep_batch_tiled.py [scheme:lg2 ...]
  default: nl at 12..16, tl/ad at 13..16
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
from cloudsc2_tpu.pallas.nonlinear import cloudsc2_nl_pallas
from cloudsc2_tpu.pallas.tangent_linear import cloudsc2_tl_pallas
from cloudsc2_tpu.pallas.adjoint import cloudsc2_ad_pallas
from cloudsc2_tpu.pallas.levelscan import tile_state

NLEV = 137
WB = 512
c = make_constants(lphylin=True, ldrain1d=False)


def build(ncols, scheme):
    _, s0, dt = iox.synthesize_input(ncols=4096, nlev=NLEV, seed=0, dtype=np.float32)
    reps = ncols // 4096
    st = {
        k: (jnp.tile(jnp.asarray(v, jnp.float32), (1, reps)) if v.ndim == 2
            else jnp.asarray(v, jnp.float32))
        for k, v in s0.items()
    }
    st["eta"] = eta_levels(st["ap"], st["aph"])
    if scheme != "nl":
        st["qsat"] = saturation(st["ap"], st["t"], kflag=1, lphylin=True, c=c)
        st.update(state_increment(st, 0.01, ignore_supsat=True))
    if scheme == "ad":
        tt, dd = cloudsc2_tl_pallas(st, dt, c)
        for n in ("t", "q", "ql", "qi"):
            st["tnd_" + n] = tt[n]
            st["tnd_" + n + "_i"] = tt[n + "_i"]
        for n in ("clc", "covptot", "fhpsl", "fhpsn", "fplsl", "fplsn"):
            st[n + "_i"] = dd[n + "_i"]
    return tile_state(st, WB), dt


@partial(jax.jit, static_argnames=("n", "scheme", "dt"))
def chain(st0, n, scheme, dt):
    def body(_, st):
        st = dict(st)
        eps = jnp.asarray(1e-30, st["t"].dtype)
        if scheme == "nl":
            # fused in-kernel saturation: the round-5 bench default
            tends, _d = cloudsc2_nl_pallas(
                st, dt, c, tile_layout=True, state_tiled=True,
                fuse_saturation=True,
            )
            st["t"] = st["t"] + eps * tends["t"]
        elif scheme == "tl":
            tends, _d = cloudsc2_tl_pallas(
                st, dt, c, tile_layout=True, state_tiled=True, unroll=1
            )
            st["t"] = st["t"] + eps * tends["t"]
            st["t_i"] = st["t_i"] + eps * tends["t_i"]
        else:
            tends, diags = cloudsc2_ad_pallas(
                st, dt, c, tile_layout=True, state_tiled=True
            )
            st["t"] = st["t"] + eps * tends["t"] + eps * diags["t_i"]
        return st

    return jax.lax.fori_loop(0, n, body, dict(st0))["t"]


def fetch(x):
    return float(jnp.sum(x[0]))


ARGS = sys.argv[1:] or (
    ["nl:12", "nl:13", "nl:14", "nl:15", "nl:16"]
    + ["tl:13", "tl:14", "tl:16", "ad:13", "ad:14", "ad:16"]
)
SAMPLES = int(os.environ.get("SWEEP_SAMPLES", "5"))

jobs = []
for a in ARGS:
    scheme, lg = a.split(":")
    ncols = 1 << int(lg)
    # scale chain lengths so the measured slope stays well above tunnel
    # jitter at small working sets (the r5 microbench lesson)
    longn = max(16, (1 << 16) // ncols * 16)
    shortn = max(2, longn // 8)
    jobs.append((a, scheme, ncols, longn, shortn))

live = []
for a, scheme, ncols, longn, shortn in jobs:
    try:
        st, dt = build(ncols, scheme)
        t0 = time.time()
        fetch(chain(st, shortn, scheme, dt))
        fetch(chain(st, longn, scheme, dt))
        print(json.dumps({"cfg": a, "compile_s": round(time.time() - t0, 1)}), flush=True)
        live.append((a, scheme, ncols, longn, shortn, st, dt))
    except Exception as e:
        print(json.dumps({"cfg": a, "error": str(e)[:200]}), flush=True)

per = {j[0]: [] for j in live}
for _ in range(SAMPLES):
    for a, scheme, ncols, longn, shortn, st, dt in live:
        t0 = time.perf_counter()
        fetch(chain(st, shortn, scheme, dt))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        fetch(chain(st, longn, scheme, dt))
        tl = time.perf_counter() - t0
        per[a].append((tl - ts) / (longn - shortn))
for a, scheme, ncols, longn, shortn, st, dt in live:
    pos = sorted(s for s in per[a] if s > 0) or [float('nan')]
    med = pos[len(pos) // 2]
    print(json.dumps({
        "cfg": a, "ncols": ncols, "per_step_ms": round(med * 1e3, 3),
        "cols_per_sec": None if med != med else round(ncols / med),
    }), flush=True)
