"""A/B the tile-contiguous stream layout against the global layout (NL).

VERDICT r4 next #1: the identical kernel does 28.2M cols/s at 4,096
resident columns (where w == wb makes the global ``(nlev, 8, w)`` layout
incidentally tile-contiguous) vs 19.5M at the 65,536-column bench shape;
the round-4 chunked-call A/B kept the global layout, so the layout
variable was never isolated.  ``tile_layout=True`` relays every stream to
``(nj, nlev, 8, wb)`` so each grid instance's fetches are contiguous
256 KB bursts instead of 2 KB segments strided 32 KB apart.

Timed unit = the bench chain's forward step (XLA saturation + NL kernel),
long/short chain difference, interleaved samples, median.  Run serially
(one process owns the chip); claims >5% need the ratio reproduced in >= 2
processes (benchmarks/README.md noise protocol).

Usage: python benchmarks/sweep_nl_layout.py [ncols_log2 ...]
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

NLEV = 137
LONG, SHORT = 32, 4
c = make_constants(lphylin=True, ldrain1d=False)


def build_state(ncols):
    _, s, dt = iox.synthesize_input(ncols=4096, nlev=NLEV, seed=0, dtype=np.float32)
    reps = ncols // 4096
    state = {
        k: (jnp.tile(jnp.asarray(v, jnp.float32), (1, reps)) if v.ndim == 2
            else jnp.asarray(v, jnp.float32))
        for k, v in s.items()
    }
    state["eta"] = eta_levels(state["ap"], state["aph"])
    return state, dt


@partial(jax.jit, static_argnames=("n", "dt", "tile"))
def chain(state, n, dt, tile):
    def body(_, st):
        s2 = dict(st)
        s2["qsat"] = saturation(s2["ap"], s2["t"], kflag=1, lphylin=True, c=c)
        tends, _d = cloudsc2_nl_pallas(s2, dt, c, tile_layout=tile)
        st = dict(st)
        st["t"] = st["t"] + jnp.asarray(1e-30, st["t"].dtype) * tends["t"]
        return st

    return jax.lax.fori_loop(0, n, body, dict(state))["t"]


@partial(jax.jit, static_argnames=("n", "dt"))
def chain_tiled(state, n, dt):
    """Tiled-NATIVE chain: the persistent loop state lives in tiled storage
    ((nj, L, 8, wb)), so no relayout exists anywhere — saturation and the
    eps update are elementwise (layout-blind), and the kernel consumes/
    produces tiled streams directly (state_tiled=True).  Same timed work
    as chain() otherwise."""
    def body(_, st):
        s2 = dict(st)
        s2["qsat"] = saturation(s2["ap"], s2["t"], kflag=1, lphylin=True, c=c)
        tends, _d = cloudsc2_nl_pallas(
            s2, dt, c, tile_layout=True, state_tiled=True
        )
        st = dict(st)
        st["t"] = st["t"] + jnp.asarray(1e-30, st["t"].dtype) * tends["t"]
        return st

    return jax.lax.fori_loop(0, n, body, dict(state))["t"]


def fetch(x):
    return float(jnp.sum(x[0]))


SIZES = [int(a) for a in sys.argv[1:]] or [16]
SAMPLES = int(os.environ.get("SWEEP_SAMPLES", "5"))

from cloudsc2_tpu.pallas.levelscan import tile_state

for lg in SIZES:
    ncols = 1 << lg
    state, dt = build_state(ncols)
    state_t = tile_state(state, 512)
    runners = {
        "global": lambda n: chain(state, n, dt, False),
        "relayout": lambda n: chain(state, n, dt, True),
        "tiled-native": lambda n: chain_tiled(state_t, n, dt),
    }
    live = []
    for name, run in runners.items():
        try:
            t0 = time.time()
            fetch(run(SHORT))
            fetch(run(LONG))
            print(json.dumps({"ncols": ncols, "variant": name,
                              "compile_s": round(time.time() - t0, 1)}), flush=True)
            live.append(name)
        except Exception as e:
            print(json.dumps({"ncols": ncols, "variant": name,
                              "error": str(e)[:200]}), flush=True)
    per = {v: [] for v in live}
    for _ in range(SAMPLES):
        for name in live:
            run = runners[name]
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
            "ncols": ncols, "variant": name, "per_step_ms": round(med * 1e3, 3),
            "cols_per_sec": None if med != med else round(ncols / med),
        }), flush=True)
