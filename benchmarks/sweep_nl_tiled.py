"""Re-sweep KB/WB/unroll for the NL kernel under tiled-native storage.

The round-2 defaults (kb=16/wb=512/unroll=2) were tuned on the global
layout, where wb set the strided-fetch segment length; under tile_layout
every fetch is one contiguous burst regardless of wb, so the optimum may
move (wb only sets VMEM block size and vreg count per op now).  Chain
protocol as sweep_nl_layout.py (tiled persistent state, zero relayouts).

Usage: python benchmarks/sweep_nl_tiled.py [kb,wb,unroll ...]
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
from cloudsc2_tpu.pallas.levelscan import tile_state

NCOLS = 1 << 16
NLEV = 137
LONG, SHORT = 32, 4
c = make_constants(lphylin=True, ldrain1d=False)

_, s, dt = iox.synthesize_input(ncols=4096, nlev=NLEV, seed=0, dtype=np.float32)
reps = NCOLS // 4096
state = {
    k: (jnp.tile(jnp.asarray(v, jnp.float32), (1, reps)) if v.ndim == 2
        else jnp.asarray(v, jnp.float32))
    for k, v in s.items()
}
state["eta"] = eta_levels(state["ap"], state["aph"])

# PAD_LEVELS=N: edge-pad every field to N levels BEFORE tiling, so the
# padded (unroll>1) layout needs no per-call pad copies — isolates "does
# cross-level unrolling help at the serial wall" from the padding tax
# (compare u1 vs u2 at the SAME padded height, and u1@N vs u1@137 for the
# pure extra-level cost)
PADL = int(os.environ.get("PAD_LEVELS", "0"))
if PADL:
    def _padl(v, h):
        return jnp.pad(v, ((0, h - v.shape[0]), (0, 0)), mode="edge")

    state = {
        k: (
            _padl(v, PADL + 1) if k == "aph"
            else (_padl(v, PADL) if getattr(v, "ndim", 0) == 2 else v)
        )
        for k, v in state.items()
    }
    state["eta"] = jnp.pad(state["eta"], (0, PADL - NLEV), mode="edge")

TILED = {}


def state_for(wb):
    if wb not in TILED:
        TILED[wb] = tile_state(state, wb)
    return TILED[wb]


@partial(jax.jit, static_argnames=("n", "kb", "wb", "unroll"))
def chain(st0, n, kb, wb, unroll):
    def body(_, st):
        s2 = dict(st)
        s2["qsat"] = saturation(s2["ap"], s2["t"], kflag=1, lphylin=True, c=c)
        tends, _d = cloudsc2_nl_pallas(
            s2, dt, c, tile_layout=True, state_tiled=True,
            kb=kb, wb=wb, unroll=unroll,
        )
        st = dict(st)
        st["t"] = st["t"] + jnp.asarray(1e-30, st["t"].dtype) * tends["t"]
        return st

    return jax.lax.fori_loop(0, n, body, dict(st0))["t"]


def fetch(x):
    return float(jnp.sum(x[0]))


VARIANTS = [
    (16, 512, 2),   # global-layout default
    (16, 512, 1),
    (8, 512, 2),
    (16, 256, 2),
    (24, 512, 2),
    (16, 1024, 2),
    (32, 512, 2),
    (16, 512, 4),
]
if len(sys.argv) > 1:
    VARIANTS = [tuple(int(x) for x in t.split(",")) for t in sys.argv[1:]]
SAMPLES = int(os.environ.get("SWEEP_SAMPLES", "5"))

live = []
for cfg in VARIANTS:
    kb, wb, u = cfg
    try:
        t0 = time.time()
        fetch(chain(state_for(wb), SHORT, kb, wb, u))
        fetch(chain(state_for(wb), LONG, kb, wb, u))
        print(json.dumps({"cfg": cfg, "compile_s": round(time.time() - t0, 1)}), flush=True)
        live.append(cfg)
    except Exception as e:
        print(json.dumps({"cfg": cfg, "error": str(e)[:200]}), flush=True)

per = {cfg: [] for cfg in live}
for _ in range(SAMPLES):
    for cfg in live:
        kb, wb, u = cfg
        st0 = state_for(wb)
        t0 = time.perf_counter()
        fetch(chain(st0, SHORT, kb, wb, u))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        fetch(chain(st0, LONG, kb, wb, u))
        tl = time.perf_counter() - t0
        per[cfg].append((tl - ts) / (LONG - SHORT))
for cfg in live:
    pos = sorted(s for s in per[cfg] if s > 0) or [float('nan')]
    med = pos[len(pos) // 2]
    print(json.dumps({
        "cfg": cfg, "per_step_ms": round(med * 1e3, 3),
        "cols_per_sec": None if med != med else round(NCOLS / med),
    }), flush=True)
