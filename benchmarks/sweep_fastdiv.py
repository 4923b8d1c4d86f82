"""FAST_DIV mode sweep on the attached TPU: throughput + accuracy.

For each divide strategy (exact / faithful / approx, see
``cloudsc2_tpu.physics.fastmath.DIV_MODES``) this measures the fused
NL forward-step throughput with bench.py's chain protocol, and the
per-field deviation of each fast mode from the exact kernel (max abs
diff scaled by the field's max magnitude — the driver's f32 validation
uses rtol 2e-4 / per-field atol, so anything << 2e-4 here is safely
inside the gates).
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
from cloudsc2_tpu.parallel.step import forward_step

NCOLS = 1 << 16
NLEV = 137
SYNTH_COLS = 4096
LONG, SHORT = 64, 8
REPEATS = 3


def fetch(x):
    return float(jnp.sum(x[0]))


@partial(jax.jit, static_argnames=("n", "dt", "c"))
def chain_nl(state, n, dt, c):
    def body(_, s):
        tends, diags = forward_step(s, dt, c)
        s = dict(s)
        eps = jnp.asarray(1e-30, s["t"].dtype)
        s["t"] = s["t"] + eps * tends["t"]
        return s

    s = jax.lax.fori_loop(0, n, body, dict(state))
    return s["t"]


def main():
    _, state_np, dt = iox.synthesize_input(ncols=SYNTH_COLS, nlev=NLEV, seed=0)
    c0 = make_constants(lphylin=True, ldrain1d=False)
    reps = NCOLS // SYNTH_COLS
    state = {
        k: (jnp.tile(jnp.asarray(v, jnp.float32), (1, reps)) if v.ndim == 2
            else jnp.asarray(v, jnp.float32))
        for k, v in state_np.items()
    }

    outs = {}
    for mode in ("exact", "faithful", "approx"):
        c = c0.replace(FAST_DIV=mode)
        t, d = jax.jit(lambda s, c=c: forward_step(s, dt, c))(state)
        outs[mode] = {**{k: np.asarray(v) for k, v in t.items()},
                      **{k: np.asarray(v) for k, v in d.items()}}
        fetch(chain_nl(state, SHORT, dt, c))
        fetch(chain_nl(state, LONG, dt, c))
        per = []
        for _ in range(REPEATS):
            t0 = time.perf_counter(); fetch(chain_nl(state, SHORT, dt, c)); ts = time.perf_counter() - t0
            t0 = time.perf_counter(); fetch(chain_nl(state, LONG, dt, c)); tl = time.perf_counter() - t0
            per.append((tl - ts) / (LONG - SHORT))
        cols = NCOLS / float(np.min(per))
        err = {
            k: float(np.abs(outs[mode][k] - outs["exact"][k]).max()
                     / max(np.abs(outs["exact"][k]).max(), 1e-30))
            for k in outs["exact"]
        }
        print(json.dumps({"mode": mode, "nl_cols_per_sec": round(cols),
                          "max_scaled_err": {k: f"{v:.1e}" for k, v in err.items()}}),
              flush=True)


if __name__ == "__main__":
    main()
