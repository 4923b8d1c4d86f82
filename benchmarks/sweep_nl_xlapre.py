"""A/B the xla_pre NL path (XLA phase A + phase-B tail kernel) on a TPU.

Times the FULL forward step (saturation + NL) — the unit bench.py reports —
because xla_pre's phase A fuses with the saturation diagnostic in XLA.
Variants are measured round-robin interleaved with the baseline and reported
as medians (tunnel throughput drifts minute-to-minute; see
benchmarks/README.md methodology notes).
"""
import time, json
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

NCOLS = 1 << 16
NLEV = 137
LONG, SHORT = 32, 4
ROUNDS = 5

_, s, dt = iox.synthesize_input(ncols=4096, nlev=NLEV, seed=0, dtype=np.float32)
reps = NCOLS // 4096
state = {
    k: (jnp.tile(jnp.asarray(v, jnp.float32), (1, reps)) if v.ndim == 2 else jnp.asarray(v, jnp.float32))
    for k, v in s.items()
}
c = make_constants(lphylin=True, ldrain1d=False)
state["eta"] = eta_levels(state["ap"], state["aph"])
# seed the key so the fori_loop carry structure is stable (the body
# recomputes it every step — saturation is part of the timed unit)
state["qsat"] = saturation(state["ap"], state["t"], kflag=1, lphylin=True, c=c)


@partial(jax.jit, static_argnames=("n", "kb", "wb", "unroll", "xla_pre"))
def chain(state, n, kb, wb, unroll, xla_pre):
    def body(_, st):
        st = dict(st)
        st["qsat"] = saturation(st["ap"], st["t"], kflag=1, lphylin=True, c=c)
        tends, _d = cloudsc2_nl_pallas(
            st, dt, c, kb=kb, wb=wb, unroll=unroll, xla_pre=xla_pre
        )
        st["t"] = st["t"] + jnp.asarray(1e-30, st["t"].dtype) * tends["t"]
        return st

    return jax.lax.fori_loop(0, n, body, dict(state))["t"]


def fetch(x):
    return float(jnp.sum(x[0]))


# (kb, wb, unroll, xla_pre)
VARIANTS = [
    (16, 512, 2, False),  # current default
    (16, 512, 2, True),
    (8, 512, 2, True),
    (16, 512, 1, True),
    (8, 512, 1, True),
    (32, 512, 1, True),   # tail body is small; kb=32 may fit now
]

ok = []
for v in VARIANTS:
    kb, wb, unroll, xla_pre = v
    try:
        t0 = time.time()
        fetch(chain(state, SHORT, kb, wb, unroll, xla_pre))
        fetch(chain(state, LONG, kb, wb, unroll, xla_pre))
        print(json.dumps({"variant": v, "compile_s": time.time() - t0}), flush=True)
        ok.append((v, []))
    except Exception as e:
        print(json.dumps({"variant": v, "error": str(e)[:200]}), flush=True)

for _ in range(ROUNDS):
    for v, samples in ok:
        kb, wb, unroll, xla_pre = v
        t0 = time.perf_counter()
        fetch(chain(state, SHORT, kb, wb, unroll, xla_pre))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        fetch(chain(state, LONG, kb, wb, unroll, xla_pre))
        tl = time.perf_counter() - t0
        samples.append((tl - ts) / (LONG - SHORT))

for v, samples in ok:
    per = sorted(samples)[len(samples) // 2]
    print(json.dumps({
        "variant": v,
        "per_step_ms": round(per * 1e3, 3),
        "cols_per_sec": round(NCOLS / per),
    }), flush=True)
