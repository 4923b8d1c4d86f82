"""Fused single-kernel AD vs the two-kernel pipeline (VERDICT r2 #1).

Within-process interleaved A/B (the only comparison this repo trusts,
CLAUDE.md): each variant's chain is timed round-robin per sample so tunnel
throughput drift hits all variants equally; median over samples.

Variants:
  twokernel      — cloudsc2_ad_pallas (NL-with-trajectory kernel + reverse
                   kernel; 3 trajectory streams round-trip HBM)
  fused          — one pallas_call, trajectory carry in a VMEM stack
                   (saves the 3-stream round trip; fwd inputs re-fetched)
  fused-resident — fused + forward inputs kept in VMEM stacks (saves the
                   11-stream second read too)

Usage: python benchmarks/sweep_ad_fused.py [variant:kb,wb,unroll ...]
  e.g. python benchmarks/sweep_ad_fused.py twokernel:8,512,2 fused:4,512,2
  (no args: the three variants at the default config)
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
from cloudsc2_tpu.pallas.adjoint import cloudsc2_ad_pallas, cloudsc2_ad_pallas_fused
from cloudsc2_tpu.pallas.tangent_linear import cloudsc2_tl_pallas
from cloudsc2_tpu.physics.diagnostics import eta_levels
from cloudsc2_tpu.physics.increment import state_increment
from cloudsc2_tpu.physics.saturation import saturation
from cloudsc2_tpu.validation.symmetry import DIAG_NAMES, TEND_NAMES

NCOLS = 1 << 16
NLEV = 137
LONG, SHORT = 32, 4
SAMPLES = int(os.environ.get("SWEEP_SAMPLES", "5"))

FNS = {
    "twokernel": cloudsc2_ad_pallas,
    "fused": cloudsc2_ad_pallas_fused,
    "fused-resident": partial(cloudsc2_ad_pallas_fused, resident=True),
}


def parse_combo(tok):
    """variant:kb,wb,unroll[,fwd_unroll[,fwd_kb]] — fwd_* are
    twokernel-only (the forward NL kernel's unroll/level-block; default to
    matching the reverse unroll / the NL kernel's best kb).  0 = None."""
    variant, _, cfg = tok.partition(":")
    kb = wb = unroll = fwd_unroll = fwd_kb = None
    if cfg:
        nums = [int(x) for x in cfg.split(",")]
        kb, wb, unroll = nums[:3]
        if len(nums) > 3 and nums[3]:
            fwd_unroll = nums[3]
        if len(nums) > 4 and nums[4]:
            fwd_kb = nums[4]
    return variant, kb, wb, unroll, fwd_unroll, fwd_kb


COMBOS = (
    [parse_combo(t) for t in sys.argv[1:]]
    if len(sys.argv) > 1
    else [(v, None, None, None, None, None) for v in FNS]
)

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

@partial(jax.jit, static_argnames=("n", "ix"))
def chain(state, n, ix):
    variant, kb, wb, unroll, fwd_unroll, fwd_kb = COMBOS[ix]
    kw = {}
    if fwd_unroll is not None:
        kw["fwd_unroll"] = fwd_unroll
    if fwd_kb is not None:
        kw["fwd_kb"] = fwd_kb

    def body(_, st):
        tends, _d = FNS[variant](st, dt, c, kb=kb, wb=wb, unroll=unroll, **kw)
        st = dict(st)
        # depend on a REVERSE output (cml_t_i): forward-only dependence
        # lets XLA DCE the reverse sweep
        st["t"] = st["t"] + jnp.asarray(1e-30, st["t"].dtype) * tends["cml_t_i"]
        return st

    return jax.lax.fori_loop(0, n, body, dict(state))["t"]


def fetch(x):
    return float(jnp.sum(x[0]))


def main():
    live = []
    for ix, combo in enumerate(COMBOS):
        label = "{}:kb={},wb={},u={},fu={},fkb={}".format(*combo)
        try:
            t0 = time.time()
            fetch(chain(state, SHORT, ix))
            fetch(chain(state, LONG, ix))
            print(json.dumps({"combo": label, "compile_s": time.time() - t0}),
                  flush=True)
            live.append((ix, label))
        except Exception as e:
            print(json.dumps({"combo": label, "error": str(e)[:200]}), flush=True)

    per = {ix: [] for ix, _ in live}
    for _ in range(SAMPLES):
        for ix, _ in live:  # interleaved: drift hits all combos equally
            t0 = time.perf_counter()
            fetch(chain(state, SHORT, ix))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            fetch(chain(state, LONG, ix))
            tl = time.perf_counter() - t0
            per[ix].append((tl - ts) / (LONG - SHORT))
    for ix, label in live:
        med = float(np.median(per[ix]))
        print(json.dumps({
            "combo": label,
            "per_step_ms": med * 1e3, "cols_per_sec": NCOLS / med,
        }), flush=True)


if __name__ == "__main__":
    main()
