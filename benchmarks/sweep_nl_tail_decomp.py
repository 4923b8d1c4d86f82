"""Decompose the xla_pre NL step: XLA phase A alone vs tail kernel alone.

The full xla_pre step measured 6.8 ms vs the merged kernel's 4.18 ms
(sweep_nl_xlapre.py).  This separates the two pieces to attribute the
regression: if the tail kernel alone dominates, the phase-B serial chain is
latency-bound once the phase-A work that used to hide it is gone — then
wider lane tiles (more vregs in flight per op) should recover it.
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
from cloudsc2_tpu.physics.nonlinear import (
    NLCarry, critical_rh_coeffs, nl_level_post, nl_level_pre, scalm_profile,
    tropopause_eta,
)
from cloudsc2_tpu.pallas.levelscan import level_scan_pallas

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
state["qsat"] = saturation(state["ap"], state["t"], kflag=1, lphylin=True, c=c)

TAIL_KEYS = (
    "ap", "lude", "t2", "q2", "qi_fg", "clc", "qiwc1", "prr", "cldi",
    "condl1", "condi1", "z2s", "dp", "gdp",
)


def phase_a(st):
    dtype = st["ap"].dtype
    eta = st["eta"].astype(dtype)
    t_fg = st["t"] + dt * st["tnd_cml_t"]
    trpaus = tropopause_eta(eta, t_fg)
    lu = st["lu"]
    x = {
        "ap": st["ap"], "aph0": st["aph"][:-1], "aph1": st["aph"][1:],
        "lu_next": jnp.concatenate([lu[1:], jnp.zeros_like(lu[:1])], axis=0),
        "lude": st["lude"], "mfd": st["mfd"], "mfu": st["mfu"],
        "q": st["q"], "qi": st["qi"], "ql": st["ql"], "qsat": st["qsat"],
        "supsat": st["supsat"], "t_fg": t_fg,
        "tnd_cml_q": st["tnd_cml_q"], "tnd_cml_qi": st["tnd_cml_qi"],
        "tnd_cml_ql": st["tnd_cml_ql"],
        "eta": eta[:, None], "scalm": scalm_profile(eta, c)[:, None],
    }
    rh2, deta1, rsq = critical_rh_coeffs(trpaus)
    x.update(crh_rh2=rh2, crh_deta1=deta1, crh_rsq=rsq)
    pre = nl_level_pre(x, st["aph"][-1], trpaus, dt, c)
    out = {"t2": t_fg, "ap": st["ap"], "lude": st["lude"]}
    for k in TAIL_KEYS:
        if k not in out:
            out[k] = pre[k]
    out["tnd_ql"] = pre["tnd_ql"]
    return out


@partial(jax.jit, static_argnames=("n",))
def chain_pre(st, n):
    def body(_, carry):
        st2 = dict(st)
        st2["t"] = st2["t"] + carry * jnp.asarray(1e-30, st2["t"].dtype)
        pre = phase_a(st2)
        # consume one row of every phase-A output so none is DCE'd
        return carry + sum(jnp.sum(v[0, :8]) for v in pre.values())

    return jax.lax.fori_loop(0, n, body, jnp.zeros((), st["t"].dtype))


def tail_call(streams, kb, wb, unroll):
    def body(carry, x, col, _g):
        carry, outs, _aux = nl_level_post(NLCarry(*carry), x, dt, c)
        return tuple(carry), outs

    return level_scan_pallas(
        body,
        level_inputs=streams,
        col_inputs={},
        scalar_inputs={},
        out_names=("tnd_t", "tnd_q", "tnd_qi", "covptot", "fplsl", "fplsn"),
        ncarry=3,
        kb=kb,
        wb=wb,
        unroll=unroll,
    )


@partial(jax.jit, static_argnames=("n", "kb", "wb", "unroll"))
def chain_tail(streams, n, kb, wb, unroll):
    def body(_, st):
        outs = tail_call(st, kb, wb, unroll)
        st = dict(st)
        st["t2"] = st["t2"] + jnp.asarray(1e-30, st["t2"].dtype) * outs["tnd_t"]
        return st

    return jax.lax.fori_loop(0, n, body, dict(streams))["t2"]


def fetch(x):
    return float(jnp.sum(jnp.ravel(x)[:8]))


streams = {k: v for k, v in jax.jit(phase_a)(state).items() if k != "tnd_ql"}

jobs = [("phase_a_xla", lambda n: chain_pre(state, n))]
for kb, wb, unroll in [(16, 512, 2), (8, 1024, 1), (4, 2048, 1), (4, 1024, 1), (8, 2048, 1)]:
    jobs.append((
        f"tail kb={kb} wb={wb} u={unroll}",
        lambda n, kb=kb, wb=wb, u=unroll: chain_tail(streams, n, kb, wb, u),
    ))

ok = []
for name, fn in jobs:
    try:
        t0 = time.time()
        fetch(fn(SHORT)); fetch(fn(LONG))
        print(json.dumps({"job": name, "compile_s": round(time.time() - t0, 1)}), flush=True)
        ok.append((name, fn, []))
    except Exception as e:
        print(json.dumps({"job": name, "error": str(e)[:160]}), flush=True)

for _ in range(ROUNDS):
    for name, fn, samples in ok:
        t0 = time.perf_counter(); fetch(fn(SHORT)); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); fetch(fn(LONG)); tl = time.perf_counter() - t0
        samples.append((tl - ts) / (LONG - SHORT))

for name, fn, samples in ok:
    per = sorted(samples)[len(samples) // 2]
    print(json.dumps({
        "job": name, "per_step_ms": round(per * 1e3, 3),
        "cols_per_sec": round(NCOLS / per),
    }), flush=True)
