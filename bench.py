
# Copyright 2026.
# Licensed under the Apache License, Version 2.0.
"""Headline benchmark: NL scheme throughput (columns/sec) on one chip.

Protocol follows the reference driver (``drivers/run_nonlinear.py:109-119``:
warm-up, then timed iterations), adapted to a remote-attached TPU where
host<->device roundtrips cost seconds: the timed unit is a *chain* of
physics steps inside a single jitted ``lax.fori_loop`` (each step feeds the
updated prognostic state back in, so steps cannot be collapsed), and the
per-step time is the difference between a long and a short chain — host
latency and dispatch overhead cancel exactly.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline``
reports the fraction of HBM speed-of-light throughput on the attached chip
— the roofline metric named in BASELINE.json.  The scheme is memory-bound,
so HBM bytes/column sets the ceiling.

Prints exactly one JSON line.
"""
from __future__ import annotations

import json
import time
from functools import partial

import jax

# persistent compile cache: Mosaic compiles of the kernels cost minutes
# through the remote-TPU tunnel (the .gt_cache analogue)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from cloudsc2_tpu import iox, make_constants
from cloudsc2_tpu.parallel.step import forward_step

NCOLS = 1 << 16  # 65,536 columns
NLEV = 137
SYNTH_COLS = 4096  # host-side synthesis size; tiled to NCOLS on device
CHAIN_LONG = 64
CHAIN_SHORT = 8
REPEATS = 3
DTYPE = jnp.float32

#: HBM bandwidth (bytes/sec) by TPU generation, for the roofline denominator
HBM_BW = {
    "v4": 1.23e12,
    "v5e": 8.19e11,
    "v5 lite": 8.19e11,
    "v5lite": 8.19e11,
    "v5p": 2.765e12,
    "v6e": 1.64e12,
    "cpu": 5.0e10,
}


def device_bandwidth() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, bw in HBM_BW.items():
        if key in kind:
            return bw
    return HBM_BW["v5e"]


def bytes_per_column(nlev: int, itemsize: int) -> int:
    """Minimum HBM traffic per column per step: 14 full-level inputs + 1
    interface input, 6 full-level + 4 interface outputs (qsat/eta fused)."""
    full_in, iface_in, full_out, iface_out = 14, 1, 6, 4
    return itemsize * (
        (full_in + full_out) * nlev + (iface_in + iface_out) * (nlev + 1)
    )


@partial(jax.jit, static_argnames=("n", "dt", "c"))
def chain(state, n, dt, c):
    """n physics steps, each consuming the previous step's updated state."""

    def body(_, s):
        tends, diags = forward_step(s, dt, c)
        s = dict(s)
        # minimal data dependence between steps (physically negligible, but
        # prevents XLA from collapsing the chain); the timed unit stays the
        # reference's saturation + NL on an unchanged state
        # (run_nonlinear.py:115-119)
        s["t"] = s["t"] + jnp.asarray(1e-30, s["t"].dtype) * tends["t"]
        return s

    s = jax.lax.fori_loop(0, n, body, dict(state))
    return s["t"]


def fetch(x) -> float:
    """Force execution + D2H of one scalar (block_until_ready alone does not
    synchronize through the remote-TPU tunnel)."""
    return float(jnp.sum(x[0]))


def main() -> None:
    _, state_np, dt = iox.synthesize_input(ncols=SYNTH_COLS, nlev=NLEV, seed=0)
    c = make_constants(lphylin=True, ldrain1d=False)
    reps = NCOLS // SYNTH_COLS
    state = {
        k: (
            jnp.tile(jnp.asarray(v, DTYPE), (1, reps))
            if v.ndim == 2
            else jnp.asarray(v, DTYPE)
        )
        for k, v in state_np.items()
    }

    # warm-up / compile both chain lengths
    fetch(chain(state, CHAIN_SHORT, dt, c))
    fetch(chain(state, CHAIN_LONG, dt, c))

    per_step = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        fetch(chain(state, CHAIN_SHORT, dt, c))
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        fetch(chain(state, CHAIN_LONG, dt, c))
        t_long = time.perf_counter() - t0
        per_step.append((t_long - t_short) / (CHAIN_LONG - CHAIN_SHORT))
    runtime = float(np.min(per_step))  # min is robust to tunnel hiccups
    cols_per_sec = NCOLS / runtime

    sol = device_bandwidth() / bytes_per_column(NLEV, np.dtype(DTYPE.__name__).itemsize)
    print(
        json.dumps(
            {
                "metric": "nl_columns_per_sec",
                "value": cols_per_sec,
                "unit": "columns/s",
                "vs_baseline": cols_per_sec / sol,
            }
        )
    )


if __name__ == "__main__":
    main()
