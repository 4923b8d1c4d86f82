"""A/B the MASK_SELECT lowering (float-mask multiplies vs vector selects).

``Constants.MASK_SELECT=True`` rewrites every ``where(p, x, 0)``-class site
in the level bodies as a shared-float-mask multiply (``fastmath.sel0``) —
bit-identical NL/TL results (tests/test_nonlinear.py::test_mask_select_bit_exact).
Static census (benchmarks/opcount.py): NL 31→16 selects (+12 mul),
TL 56→21 (+34 mul), AD reverse 80→25 (+49 mul); select measured ~4 VPU
op-equivalents vs mul ~1 (microbench_ops.py), so if the kernels are
op-issue-bound this predicts a few-percent win.

Protocol: same process, kernels at their shipped default tiles, modes
interleaved (False/True alternating, median of 5 chain-difference samples
each) so tunnel drift cancels.  Run with
PYTHONPATH=/root/repo:/root/.axon_site (see benchmarks/README.md).
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
from cloudsc2_tpu.physics.increment import state_increment
from cloudsc2_tpu.pallas.nonlinear import cloudsc2_nl_pallas
from cloudsc2_tpu.pallas.tangent_linear import cloudsc2_tl_pallas
from cloudsc2_tpu.pallas.adjoint import cloudsc2_ad_pallas
from cloudsc2_tpu.validation.symmetry import DIAG_NAMES, TEND_NAMES

NCOLS = 1 << 16
NLEV = 137
LONG, SHORT = 32, 4
SAMPLES = 5

_, s, dt = iox.synthesize_input(ncols=4096, nlev=NLEV, seed=0, dtype=np.float32)
reps = NCOLS // 4096
state = {
    k: (jnp.tile(jnp.asarray(v, jnp.float32), (1, reps)) if v.ndim == 2 else jnp.asarray(v, jnp.float32))
    for k, v in s.items()
}
CONSTS = {
    False: make_constants(lphylin=True, ldrain1d=False),
    True: make_constants(lphylin=True, ldrain1d=False).replace(MASK_SELECT=True),
}
state["eta"] = eta_levels(state["ap"], state["aph"])
state["qsat"] = saturation(state["ap"], state["t"], kflag=1, lphylin=True, c=CONSTS[False])
state.update(state_increment(state, 0.01, ignore_supsat=True))
tt, dd = cloudsc2_tl_pallas(state, dt, CONSTS[False])
for n in TEND_NAMES:
    state["tnd_" + n] = tt[n]
    state["tnd_" + n + "_i"] = tt[n + "_i"]
for n in DIAG_NAMES:
    state[n + "_i"] = dd[n + "_i"]
state = {k: jax.device_put(v) for k, v in state.items()}


@partial(jax.jit, static_argnames=("n", "kernel", "ms"))
def chain(state, n, kernel, ms):
    c = CONSTS[ms]

    def body(_, st):
        st = dict(st)
        if kernel == "nl":
            tends, _d = cloudsc2_nl_pallas(st, dt, c)
            dep = tends["t"]
        elif kernel == "tl":
            tends, _d = cloudsc2_tl_pallas(st, dt, c)
            dep = tends["t_i"]
        else:
            tends, _d = cloudsc2_ad_pallas(st, dt, c)
            # depend on a REVERSE-kernel output, else XLA DCEs the reverse
            dep = tends["cml_t_i"]
        st["t"] = st["t"] + jnp.asarray(1e-30, st["t"].dtype) * dep
        return st

    return jax.lax.fori_loop(0, n, body, dict(state))["t"]


def fetch(x):
    return float(jnp.sum(x[0]))


def sample(kernel, ms):
    t0 = time.perf_counter()
    fetch(chain(state, SHORT, kernel, ms))
    ts = time.perf_counter() - t0
    t0 = time.perf_counter()
    fetch(chain(state, LONG, kernel, ms))
    tl = time.perf_counter() - t0
    return (tl - ts) / (LONG - SHORT)


KERNELS = {"nl": cloudsc2_nl_pallas, "tl": cloudsc2_tl_pallas, "ad": cloudsc2_ad_pallas}

for kernel in ("nl", "tl", "ad"):
    try:
        # compiled-Mosaic cross-check: the two lowerings must agree on
        # hardware too (interpret-mode bit-equality is asserted in tests;
        # AD tolerance covers the reassociated vjp accumulation)
        outs = {}
        for ms in (False, True):
            tends, _d = KERNELS[kernel](state, dt, CONSTS[ms])
            outs[ms] = {k: np.asarray(v) for k, v in tends.items()}
        worst = max(
            float(np.max(np.abs(outs[False][k] - outs[True][k])
                         / np.maximum(np.abs(outs[False][k]), 1e-30)))
            for k in outs[False]
        )
        assert worst < (1e-5 if kernel == "ad" else 1e-30), (kernel, worst)
        t0 = time.time()
        for ms in (False, True):  # compile both before timing either
            fetch(chain(state, SHORT, kernel, ms))
            fetch(chain(state, LONG, kernel, ms))
        compile_s = time.time() - t0
        per = {False: [], True: []}
        for _ in range(SAMPLES):
            for ms in (False, True):
                per[ms].append(sample(kernel, ms))
        med = {ms: sorted(v)[len(v) // 2] for ms, v in per.items()}
        print(json.dumps({
            "kernel": kernel,
            "select_cols_per_sec": NCOLS / med[False],
            "mask_cols_per_sec": NCOLS / med[True],
            "mask_over_select": med[False] / med[True],
            "per_step_ms": {"select": med[False] * 1e3, "mask": med[True] * 1e3},
            "compile_s": compile_s,
        }), flush=True)
    except Exception as e:
        print(json.dumps({"kernel": kernel, "error": str(e)[:200]}), flush=True)
