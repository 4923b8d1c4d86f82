
# Copyright 2026.
# Licensed under the Apache License, Version 2.0.
"""Structural smoke tests for the headline benchmark (bench.py).

The driver runs bench.py on real TPU hardware at the end of every round and
json-parses its single output line; a structural regression there (a chain
whose fori_loop carry changes pytree structure, a renamed state key, a
Pallas-ineligible shape) would silently cost the round's benchmark artifact.
``jax.eval_shape`` traces the full chain — including the Pallas kernels'
abstract evaluation — without needing a TPU, so these tests catch that
class of bug on CPU in seconds.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bench
from cloudsc2_tpu import make_constants


@pytest.fixture(scope="module")
def states():
    c = make_constants(lphylin=True, ldrain1d=False)
    # smallest Pallas-eligible width (8 * WB lanes)
    state, dt = bench.build_nl_state(ncols=4096)
    s_tl = bench.build_tl_state(state, dt, c)
    return state, s_tl, dt, c


def test_chain_nl_traces(states):
    state, _, dt, c = states
    out = jax.eval_shape(lambda s: bench.chain_nl(s, 8, dt, c), state)
    assert out.shape == state["t"].shape and out.dtype == state["t"].dtype


def test_chain_tl_traces(states):
    _, s_tl, dt, c = states
    out = jax.eval_shape(lambda s: bench.chain_tl(s, 4, dt, c), s_tl)
    assert out.shape == s_tl["t"].shape


def test_chain_ad_traces(states):
    _, s_tl, dt, c = states
    from cloudsc2_tpu.pallas.tangent_linear import cloudsc2_tl_pallas

    tends_tl, diags_tl = jax.eval_shape(
        lambda s: cloudsc2_tl_pallas(s, dt, c), s_tl
    )
    # seed the AD state with abstract TL outputs: eval_shape composes
    s_ad_abs = dict(
        {k: jax.ShapeDtypeStruct(v.shape, v.dtype) for k, v in s_tl.items()}
    )
    s_ad_abs = bench.build_ad_state(s_ad_abs, tends_tl, diags_tl)
    out = jax.eval_shape(lambda s: bench.chain_ad(s, 4, dt, c), s_ad_abs)
    assert out.shape == s_tl["t"].shape


def test_chain_nl_traces_tiled(states):
    """The bench's timed chains run on tiled-native storage (round 5);
    the tiled NL chain must trace end-to-end on CPU."""
    from cloudsc2_tpu.pallas.levelscan import tile_field

    state, _, dt, c = states
    st = {
        k: (tile_field(v, 512) if getattr(v, "ndim", 0) == 2 else v)
        for k, v in state.items()
    }
    out = jax.eval_shape(lambda s: bench.chain_nl(s, 8, dt, c), st)
    assert out.shape == st["t"].shape and out.dtype == st["t"].dtype


def test_roofline_denominator():
    # 14 full + 1 interface inputs, 6 full + 4 interface outputs, f32
    bpc = bench.bytes_per_column(137, 4)
    assert bpc == 4 * ((14 + 6) * 137 + (1 + 4) * 138)
    assert bench.device_bandwidth() > 0


def test_unavailable_device_still_prints_one_json_line(monkeypatch, capsys):
    """With the tunnel down for every probe attempt, main() must emit the
    single JSON line (error form) instead of touching the backend — the
    observed outage mode BLOCKS in the axon client constructor, which
    would hang the driver."""
    import json

    monkeypatch.setattr(bench, "wait_for_device", lambda **kw: False)
    bench.main()
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["metric"] == "nl_columns_per_sec" and "error" in rec
    assert rec["value"] == 0.0 and rec["vs_baseline"] == 0.0


def test_wait_for_device_survives_blocking_probe(monkeypatch):
    """A probe subprocess that exceeds its timeout (the blocking outage
    mode) must count as a failed attempt, not raise out of
    wait_for_device."""
    import subprocess

    calls = {"n": 0}

    def fake_run(*a, **kw):
        calls["n"] += 1
        raise subprocess.TimeoutExpired(cmd=a[0], timeout=kw.get("timeout", 0))

    # wait_for_device does a function-local ``import subprocess``, so
    # patching the module attribute covers it
    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.wait_for_device(attempts=3, delay_s=0.0) is False
    assert calls["n"] == 3


def test_emit_prints_exactly_once(capsys):
    """_emit is the single JSON-line gate: a second call (e.g. the watchdog
    racing the success print at the budget boundary, ADVICE r3) is a no-op."""
    import json

    bench._DONE.clear()
    try:
        bench._emit({"metric": "m", "value": 1.0})
        bench._emit({"metric": "m", "value": 2.0})
        lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
        assert len(lines) == 1
        assert json.loads(lines[0])["value"] == 1.0
    finally:
        bench._DONE.clear()


def test_watchdog_noop_after_done(capsys):
    """Once the result line is out, the watchdog thread must neither print
    nor exit the process (it would os._exit(2) otherwise — this test
    surviving IS the assertion)."""
    bench._DONE.set()
    try:
        bench._watchdog_fire()
        assert capsys.readouterr().out == ""
    finally:
        bench._DONE.clear()


def test_critical_path_census():
    """The serial-roofline numerators (weighted jaxpr DAG depths of one
    nl_level): carry-to-carry chain <= all-inputs body chain <= weighted
    issue total, all positive (VERDICT r3 item 1)."""
    from cloudsc2_tpu.utils.opcensus import nl_step_ops_per_column

    c = make_constants(lphylin=True, ldrain1d=False)
    ops = nl_step_ops_per_column(c, 600.0, 137)
    crit_carry = ops["crit_carry_ops_per_col"]
    crit_body = ops["crit_body_ops_per_col"]
    assert 0 < crit_carry <= crit_body <= ops["weighted_ops_per_col"]
    # per-level sanity band: the carry recurrence is a substantial fraction
    # of the body, and both are far below the issue total per level
    assert 50 < crit_carry / 137 < 500, crit_carry / 137
    assert ops["flops_per_col"] < ops["issue_ops_per_col"]


def test_critical_path_toy():
    """critical_path on a hand-checkable function: depth counts the longest
    weighted chain, and the carry chain ignores paths from non-carry args."""
    from cloudsc2_tpu.utils.opcensus import critical_path

    def f(carry, x):
        # carry chain: carry * x + 1  -> 2 ops deep from carry
        new_carry = carry * x + 1.0
        # output chain from x only: x / x (div weight 14) then + carry
        out = x / x + new_carry
        return new_carry, out

    a = jnp.ones((8,), jnp.float32)
    paths = critical_path(f, (a, a), carry_in=1, carry_out=1)
    assert paths["carry_depth"] == 2.0, paths
    # body: div(14) + add(1) = 15 through the out chain
    assert paths["body_depth"] == 15.0, paths


def test_compute_roofline_census():
    """The compute-roofline numerator (static issued-op census of the full
    forward step) stays in the documented band (~410 issued ops per
    level-column) and the weighted total stays above it (weights >= 1)."""
    from cloudsc2_tpu.utils.opcensus import nl_step_ops_per_column

    c = make_constants(lphylin=True, ldrain1d=False)
    ops = nl_step_ops_per_column(c, 600.0, 137)
    per_level = ops["issue_ops_per_col"] / 137
    assert 300 < per_level < 600, per_level
    assert ops["weighted_ops_per_col"] > ops["issue_ops_per_col"]


def test_vpu_op_rate_chain_traces():
    """The roofline-denominator microbench chain traces (structure smoke;
    the measured rate itself only means something on the chip)."""
    x = jnp.full((137, 65536), 1.2345, jnp.float32)
    # reach into the closure: rebuild the same chain shape eval_shape-ably
    out = jax.eval_shape(
        lambda v: jax.lax.fori_loop(0, 2, lambda _, y: y * (2.0 - y), v), x
    )
    assert out.shape == x.shape and out.dtype == x.dtype
