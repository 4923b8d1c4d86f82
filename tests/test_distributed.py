
# Copyright 2026.
# Licensed under the Apache License, Version 2.0.
"""Multi-host distribution: a real two-process JAX cluster on CPU.

The reference is single-process only (SURVEY.md §2.3); multi-host column
sharding is the new capability BASELINE.md demands.  This test launches two
OS processes (4 virtual CPU devices each — two "hosts" of a pod), runs
``jax.distributed`` initialization through
:func:`cloudsc2_tpu.parallel.mesh.initialize_distributed`, and has each
process verify its shard of a globally column-sharded forward step against
a single-process computation (see ``tests/distributed_worker.py``).
"""
import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_run_nonlinear_driver_distributed():
    """The --distributed driver path: two processes form a cluster, run the
    column-sharded hot loop, and each validates its own column block
    against the golden file (expect HOORAY from both)."""
    port = _free_port()
    nproc = 2
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    flags = [f for f in env.get("XLA_FLAGS", "").split() if "host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=4"])
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "drivers", "run_nonlinear.py"),
             "--backend", "cpu", "--num-cols", "256", "--precision", "double",
             "--distributed", "--coordinator", f"localhost:{port}",
             "--process-id", str(pid), "--num-processes", str(nproc)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"driver process {pid} failed:\n{out}"
        assert "HOORAY" in out, out


def test_two_process_cluster_forward_step():
    port = _free_port()
    nproc = 2
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "distributed_worker.py"),
             str(port), str(pid), str(nproc)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"DISTRIBUTED-OK pid={pid} devices=8" in out, out
