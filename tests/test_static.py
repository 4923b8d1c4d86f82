
# Copyright 2026.
# Licensed under the Apache License, Version 2.0.
"""Static checks — the runnable subset of the pre-commit parity config.

The reference ships a working pre-commit + mypy harness
(``/root/reference/.pre-commit-config.yaml:1-33``, ``pyproject.toml:76-95``).
This environment has no network egress and no pre-commit/mypy installed
(documented attempt: ``pip install`` of any git dependency fails at
``git clone``), so the hooks that CAN run without external tools are
enforced here, in CI, where they cannot rot:

* ``check-ast`` — every source file parses;
* ``debug-statements`` — no ``pdb``/``breakpoint()`` left behind;
* ``python-check-blanket-noqa`` / ``python-check-blanket-type-ignore`` —
  suppressions must name their code;
* **mypy, whenever it is available**: the last test invokes the configured
  scope (``pyproject.toml [tool.mypy]``) and fails on errors; on this
  image it skips with the documented reason instead of silently passing.
"""
from __future__ import annotations

import ast
import pathlib
import re
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
SCOPES = ["cloudsc2_tpu", "drivers", "tests", "benchmarks"]
TOP_LEVEL = ["bench.py", "__graft_entry__.py"]


def _sources():
    for scope in SCOPES:
        yield from sorted((REPO / scope).rglob("*.py"))
    for name in TOP_LEVEL:
        yield REPO / name


def test_all_sources_parse():
    """check-ast: every file in the package, drivers, tests, benchmarks
    and the top-level entry points parses."""
    count = 0
    for path in _sources():
        ast.parse(path.read_text(), filename=str(path))
        count += 1
    assert count > 40, count  # sanity: the walk actually found the tree


def test_no_debug_statements():
    """debug-statements: no pdb/ipdb imports or breakpoint() calls."""
    offenders = []
    for path in _sources():
        tree = ast.parse(path.read_text(), filename=str(path))
        for node in ast.walk(tree):
            if isinstance(node, (ast.Import, ast.ImportFrom)):
                names = [a.name for a in node.names] + (
                    [node.module] if isinstance(node, ast.ImportFrom) else []
                )
                if any(n in ("pdb", "ipdb") for n in names if n):
                    offenders.append(f"{path}:{node.lineno}")
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Name)
                and node.func.id == "breakpoint"
            ):
                offenders.append(f"{path}:{node.lineno}")
    assert not offenders, offenders


BLANKET_NOQA = re.compile(r"#\s*noqa\s*(?!:)", re.IGNORECASE)
BLANKET_IGNORE = re.compile(r"#\s*type:\s*ignore\s*(?!\[)")


def test_no_blanket_suppressions():
    """python-check-blanket-noqa / -type-ignore: every suppression names
    its code (``# noqa: E731``, ``# type: ignore[attr-defined]``)."""
    offenders = []
    for path in _sources():
        for i, line in enumerate(path.read_text().splitlines(), 1):
            if BLANKET_NOQA.search(line) or BLANKET_IGNORE.search(line):
                offenders.append(f"{path}:{i}: {line.strip()}")
    assert not offenders, offenders


def test_mypy_clean_when_available():
    """Run mypy over the configured scope (pyproject [tool.mypy]) and
    require a clean exit.  Skips — visibly, with the environment blocker —
    when mypy is not installed; on any machine with mypy this test makes
    the config real (VERDICT r4 next #7).

    NOTE for the first machine that has mypy: the scope has never been
    type-checked (mypy is uninstallable here), so a red first run is the
    INTENDED signal — fix the reported errors (or consciously narrow the
    ``[tool.mypy]`` scope in pyproject.toml); do not delete this test,
    which exists precisely so the config cannot stay decorative."""
    try:
        import mypy  # noqa: F401
    except ImportError:
        pytest.skip(
            "mypy not installed and not installable here (no network "
            "egress: pip install fails at git clone; see BASELINE.md "
            "head-to-head blocker) — config at pyproject.toml [tool.mypy]"
        )
    proc = subprocess.run(
        [sys.executable, "-m", "mypy", "cloudsc2_tpu", "drivers"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
