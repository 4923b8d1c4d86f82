
# Copyright 2026.
# Licensed under the Apache License, Version 2.0.
"""Auxiliary diagnostics: reference eta levels.

Reference: ``src/cloudsc2_gt4py/physics/common/diagnostics.py:28-45`` — the
eta coordinate is diagnosed from column 0 only (it is globally uniform
across columns): ``eta[k] = ap[0, 0, k] / aph[0, 0, nz]``.
"""
from __future__ import annotations

import jax.numpy as jnp


def eta_levels(ap: jnp.ndarray, aph: jnp.ndarray) -> jnp.ndarray:
    """Diagnose the 1-D eta coordinate from ``(nlev, ncols)`` pressures."""
    return ap[:, 0] / aph[-1, 0]
