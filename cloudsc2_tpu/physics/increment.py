
# Copyright 2026.
# Licensed under the Apache License, Version 2.0.
"""State increment and perturbed state for the TL/AD validation protocols.

JAX re-implementation of the ``state_increment`` and ``perturbed_state``
stencils (``src/cloudsc2_gt4py/physics/common/_stencils/state_increment.py:
22-80`` and ``perturbed_state.py:22-91``) and their components
(``physics/common/increment.py:32-261``).

Both are trivially pointwise; they operate on state dicts keyed by the
reference field names without the ``f_`` prefix.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

Array = jnp.ndarray

#: the 16 perturbed fields (reference ``state_increment.py:62-80``)
INCREMENT_FIELDS = (
    "aph",
    "ap",
    "q",
    "qsat",
    "t",
    "ql",
    "qi",
    "lude",
    "lu",
    "mfu",
    "mfd",
    "tnd_cml_t",
    "tnd_cml_q",
    "tnd_cml_ql",
    "tnd_cml_qi",
    "supsat",
)


def state_increment(
    state: Dict[str, Array], factor: float, *, ignore_supsat: bool = False
) -> Dict[str, Array]:
    """Produce the perturbation dict ``{name}_i = factor * {name}``.

    ``ignore_supsat`` zeroes the supersaturation increment, as used by the
    symmetry test (reference ``state_increment.py:77-80``,
    ``adjoint/validation.py:116-122``).
    """
    out = {}
    for name in INCREMENT_FIELDS:
        if name == "supsat" and ignore_supsat:
            out[name + "_i"] = jnp.zeros_like(state[name])
        else:
            out[name + "_i"] = factor * state[name]
    return out


def perturbed_state(state: Dict[str, Array], factor: float) -> Dict[str, Array]:
    """Produce ``{name} = {name} + factor * {name}_i`` for the 16 fields.

    Reference ``perturbed_state.py:22-91``.  Fields not perturbed (``eta``)
    are passed through unchanged.
    """
    out = dict(state)
    for name in INCREMENT_FIELDS:
        out[name] = state[name] + factor * state[name + "_i"]
    return out
