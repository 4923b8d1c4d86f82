# Copyright 2026.
# Licensed under the Apache License, Version 2.0.
"""Implementation dispatch: one place mapping an ``impl`` string to the
scheme functions.

``impl`` values (the TPU analogue of the reference's GT4Py ``--backend``
strings, ``run_nonlinear.py:156-158``):

- ``"scan"`` — ``lax.scan`` paths; any platform and precision (the f64
  oracle).
- ``"pallas"`` — hand-written TPU kernels; f32 and lane-aligned columns
  required (:func:`cloudsc2_tpu.pallas.levelscan.level_scan_pallas` raises
  a clear ``ValueError`` otherwise).
- ``"pallas-interpret"`` — the kernels in interpreter mode (CPU testing).

``"auto"`` resolution (pick Pallas when it is known to work) is
:func:`use_pallas` below, shared by the component layer and the step
functions.
"""
from __future__ import annotations

from typing import Callable, Mapping, Tuple


def use_pallas(state: Mapping, impl: str) -> bool:
    """One auto/explicit Pallas eligibility predicate for every entry point.

    Explicit ``pallas``/``pallas-interpret`` always selects the kernel (it
    raises a clear ValueError on f64 or ragged columns rather than silently
    degrading to scan); ``auto`` picks the kernel only when it is known to
    work: f32, lane-aligned columns, accelerator backend.
    """
    if impl in ("pallas", "pallas-interpret"):
        return True
    if impl != "auto":
        return False
    import jax
    import jax.numpy as jnp

    from cloudsc2_tpu.pallas.nonlinear import WB

    ap = state["ap"]
    return (
        ap.dtype == jnp.float32
        and ap.shape[1] % (8 * WB) == 0
        and jax.default_backend() != "cpu"
    )


def nl_tl_fns(impl: str) -> Tuple[Callable, Callable]:
    """(nonlinear, tangent-linear) functions for ``impl``."""
    if impl in ("pallas", "pallas-interpret"):
        from functools import partial

        from cloudsc2_tpu.pallas.nonlinear import cloudsc2_nl_pallas
        from cloudsc2_tpu.pallas.tangent_linear import cloudsc2_tl_pallas

        interp = impl == "pallas-interpret"
        return (
            partial(cloudsc2_nl_pallas, interpret=interp),
            partial(cloudsc2_tl_pallas, interpret=interp),
        )
    from cloudsc2_tpu.physics.nonlinear import cloudsc2_nl
    from cloudsc2_tpu.physics.tangent_linear import cloudsc2_tl

    return cloudsc2_nl, cloudsc2_tl


def tl_ad_fns(impl: str) -> Tuple[Callable, Callable]:
    """(tangent-linear, adjoint) functions for ``impl``."""
    if impl in ("pallas", "pallas-interpret"):
        from functools import partial

        from cloudsc2_tpu.pallas.adjoint import cloudsc2_ad_pallas
        from cloudsc2_tpu.pallas.tangent_linear import cloudsc2_tl_pallas

        interp = impl == "pallas-interpret"
        return (
            partial(cloudsc2_tl_pallas, interpret=interp),
            partial(cloudsc2_ad_pallas, interpret=interp),
        )
    from cloudsc2_tpu.physics.adjoint import cloudsc2_ad
    from cloudsc2_tpu.physics.tangent_linear import cloudsc2_tl

    return cloudsc2_tl, cloudsc2_ad
