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

Component-level ``"auto"`` resolution (pick Pallas when it is known to
work) lives in :func:`cloudsc2_tpu.components._select_impl` and
:func:`cloudsc2_tpu.parallel.step._use_pallas`.
"""
from __future__ import annotations

from typing import Callable, Tuple


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
