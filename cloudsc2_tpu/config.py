
# Copyright 2026.
# Licensed under the Apache License, Version 2.0.
"""Immutable configuration objects with ``with_*`` builders.

Rebuild of the ``ifs_physics_common.framework.config`` surface
(``PythonConfig`` / ``GT4PyConfig`` / ``IOConfig`` / ``DataTypes``,
SURVEY.md §2.2; usage ``drivers/config.py:22-48``,
``drivers/run_nonlinear.py:112, 210-218``) as frozen dataclasses.  The
GT4Py backend string is replaced by a JAX platform + precision pair — the
XLA analogue of selecting a backend — and the compile-time ``exec_info``
timing dict by the :class:`~cloudsc2_tpu.utils.timing.Timer` accumulator.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Optional

import numpy as np


@dataclass(frozen=True)
class DataTypes:
    """Precision-resolved dtypes (reference ``DataTypes`` in drivers/config.py:41-44)."""

    bool: Any = np.bool_
    float: Any = np.float64
    int: Any = np.int64


@dataclass(frozen=True)
class JaxConfig:
    """Execution backend configuration (the GT4PyConfig analogue).

    ``platform``: "tpu" | "cpu" | None (None = environment default).
    ``rebuild`` maps to clearing the persistent XLA compilation cache;
    ``validate_args`` enables shape/name checks in the component layer.
    """

    platform: Optional[str] = None
    rebuild: bool = False
    validate_args: bool = False
    verbose: bool = True
    dtypes: DataTypes = dataclasses.field(default_factory=DataTypes)
    #: persistent compilation cache — the analogue of the reference's
    #: ``.gt_cache`` compiled-stencil cache (``.gitignore:6``,
    #: ``rebuild=False`` in ``drivers/config.py:45``); indispensable here
    #: because Mosaic compiles of the TL/AD kernels take minutes
    cache_dir: Optional[str] = ".jax_cache"

    def apply(self) -> None:
        """Apply platform / x64 / compile-cache settings to the live JAX
        process."""
        import jax

        if self.platform is not None:
            jax.config.update("jax_platforms", self.platform)
            if not jax.devices() or jax.devices()[0].platform != self.platform:
                from jax.extend import backend as _backend

                _backend.clear_backends()
        if self.dtypes.float == np.float64:
            jax.config.update("jax_enable_x64", True)
        if self.cache_dir and not self.rebuild:
            jax.config.update("jax_compilation_cache_dir", self.cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@dataclass(frozen=True)
class IOConfig:
    """Driver I/O configuration (reference ``IOConfig``)."""

    output_csv_file: Optional[str] = None
    output_csv_file_stencils: Optional[str] = None
    host_name: str = "localhost"

    def with_output_csv_file(self, f: Optional[str]) -> "IOConfig":
        return dataclasses.replace(self, output_csv_file=f)

    def with_output_csv_file_stencils(self, f: Optional[str]) -> "IOConfig":
        return dataclasses.replace(self, output_csv_file_stencils=f)

    def with_host_name(self, h: str) -> "IOConfig":
        return dataclasses.replace(self, host_name=h)


@dataclass(frozen=True)
class Config:
    """Driver configuration (reference ``drivers/config.py:25-48``)."""

    precision: str = "double"  # "double" | "single"
    num_cols: int = 100
    num_runs: int = 1
    num_threads: int = 1
    enable_checks: bool = False
    enable_validation: bool = True
    input_file: Optional[str] = None
    reference_file: Optional[str] = None
    jax_config: JaxConfig = dataclasses.field(default_factory=JaxConfig)
    sharded: bool = False
    #: initialize jax.distributed (multi-host); implies ``sharded``
    distributed: bool = False

    @property
    def dtype(self) -> Any:
        return np.float64 if self.precision == "double" else np.float32

    def with_precision(self, p: str) -> "Config":
        if p not in ("double", "single"):
            raise ValueError(f"precision must be double|single, got {p!r}")
        dt = DataTypes(float=np.float64 if p == "double" else np.float32)
        return dataclasses.replace(
            self, precision=p, jax_config=dataclasses.replace(self.jax_config, dtypes=dt)
        )

    def with_backend(self, platform: Optional[str]) -> "Config":
        return dataclasses.replace(
            self, jax_config=dataclasses.replace(self.jax_config, platform=platform)
        )

    def with_checks(self, enabled: bool) -> "Config":
        return dataclasses.replace(
            self,
            enable_checks=enabled,
            jax_config=dataclasses.replace(self.jax_config, validate_args=enabled),
        )

    def with_validation(self, enabled: bool) -> "Config":
        return dataclasses.replace(self, enable_validation=enabled)

    def with_num_cols(self, n: int) -> "Config":
        return dataclasses.replace(self, num_cols=n)

    def with_num_runs(self, n: int) -> "Config":
        return dataclasses.replace(self, num_runs=n)

    def with_input_file(self, f: Optional[str]) -> "Config":
        return dataclasses.replace(self, input_file=f)

    def with_reference_file(self, f: Optional[str]) -> "Config":
        return dataclasses.replace(self, reference_file=f)

    def with_sharded(self, s: bool) -> "Config":
        return dataclasses.replace(self, sharded=s)

    def with_distributed(self, d: bool) -> "Config":
        return dataclasses.replace(self, distributed=d, sharded=self.sharded or d)


DEFAULT_CONFIG = Config()
DEFAULT_IO_CONFIG = IOConfig()
