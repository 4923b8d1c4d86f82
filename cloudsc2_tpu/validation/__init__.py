# Copyright 2026.
# Licensed under the Apache License, Version 2.0.
"""Scientific validation protocols: golden-file compare, Taylor test, symmetry test."""
from cloudsc2_tpu.validation.symmetry import SymmetryTest
from cloudsc2_tpu.validation.taylor import TaylorTest

__all__ = ["SymmetryTest", "TaylorTest"]
