
# Copyright 2026.
# Licensed under the Apache License, Version 2.0.
"""Physics operators: saturation, nonlinear / tangent-linear / adjoint CLOUDSC2."""
