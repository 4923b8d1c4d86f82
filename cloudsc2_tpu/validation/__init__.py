
# Copyright 2026.
# Licensed under the Apache License, Version 2.0.
"""Scientific validation protocols: golden-file compare, Taylor test, symmetry test."""
