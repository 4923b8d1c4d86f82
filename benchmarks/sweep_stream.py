"""Streaming-sweep benchmark: 10M+ columns through one chip (VERDICT r2 #3).

Runs the column-chunked H2D/compute/D2H-reduced pipeline
(``cloudsc2_tpu/parallel/stream.py``) at the scaled-run size named in
BASELINE.json ("10M+ columns") and reports end-to-end columns/s plus the
effective H2D bandwidth, which is this mode's roofline: the resident kernel
computes a 65,536-column chunk in ~3.7 ms (~18M cols/s) while the same
chunk's inputs are ~540 MB of H2D — streaming throughput is therefore
``link_bandwidth / 8224 B/col``, not a kernel property.  The pod-scale path
keeps columns HBM-resident instead (column-DP, ``parallel/step.py``).

Usage: python benchmarks/sweep_stream.py [total_cols] [chunk_cols] [ring]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from cloudsc2_tpu import iox, make_constants
from cloudsc2_tpu.parallel.stream import stream_columns


def main():
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 10_485_760  # 160 x 65536
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 65_536
    ring = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    c = make_constants(lphylin=True, ldrain1d=False)
    _, state_np, dt = iox.synthesize_input(
        ncols=4096, nlev=137, seed=0, dtype=np.float32
    )
    stats, _ = stream_columns(
        state_np, dt, c, total_cols=total, chunk_cols=chunk, ring_size=ring,
        impl="auto",
    )
    print(json.dumps({k: v for k, v in stats.items()}), flush=True)


if __name__ == "__main__":
    main()
