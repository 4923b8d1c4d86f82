
# Copyright 2026.
# Licensed under the Apache License, Version 2.0.
"""CLI driver: nonlinear CLOUDSC2 with performance timing + validation.

Rebuild of the reference driver (``drivers/run_nonlinear.py:51-236``): load
or synthesize the input state, diagnose eta + saturation, run the nonlinear
scheme once to warm up, then ``--num-runs`` timed iterations, print
runtime/MFLOPS statistics, optionally write CSVs, and validate the outputs
against a golden HDF5 file.

TPU-first differences: the backend flag selects a JAX platform instead of a
GT4Py codegen backend; ``--sharded`` runs column-sharded over all available
devices; each timed run synchronizes with a device-to-host fetch (plain
``block_until_ready`` does not synchronize through a remote-TPU tunnel).
"""
from __future__ import annotations

import os
import sys

import click
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from drivers.config import DEFAULT_CONFIG, DEFAULT_IO_CONFIG, default_reference_file


def core(config, io_config, impl="auto"):
    import h5py
    import jax
    import jax.numpy as jnp

    from cloudsc2_tpu import iox, make_constants
    from cloudsc2_tpu.components import Cloudsc2NL, EtaLevels, Saturation
    from cloudsc2_tpu.parallel.mesh import (
        column_mesh,
        initialize_distributed,
        pad_columns,
        process_local_block,
        shard_state,
        unpad_columns,
    )
    from cloudsc2_tpu.utils.output import (
        print_performance,
        write_performance_to_csv,
        write_stencils_performance_to_csv,
    )
    from cloudsc2_tpu.utils.timing import Timer, timing
    from cloudsc2_tpu.utils.validation import validate

    if config.distributed:
        # must run before anything initializes the local XLA backend
        initialize_distributed(**getattr(config, "_dist_kwargs", {}))
    config.jax_config.apply()
    dtype = config.dtype
    multiproc = jax.process_count() > 1
    is_lead = jax.process_index() == 0

    # --- input state (reference run_nonlinear.py:54-74) ---
    # like the reference, prefer reading the input file and tiling columns
    # to --num-cols (run_nonlinear.py:174 + iox column replication): golden
    # outputs are column-periodic tiles of the same profiles, so validation
    # works at any --num-cols.  Synthesis is the fallback when no input
    # exists (the upstream data/input.h5 is a stripped blob, SURVEY.md §0).
    from drivers.config import default_input_file

    # streaming mode loads the input at its native column count — the ring
    # builder tiles per chunk; materializing --num-cols (10M+) host columns
    # up front is exactly what the mode exists to avoid
    stream_chunk = getattr(config, "_stream_chunk", None)
    load_cols = None if stream_chunk else config.num_cols

    input_file = config.input_file or default_input_file()
    if input_file:
        grid, state_np, dt, params = iox.load_input(
            input_file, ncols=load_cols, dtype=dtype
        )
        c = make_constants(lphylin=True, ldrain1d=False, **params)
    else:
        grid, state_np, dt = iox.synthesize_input(
            ncols=load_cols or 100, nlev=137, seed=0, dtype=dtype
        )
        c = make_constants(lphylin=True, ldrain1d=False)
    fast_div = getattr(config, "_fast_div", None)
    if fast_div and fast_div != "exact":
        if impl not in ("pallas", "pallas-interpret"):
            raise click.UsageError(
                "--fast-div requires --impl pallas (the hardware reciprocal "
                "only exists inside the Pallas kernels)"
            )
        c = c.replace(FAST_DIV=fast_div)

    if stream_chunk:
        # --- column-chunked streaming sweep (the out-of-HBM scaled run,
        # BASELINE.json "10M+ columns"; see cloudsc2_tpu/parallel/stream.py)
        if config.sharded or config.distributed:
            raise click.UsageError(
                "--stream-chunk is a single-chip mode (the pod-scale path "
                "keeps columns resident: --sharded/--distributed)"
            )
        from cloudsc2_tpu.parallel.stream import stream_columns

        ring_size = getattr(config, "_stream_ring", 4)
        stream_outputs = getattr(config, "_stream_outputs", False)
        stats, (tends, diags) = stream_columns(
            state_np, dt, c, total_cols=config.num_cols,
            chunk_cols=stream_chunk, ring_size=ring_size, impl=impl,
            stream_outputs=stream_outputs, progress_every=16,
        )
        print(
            f"Streamed {stats['total_cols']} columns in {stats['nchunks']} "
            f"chunks of {stats['chunk_cols']}: {stats['wall_s']:.3f} s, "
            f"{stats['cols_per_sec'] / 1e6:.3f}M columns/s "
            f"(effective H2D {stats['effective_h2d_gbps']:.2f} GB/s at "
            f"{stats['h2d_bytes_per_col']} B/column)"
        )
        if stream_outputs:
            print(
                f"Full duplex: outputs streamed to host ring buffers "
                f"(effective D2H {stats['effective_d2h_gbps']:.2f} GB/s at "
                f"{stats['d2h_bytes_per_col']} B/column; "
                f"{stats['duplex_bytes_per_col']} B/column total link traffic)"
            )
        if config.enable_validation and config.reference_file:
            tends_np = {k: np.asarray(v) for k, v in tends.items()}
            diags_np = {
                k: np.asarray(v) for k, v in diags.items() if k != "qsat"
            }
            with h5py.File(config.reference_file, "r") as f:
                tends_ref, diags_ref = iox.read_reference(
                    f, ncols=stream_chunk, dtype=dtype
                )
            atol, rtol = config_tolerances(config)
            failing = validate(tends_np, tends_ref, atol=atol, rtol=rtol)
            failing += validate(diags_np, diags_ref, atol=atol, rtol=rtol)
            if failing:
                print(f"Validation FAILED for fields: {failing}")
                return 1
            print("Validation completed successfully. HOORAY HOORAY!")
        return 0

    state = {k: jnp.asarray(v, dtype=dtype) for k, v in state_np.items()}
    ncols = grid.ncols

    # --- components (reference run_nonlinear.py:76-108) ---
    eta_levels = EtaLevels(grid, c, enable_checks=config.enable_checks)
    saturation = Saturation(grid, c, kflag=1, lphylin=True, enable_checks=config.enable_checks)
    cloudsc2_nl = Cloudsc2NL(grid, c, impl=impl, enable_checks=config.enable_checks)

    # eta (global column 0, loop-invariant) is diagnosed BEFORE sharding:
    # on a multi-host mesh the global array is not addressable for eager
    # indexing, and deriving it per shard would be wrong anyway
    state.update(eta_levels(state))
    if config.sharded:
        mesh = column_mesh()
        state, _ = pad_columns(state, 128 * mesh.devices.size)
        state = shard_state(state, mesh)

    layout = getattr(config, "_layout", "global")
    if layout == "tiled":
        # tiled-native storage (round 5): the persistent state lives in
        # (nj, L, 8, wb) form — every kernel fetch is one contiguous HBM
        # burst; measured NL 29M vs 19M cols/s at 65k columns (see
        # benchmarks/README.md §Round 5).  Inputs are tiled ONCE before the
        # timed loop and outputs are consumed tiled (untiled once for
        # validation) — the storage format is an internal pipeline choice,
        # exactly like the reference's ifirst/kfirst backend axis.
        if config.sharded or config.distributed or stream_chunk:
            raise click.UsageError(
                "--layout tiled is a single-chip resident mode"
            )
        if impl not in ("pallas", "pallas-tiled", "pallas-interpret"):
            raise click.UsageError(
                "--layout tiled requires the Pallas kernels: use --impl "
                "pallas (or pallas-interpret on CPU).  (--impl pallas-tiled "
                "alone, without --layout, is the boundary-relayout form for "
                "the validation protocols; with --layout tiled the state "
                "stays tiled across the whole timed loop, which is the "
                "fast path — both are accepted here.)"
            )
        if config.precision != "single":
            raise click.UsageError(
                "--layout tiled requires --precision single (Pallas path)"
            )
        if ncols % 4096 != 0:
            raise click.UsageError(
                f"--layout tiled needs num-cols % 4096 == 0 (got {ncols})"
            )
        from functools import partial as _partial

        from cloudsc2_tpu.pallas.levelscan import tile_state, untile_field
        from cloudsc2_tpu.pallas.nonlinear import cloudsc2_nl_pallas

        state_t = tile_state(state, 512)

        @_partial(jax.jit, static_argnames=())
        def _tiled_step(s):
            # fused saturation: the measured tiled-default (+5-12%; see
            # benchmarks/README.md §Round 5 — the round-1 negative flipped
            # under tiled storage).  qsat is computed in-kernel and
            # dropped from the diagnostics (the golden files have no QSAT)
            tends, diags = cloudsc2_nl_pallas(
                s, dt, c, tile_layout=True, state_tiled=True,
                fuse_saturation=True,
                interpret=impl == "pallas-interpret",
            )
            return tends, {k: v for k, v in diags.items() if k != "qsat"}

        def run_once(_s):
            return _tiled_step(state_t)
    elif config.sharded:
        # GSPMD cannot partition a pallas_call: the sharded hot loop runs
        # the fused forward step under shard_map (per-device local kernels,
        # no communication — columns are independent)
        from cloudsc2_tpu.parallel.step import make_sharded_forward_step

        sharded_step = make_sharded_forward_step(mesh, dt=dt, c=c, impl=impl)

        def run_once(s):
            tends, diags = sharded_step(s)
            diags = {k: v for k, v in diags.items() if k != "qsat"}
            return tends, diags
    else:
        def run_once(s):
            s = dict(s)
            s.update(saturation(s))
            return cloudsc2_nl(s, dt)

    def sync(out):
        # force execution + D2H of one scalar (see module docstring);
        # multi-host arrays are not fully addressable — fetch a local shard
        t = out[0]["t"]
        if getattr(t, "sharding", None) is not None and not t.sharding.is_fully_addressable:
            jax.block_until_ready(t)
            np.asarray(t.addressable_shards[0].data)
        else:
            float(jnp.sum(t[0]))

    # warm-up (reference :109)
    tends, diags = run_once(state)
    sync((tends, diags))
    Timer.reset()

    # hot loop (reference :115-119); optional profiler trace around it
    profile_dir = getattr(config, "_profile_dir", None)
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    runtimes = []
    for i in range(config.num_runs):
        with timing("run"):
            tends, diags = run_once(state)
            sync((tends, diags))
        runtimes.append(Timer.get_time("run", "ms") - sum(runtimes))
    if profile_dir:
        jax.profiler.stop_trace()
        print(f"Profiler trace written to {profile_dir}")

    # performance report (reference :121-137); CSVs are written by the lead
    # process only (multi-host runs share the filesystem)
    stats = print_performance(ncols, runtimes, nlev=grid.nlev)
    if is_lead and io_config.output_csv_file:
        write_performance_to_csv(
            io_config.output_csv_file,
            host_name=io_config.host_name,
            precision=config.precision,
            variant="nl-jax:" + jax.devices()[0].platform,
            num_cols=ncols,
            num_threads=config.num_threads,
            num_runs=config.num_runs,
            runtime_mean=stats[0],
            runtime_stddev=stats[1],
            mflops_mean=stats[2],
            mflops_stddev=stats[3],
        )
    if is_lead and io_config.output_csv_file_stencils:
        write_stencils_performance_to_csv(
            io_config.output_csv_file_stencils,
            host_name=io_config.host_name,
            precision=config.precision,
            backend="jax:" + jax.devices()[0].platform,
            num_cols=ncols,
            num_threads=config.num_threads,
            num_runs=config.num_runs,
            exec_info={k: Timer.get_time(k, "ms") for k in Timer.labels()},
            key_patterns=("cloudsc", "saturation", "increment", "perturbed", "eta"),
        )

    # validation vs golden file (reference :139-147).  Multi-host arrays are
    # not fully addressable: each process validates its own contiguous
    # column block against the matching golden columns.
    if config.enable_validation and config.reference_file:
        col0, col1 = 0, ncols
        if multiproc:
            def localize(d):
                out = {}
                lo = hi = None
                for k, v in d.items():
                    blk, (c0, c1) = process_local_block(v)
                    c1 = min(c1, ncols)  # trailing pad columns carry no data
                    out[k] = blk[:, : max(c1 - c0, 0)]
                    lo, hi = c0, c1
                return out, lo, hi
            tends_np, col0, col1 = localize(tends)
            diags_np, _, _ = localize(diags)
            if col1 <= col0:
                print("Validation skipped: this process holds only pad columns.")
                return 0
        else:
            if layout == "tiled":
                tends = {k: untile_field(v) for k, v in tends.items()}
                diags = {k: untile_field(v) for k, v in diags.items()}
            tends_np = {k: np.asarray(v) for k, v in tends.items()}
            diags_np = {k: np.asarray(v) for k, v in diags.items()}
            if config.sharded:
                tends_np = unpad_columns(tends_np, ncols)
                diags_np = unpad_columns(diags_np, ncols)
        with h5py.File(config.reference_file, "r") as f:
            tends_ref, diags_ref = iox.read_reference(f, ncols=ncols, dtype=dtype)
        cols = slice(col0, col1)
        tends_ref = {k: v[:, cols] for k, v in tends_ref.items()}
        diags_ref = {k: v[:, cols] for k, v in diags_ref.items()}
        atol, rtol = config_tolerances(config)
        failing = validate(tends_np, tends_ref, atol=atol, rtol=rtol)
        failing += validate(diags_np, diags_ref, atol=atol, rtol=rtol)
        if failing:
            print(f"Validation FAILED for fields: {failing}")
            return 1
        print("Validation completed successfully. HOORAY HOORAY!")
    return 0


def config_tolerances(config):
    # double: the JAX path vs the independent f64 oracle agrees to ~1e-12 on
    # CPU; TPU f64 is emulated (double-double) with different rounding, which
    # reaches ~4e-12 relative through the 137-level recurrence — the default
    # covers both platforms against CPU-generated golden files.
    # single: the golden files are computed in f64 math on f32-cast inputs
    # (drivers/generate_reference.py), so the f32 run's own rounding through
    # 137 sequential levels (cancellations in clc and the flux accumulators)
    # legitimately reaches ~1e-3 relative on CPU and ~6e-3 on TPU, where the
    # Mosaic/XLA transcendental implementations differ from the host libm
    # that produced the goldens (measured worst cases: clc 2.8e-3 rel /
    # 1.6e-4 abs, fhpsl 6.2e-3 rel, Pallas kernel on v5e).  Keep the gate
    # tight on CPU — only accelerator backends get the wider tolerance.
    import jax

    on_accel = jax.default_backend() != "cpu"
    if config.precision == "double":
        atol, rtol = (1e-16, 1e-10)
    else:
        atol, rtol = (2e-4, 1e-2) if on_accel else (1e-8, 2e-3)
    if getattr(config, "_atol", None) is not None:
        atol = config._atol
    if getattr(config, "_rtol", None) is not None:
        rtol = config._rtol
    return atol, rtol


@click.command()
@click.option("--backend", type=str, default=None, help="JAX platform: cpu | tpu (default: env)")
@click.option("--num-cols", type=int, default=100, help="number of columns")
@click.option("--num-runs", type=int, default=1, help="timed iterations")
@click.option("--precision", type=click.Choice(["double", "single"]), default="double")
@click.option("--enable-checks/--disable-checks", default=False)
@click.option("--enable-validation/--disable-validation", default=True)
@click.option("--input-file", type=str, default=None, help="input HDF5 (default: synthesize)")
@click.option("--reference-file", type=str, default=None, help="golden output HDF5")
@click.option("--atol", type=float, default=None)
@click.option("--rtol", type=float, default=None)
@click.option("--sharded/--no-sharded", default=False, help="column-shard over all devices")
@click.option("--distributed/--no-distributed", default=False,
              help="initialize jax.distributed (multi-host); implies --sharded. "
              "Coordinator auto-detects on TPU pods / from JAX_COORDINATOR_ADDRESS, "
              "or pass --coordinator/--process-id/--num-processes explicitly")
@click.option("--coordinator", type=str, default=None, help="coordinator address host:port")
@click.option("--process-id", type=int, default=None)
@click.option("--num-processes", type=int, default=None)
@click.option("--output-csv-file", type=str, default=None)
@click.option("--output-csv-file-stencils", type=str, default=None)
@click.option("--profile-dir", type=str, default=None, help="write a jax.profiler trace")
@click.option("--impl", type=click.Choice(["auto", "scan", "pallas", "pallas-interpret", "pallas-tiled"]),
              default="auto", help="kernel implementation (auto: pallas on TPU when "
              "f32 and ncols is a multiple of the column tile, else scan)")
@click.option("--fast-div", type=click.Choice(["exact", "faithful", "approx"]),
              default="exact", help="divide strategy inside the Pallas kernels "
              "(see cloudsc2_tpu.physics.fastmath.DIV_MODES); non-exact modes "
              "require --impl pallas and are covered by the f32 validation gates")
@click.option("--stream-chunk", type=int, default=None,
              help="stream --num-cols columns through the chip in chunks of "
              "this many columns (double-buffered H2D; the out-of-HBM scaled "
              "run — use lane-aligned chunks, e.g. 65536, for the Pallas path)")
@click.option("--stream-ring", type=int, default=4,
              help="distinct host-resident chunk buffers cycled by the stream")
@click.option("--stream-outputs/--no-stream-outputs", default=False,
              help="full-duplex streaming: materialize every chunk's "
              "tendencies+diagnostics into host ring buffers overlapped "
              "with compute (the reference's outputs-every-run contract); "
              "the validated sample then certifies the D2H path")
@click.option("--layout", type=click.Choice(["global", "tiled"]), default="global",
              help="stream storage layout: global (nlev, ncols) or tiled-native "
              "(nj, nlev, 8, 512) — one contiguous HBM extent per column tile; "
              "requires --impl pallas, --precision single, num-cols % 4096 == 0 "
              "(measured NL 29M vs 19M cols/s at 65k columns, "
              "benchmarks/README.md §Round 5)")
@click.option("--host-alias", type=str, default="localhost")
def main(
    backend, num_cols, num_runs, precision, enable_checks, enable_validation,
    input_file, reference_file, atol, rtol, sharded, distributed, coordinator,
    process_id, num_processes, output_csv_file,
    output_csv_file_stencils, profile_dir, impl, fast_div, stream_chunk,
    stream_ring, stream_outputs, layout, host_alias,
):
    config = (
        DEFAULT_CONFIG.with_precision(precision)
        .with_backend(backend)
        .with_checks(enable_checks)
        .with_validation(enable_validation)
        .with_num_cols(num_cols)
        .with_num_runs(num_runs)
        .with_input_file(input_file)
        .with_sharded(sharded)
        .with_distributed(distributed)
    )
    dist_kwargs = {}
    if coordinator is not None:
        dist_kwargs["coordinator_address"] = coordinator
    if process_id is not None:
        dist_kwargs["process_id"] = process_id
    if num_processes is not None:
        dist_kwargs["num_processes"] = num_processes
    object.__setattr__(config, "_dist_kwargs", dist_kwargs)
    if reference_file is None and input_file is None and enable_validation:
        import os

        ref = default_reference_file(precision)
        reference_file = ref if os.path.exists(ref) else None
    config = config.with_reference_file(reference_file)
    object.__setattr__(config, "_atol", atol)
    object.__setattr__(config, "_rtol", rtol)
    object.__setattr__(config, "_profile_dir", profile_dir)
    object.__setattr__(config, "_fast_div", fast_div)
    object.__setattr__(config, "_stream_chunk", stream_chunk)
    object.__setattr__(config, "_stream_ring", stream_ring)
    object.__setattr__(config, "_stream_outputs", stream_outputs)
    object.__setattr__(config, "_layout", layout)
    io_config = (
        DEFAULT_IO_CONFIG.with_output_csv_file(output_csv_file)
        .with_output_csv_file_stencils(output_csv_file_stencils)
        .with_host_name(host_alias)
    )
    sys.exit(core(config, io_config, impl=impl))


if __name__ == "__main__":
    main()
