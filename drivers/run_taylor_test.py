
# Copyright 2026.
# Licensed under the Apache License, Version 2.0.
"""CLI driver: Taylor (V-shape) test for the tangent-linear scheme.

Rebuild of the reference ``drivers/run_taylor_test.py:41-200``: assemble the
state, run the Taylor protocol (perturb by ``factor1``, sweep ``factor2``
over 1e-1..1e-10), print the norm table and verdict, re-run ``--num-runs``
times for timing.  Exit code 0 iff penalty <= 5.
"""
from __future__ import annotations

import sys

import click

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from drivers.config import DEFAULT_CONFIG, DEFAULT_IO_CONFIG


def core(config, io_config, factor1, factor2s, config_impl="scan", floors="f64",
         tile_column=False, per_column=False):
    import jax.numpy as jnp

    from cloudsc2_tpu import iox, make_constants
    from cloudsc2_tpu.components import EtaLevels
    from cloudsc2_tpu.utils.output import (
        print_performance,
        write_performance_to_csv,
        write_stencils_performance_to_csv,
    )
    from cloudsc2_tpu.utils.timing import Timer, timing
    from cloudsc2_tpu.validation.taylor import TaylorTest

    config.jax_config.apply()
    dtype = config.dtype

    from drivers.config import default_input_file

    input_file = config.input_file or default_input_file()
    if input_file:
        grid, state_np, dt, params = iox.load_input(
            input_file, ncols=config.num_cols, dtype=dtype
        )
        c = make_constants(lphylin=True, ldrain1d=False, **params)
    else:
        grid, state_np, dt = iox.synthesize_input(
            ncols=config.num_cols, nlev=137, seed=0, dtype=dtype
        )
        c = make_constants(lphylin=True, ldrain1d=False)

    if tile_column:
        # the reference driver's default is a SINGLE column
        # (run_taylor_test.py: --num-cols 1); the Pallas kernels need
        # lane-aligned batches, so replicate column 0 across num_cols —
        # the column-summed norms then equal the single-column norms.
        # Distinct columns stay the default: their summed norms are the
        # batched protocol, but a single column crossing a physics branch
        # between two lambdas can legitimately break V-monotonicity.
        import numpy as np

        state_np = {
            k: (np.repeat(v[:, :1], v.shape[1], axis=1) if np.ndim(v) == 2 else v)
            for k, v in state_np.items()
        }

    state = {k: jnp.asarray(v, dtype=dtype) for k, v in state_np.items()}
    state.update(EtaLevels(grid, c)(state))

    mesh = None
    if config.sharded:
        # mirror run_nonlinear.py --sharded: eta first (global column 0),
        # pad to the mesh multiple (replicating column 0 — valid physics,
        # so the padded lanes contribute consistent terms to the summed
        # norms), then shard; the schemes run under shard_map
        from cloudsc2_tpu.parallel.mesh import column_mesh, pad_columns, shard_state

        mesh = column_mesh()
        state, _ = pad_columns(state, 128 * mesh.devices.size)
        state = shard_state(state, mesh)

    tt = TaylorTest(
        constants=c, factor1=factor1, factor2s=factor2s, impl=config_impl,
        floors=floors, mesh=mesh, per_column=per_column,
    )
    Timer.reset()
    test = 13
    runtimes = []
    for _ in range(config.num_runs):
        with timing("run"):
            test = tt(state, dt, verbose=True)
        runtimes.append(Timer.get_time("run", "ms") - sum(runtimes))
    stats = print_performance(grid.ncols, runtimes, nlev=grid.nlev)
    if io_config.output_csv_file:
        import jax

        write_performance_to_csv(
            io_config.output_csv_file,
            host_name=io_config.host_name,
            precision=config.precision,
            variant="tl-jax:" + jax.devices()[0].platform,
            num_cols=grid.ncols,
            num_threads=config.num_threads,
            num_runs=config.num_runs,
            runtime_mean=stats[0],
            runtime_stddev=stats[1],
            mflops_mean=stats[2],
            mflops_stddev=stats[3],
        )
    if io_config.output_csv_file_stencils:
        import jax

        write_stencils_performance_to_csv(
            io_config.output_csv_file_stencils,
            host_name=io_config.host_name,
            precision=config.precision,
            backend="jax:" + jax.devices()[0].platform,
            num_cols=grid.ncols,
            num_threads=config.num_threads,
            num_runs=config.num_runs,
            exec_info={k: Timer.get_time(k, "ms") for k in Timer.labels()},
            key_patterns=("cloudsc", "saturation", "increment", "perturbed"),
        )
    return 0 if test <= 5 else 1


@click.command()
@click.option("--backend", type=str, default=None, help="JAX platform: cpu | tpu (default: env)")
@click.option("--num-cols", type=int, default=1)
@click.option("--num-runs", type=int, default=1)
@click.option("--precision", type=click.Choice(["double", "single"]), default="double")
@click.option("--factor1", type=float, default=0.01)
@click.option("--input-file", type=str, default=None)
@click.option("--output-csv-file", type=str, default=None)
@click.option("--output-csv-file-stencils", type=str, default=None)
@click.option("--impl", type=click.Choice(["scan", "pallas", "pallas-interpret", "pallas-tiled"]), default="scan",
              help="kernel implementation (pallas: f32 TPU kernels; pair with "
              "--floors auto/f32 — the reference's f64 verdict floors are below "
              "single-precision resolution)")
@click.option("--floors", type=click.Choice(["auto", "f64", "f32"]), default="f64",
              help="verdict floor calibration: f64 = the reference constants "
              "(tangent_linear/validation.py:203-211); f32 = the measured "
              "single-precision V-floor (benchmarks/README.md); auto picks by "
              "the state dtype")
@click.option("--sharded/--no-sharded", default=False,
              help="column-shard the NL/TL schemes over all devices (shard_map)")
@click.option("--tile-column/--no-tile-column", default=False,
              help="replicate input column 0 across --num-cols: the "
              "reference's single-column protocol on a lane-aligned batch "
              "(distinct columns can legitimately break V-monotonicity when "
              "one crosses a physics branch between two lambdas)")
@click.option("--per-column/--no-per-column", default=False,
              help="run the V-shape verdict on every column's own norm "
              "sequence and pass iff >= 98% of columns pass individually — "
              "the legitimate heterogeneous-batch verdict (the summed-norm "
              "V can be broken by a single branch-crossing column; a wrong "
              "TL fails essentially every column)")
@click.option("--host-alias", type=str, default="localhost")
def main(backend, num_cols, num_runs, precision, factor1, input_file, output_csv_file,
         output_csv_file_stencils, impl, floors, sharded, tile_column, per_column,
         host_alias):
    config = (
        DEFAULT_CONFIG.with_precision(precision)
        .with_backend(backend)
        .with_num_cols(num_cols)
        .with_num_runs(num_runs)
        .with_input_file(input_file)
        .with_sharded(sharded)
    )
    io_config = (
        DEFAULT_IO_CONFIG.with_output_csv_file(output_csv_file)
        .with_output_csv_file_stencils(output_csv_file_stencils)
        .with_host_name(host_alias)
    )
    factor2s = tuple(float(10.0 ** -(i + 1)) for i in range(10))
    sys.exit(core(config, io_config, factor1, factor2s, impl, floors, tile_column,
                  per_column))


if __name__ == "__main__":
    main()
