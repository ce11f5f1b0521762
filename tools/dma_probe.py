"""Microbench: per-lane row-scatter via Pallas DMA vs the XLA dense blend.

Answers the one question that decides whether materialize/expand become
touched-bytes Pallas kernels: how fast are B scattered ~300-byte
VMEM->HBM row DMAs on this TPU? The XLA alternative (a dense one-hot
blend) reads+writes the whole [B, T, A] array (~132 MB at go9 sizes) per
simulation; the DMA scatter touches ~0.7 MB but pays per-DMA issue
overhead. Run standalone during a training pause.

Usage: python tools/dma_probe.py [--batch 1024] [--t 201] [--a 82]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--t", type=int, default=201)
    p.add_argument("--a", type=int, default=82)
    p.add_argument("--block", type=int, default=128)
    p.add_argument("--reps", type=int, default=50)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, A, BLK = args.batch, args.t, args.a, args.block

    def scatter_kernel(widx_ref, rows_ref, out_ref, sem):
        i = pl.program_id(0)

        def put(j, _):
            w = widx_ref[i * BLK + j]

            @pl.when(w >= 0)
            def _():
                dma = pltpu.make_async_copy(
                    rows_ref.at[j], out_ref.at[i * BLK + j, pl.ds(w, 1)], sem)
                dma.start()
                dma.wait()

            return 0

        jax.lax.fori_loop(0, BLK, put, 0)

    @jax.jit
    def dma_scatter(arr, rows, widx):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // BLK,),
            in_specs=[
                pl.BlockSpec((BLK, 1, A), lambda i, w: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        )
        return pl.pallas_call(
            scatter_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, T, A), jnp.float32),
            input_output_aliases={2: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(widx, rows.reshape(B, 1, A), arr)

    @jax.jit
    def blend_scatter(arr, rows, widx):
        t_iota = jnp.arange(T, dtype=jnp.int32)
        oh = (t_iota[None, :] == widx[:, None])[:, :, None]
        return jnp.where(oh, rows[:, None, :], arr)

    rng = jax.random.PRNGKey(0)
    arr = jax.random.normal(rng, (B, T, A), jnp.float32)
    rows = jax.random.normal(rng, (B, A), jnp.float32)
    widx = jax.random.randint(rng, (B,), 0, T, jnp.int32)

    # Correctness first.
    ref = jax.device_get(blend_scatter(arr, rows, widx))
    try:
        got = jax.device_get(dma_scatter(arr, rows, widx))
    except Exception as e:  # noqa: BLE001
        print(f"DMA scatter failed to compile/run: {type(e).__name__}: {e}")
        return 1
    import numpy as np

    if not np.array_equal(ref, got):
        bad = int((ref != got).any(axis=(1, 2)).sum())
        print(f"MISMATCH in {bad}/{B} lanes")
        return 1
    print("parity ok")

    def timeit(f, name):
        a = arr
        f(a, rows, widx).block_until_ready()
        t0 = time.time()
        for _ in range(args.reps):
            a = f(a, rows, widx)
        a.block_until_ready()
        dt = (time.time() - t0) / args.reps
        print(f"{name}: {dt * 1e6:,.0f} us/call "
              f"({B * A * 4 * 2 / dt / 1e9:.1f} GB/s touched-rows)")
        return dt

    t_blend = timeit(blend_scatter, "xla dense blend")
    t_dma = timeit(dma_scatter, "pallas row DMA ")
    print(f"speedup: {t_blend / t_dma:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
