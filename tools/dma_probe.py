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
    # Mosaic requires minor-dim slices aligned to the 128-lane tiling, so
    # the DMA path runs on rows padded to a multiple of 128 (production
    # would pad the same way; the padding is still tiny vs the dense sweep).
    Apad = -(-A // 128) * 128

    def scatter_kernel(widx_ref, rows_ref, arr_ref, out_ref, sem):
        del arr_ref  # aliased to out_ref; writes go through out_ref
        i = pl.program_id(0)

        def put(j, _):
            w = widx_ref[i * BLK + j]

            @pl.when(w >= 0)
            def _():
                dma = pltpu.make_async_copy(
                    rows_ref.at[j], out_ref.at[i * BLK + j, pl.ds(w, 1), 0], sem)
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
                pl.BlockSpec((BLK, 1, Apad), lambda i, w: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        )
        return pl.pallas_call(
            scatter_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, T, 1, Apad), jnp.float32),
            input_output_aliases={2: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(widx, rows.reshape(B, 1, Apad), arr.reshape(B, T, 1, Apad)).reshape(B, T, Apad)

    def scatter_kernel_overlap(widx_ref, rows_ref, arr_ref, out_ref, sems):
        del arr_ref
        i = pl.program_id(0)

        def start(j, _):
            w = widx_ref[i * BLK + j]

            @pl.when(w >= 0)
            def _():
                pltpu.make_async_copy(
                    rows_ref.at[j], out_ref.at[i * BLK + j, pl.ds(w, 1), 0],
                    sems.at[j]).start()

            return 0

        def wait(j, _):
            w = widx_ref[i * BLK + j]

            @pl.when(w >= 0)
            def _():
                pltpu.make_async_copy(
                    rows_ref.at[j], out_ref.at[i * BLK + j, pl.ds(w, 1), 0],
                    sems.at[j]).wait()

            return 0

        jax.lax.fori_loop(0, BLK, start, 0)
        jax.lax.fori_loop(0, BLK, wait, 0)

    @jax.jit
    def dma_scatter_overlap(arr, rows, widx):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // BLK,),
            in_specs=[
                pl.BlockSpec((BLK, 1, Apad), lambda i, w: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((BLK,))],
        )
        return pl.pallas_call(
            scatter_kernel_overlap,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, T, 1, Apad), jnp.float32),
            input_output_aliases={2: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(widx, rows.reshape(B, 1, Apad), arr.reshape(B, T, 1, Apad)).reshape(B, T, Apad)

    @jax.jit
    def blend_scatter(arr, rows, widx):
        t_iota = jnp.arange(T, dtype=jnp.int32)
        oh = (t_iota[None, :] == widx[:, None])[:, :, None]
        return jnp.where(oh, rows[:, None, :], arr)

    rng = jax.random.PRNGKey(0)
    arr = jax.random.normal(rng, (B, T, A), jnp.float32)
    arr_p = jax.random.normal(rng, (B, T, Apad), jnp.float32)
    rows = jax.random.normal(rng, (B, A), jnp.float32)
    rows_p = jax.random.normal(rng, (B, Apad), jnp.float32)
    widx = jax.random.randint(rng, (B,), 0, T, jnp.int32)

    # Correctness first (both on the padded shapes).
    ref = jax.device_get(blend_scatter(arr_p, rows_p, widx))
    try:
        got = jax.device_get(dma_scatter(arr_p, rows_p, widx))
    except Exception as e:  # noqa: BLE001
        print(f"DMA scatter failed to compile/run: {type(e).__name__}: {e}")
        return 1
    import numpy as np

    if not np.array_equal(ref, got):
        bad = int((ref != got).any(axis=(1, 2)).sum())
        print(f"MISMATCH in {bad}/{B} lanes")
        return 1
    print("parity ok")

    def timeit(f, name, a, r, width):
        f(a, r, widx).block_until_ready()
        t0 = time.time()
        for _ in range(args.reps):
            a = f(a, r, widx)
        a.block_until_ready()
        dt = (time.time() - t0) / args.reps
        print(f"{name}: {dt * 1e6:,.0f} us/call "
              f"({B * width * 4 * 2 / dt / 1e9:.1f} GB/s touched-rows)")
        return dt

    t_blend = timeit(blend_scatter, f"xla dense blend A={A}   ", arr, rows, A)
    t_blend_p = timeit(blend_scatter, f"xla dense blend A={Apad}", arr_p,
                       rows_p, Apad)
    t_dma = timeit(dma_scatter, f"pallas row DMA  A={Apad}", arr_p, rows_p,
                   Apad)
    try:
        got2 = jax.device_get(dma_scatter_overlap(arr_p, rows_p, widx))
        assert np.array_equal(ref, got2), "overlap variant mismatch"
        t_dma_o = timeit(dma_scatter_overlap, f"pallas DMA ovlp A={Apad}",
                         arr_p, rows_p, Apad)
    except Exception as e:  # noqa: BLE001
        print(f"overlap variant failed: {type(e).__name__}: {e}")
        t_dma_o = t_dma
    best = min(t_dma, t_dma_o)
    print(f"speedup vs real-width blend: {t_blend / best:.2f}x; "
          f"vs padded blend: {t_blend_p / best:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
