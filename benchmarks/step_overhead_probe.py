"""Isolate the grouped kernel's ~11 us/grid-step mystery floor.

Minimal standalone pallas kernels, grid=(64,), adding one structural
feature at a time: big VMEM scratch, SMEM scratch, DMA semaphore
arrays, manual HBM->SMEM DMA, manual HBM->VMEM DMA, scalar SMEM reads,
unrolled store loops. Each kernel is tiny so remote compiles are fast.

Usage: python benchmarks/step_overhead_probe.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpu_pathtracer.utils.kernel_profile import kernel_profile_traced

    TILES = 64
    x = jnp.zeros((TILES * 8, 128), jnp.float32)
    sched = jnp.zeros((TILES, 8, 896), jnp.int32)
    comp = jnp.zeros((TILES, 56, 128), jnp.float32)

    out_spec = pl.BlockSpec((8, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((TILES * 8, 128), jnp.float32)
    in_spec = pl.BlockSpec((8, 128), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)

    def base_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    def scratch_kernel(x_ref, o_ref, tc, ic):
        o_ref[...] = x_ref[...] + 1.0

    def fill_kernel(x_ref, o_ref, tc, ic):
        tc[...] = jnp.full((8, 16384), jnp.inf)
        ic[...] = jnp.full((8, 16384), 2 ** 30, jnp.int32)
        o_ref[...] = x_ref[...] + 1.0

    def smem_dma_kernel(x_ref, s_hbm, o_ref, ring, sem):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        cur = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        def dma(slot, t):
            return pltpu.make_async_copy(
                s_hbm.at[t], ring.at[slot], sem.at[slot])

        @pl.when(i == 0)
        def _():
            dma(0, 0).start()

        @pl.when(i + 1 < n)
        def _():
            dma(nxt, i + 1).start()

        dma(cur, i).wait()
        o_ref[...] = x_ref[...] + 1.0

    def vmem_dma_kernel(x_ref, c_hbm, o_ref, ring, sem):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        cur = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        def dma(slot, t):
            return pltpu.make_async_copy(
                c_hbm.at[t], ring.at[slot], sem.at[slot])

        @pl.when(i == 0)
        def _():
            dma(0, 0).start()

        @pl.when(i + 1 < n)
        def _():
            dma(nxt, i + 1).start()

        dma(cur, i).wait()
        o_ref[...] = x_ref[...] + 1.0

    def both_dma_kernel(x_ref, s_hbm, c_hbm, o_ref,
                        sring, ssem, cring, csem, tc, ic):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        cur = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        def sdma(slot, t):
            return pltpu.make_async_copy(
                s_hbm.at[t], sring.at[slot], ssem.at[slot])

        def cdma(slot, t):
            return pltpu.make_async_copy(
                c_hbm.at[t], cring.at[slot], csem.at[slot])

        @pl.when(i == 0)
        def _():
            sdma(0, 0).start()
            cdma(0, 0).start()

        @pl.when(i + 1 < n)
        def _():
            sdma(nxt, i + 1).start()
            cdma(nxt, i + 1).start()

        sdma(cur, i).wait()
        cdma(cur, i).wait()
        tc[...] = jnp.full((8, 16384), jnp.inf)
        ic[...] = jnp.full((8, 16384), 2 ** 30, jnp.int32)
        o_ref[...] = x_ref[...] + 1.0

    big_scratch = [
        pltpu.VMEM((8, 16384), jnp.float32),
        pltpu.VMEM((8, 16384), jnp.int32),
    ]
    cases = [
        ("base", pl.pallas_call(
            base_kernel, grid=(TILES,), in_specs=[in_spec],
            out_specs=out_spec, out_shape=out_shape), (x,)),
        ("big_scratch", pl.pallas_call(
            scratch_kernel, grid=(TILES,), in_specs=[in_spec],
            out_specs=out_spec, out_shape=out_shape,
            scratch_shapes=big_scratch), (x,)),
        ("fills", pl.pallas_call(
            fill_kernel, grid=(TILES,), in_specs=[in_spec],
            out_specs=out_spec, out_shape=out_shape,
            scratch_shapes=big_scratch), (x,)),
        ("smem_dma", pl.pallas_call(
            smem_dma_kernel, grid=(TILES,),
            in_specs=[in_spec, pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=out_spec, out_shape=out_shape,
            scratch_shapes=[pltpu.SMEM((2, 8, 896), jnp.int32),
                            pltpu.SemaphoreType.DMA((2,))]),
         (x, sched)),
        ("vmem_dma", pl.pallas_call(
            vmem_dma_kernel, grid=(TILES,),
            in_specs=[in_spec, pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=out_spec, out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((2, 56, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))]),
         (x, comp)),
        ("both_dma_fills", pl.pallas_call(
            both_dma_kernel, grid=(TILES,),
            in_specs=[in_spec, pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=out_spec, out_shape=out_shape,
            scratch_shapes=[pltpu.SMEM((2, 8, 896), jnp.int32),
                            pltpu.SemaphoreType.DMA((2,)),
                            pltpu.VMEM((2, 56, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))]
            + big_scratch),
         (x, sched, comp)),
    ]
    for name, call, args in cases:
        try:
            prof = kernel_profile_traced(jax.jit(call), *args)
            ms = max(t["ms"] for t in prof["top_ops"])
            print(f"{name}: {ms:.3f} ms ({ms * 1e3 / TILES:.2f} us/step)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - probe reports and goes on
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
