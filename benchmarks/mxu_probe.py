"""MXU viability probe for the grouped intersector's per-pair math.

The grouped kernel spends ~58 cycles per (group, cluster) pair, mostly
in six K=3 ray x affine-row contractions on the VPU. Candidate rework:
one (8,8)@(8,768) f32 matmul per pop (rays x packed coefficient block)
on the MXU + a short VPU epilogue (t = -os/ds, u/v fma, predicate,
winner update).

This probe times three single-kernel loops of N pops each:
  chain : the current 6-contraction VPU chain (baseline clone)
  mxu   : dot_general (8,8)@(8,768) HIGHEST + epilogue
  mxu1  : same with DEFAULT precision (bf16 single pass; accuracy
          unusable for t but bounds the MXU cost floor)

Timing: in-program device trace (kernel_profile_traced) — pipelined
wall timing of these tiny programs reports dispatch artifacts, not
device time (measured 0.03 ms wall for a 6 ms device loop).
Cycles/pop at 940 MHz printed for comparison with the measured 58.

Usage: python benchmarks/mxu_probe.py [--iters 200000]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpu_pathtracer.utils.kernel_profile import kernel_profile_traced

    N = args.iters

    def epilogue(os_, ds_, ub, ud, vb, vd, t_cut, tcand, icand, ids, off):
        t = -os_ / ds_
        u = ub + t * ud
        v = vb + t * vd
        ok = (jnp.minimum(u, v) >= 0.0) & (u + v <= 1.0) & (t >= t_cut)
        tcur = tcand[:, pl.ds(off, 128)]
        icur = icand[:, pl.ds(off, 128)]
        better = ok & (t < tcur)
        tcand[:, pl.ds(off, 128)] = jnp.where(better, t, tcur)
        icand[:, pl.ds(off, 128)] = jnp.where(better, ids, icur)

    def chain_kernel(rays_ref, trb_ref, out_ref, tcand, icand):
        # rays_ref: (1024,128) x 6 stand-in -> slice (8,128) blocks
        t_cut = jnp.float32(1e-4)
        ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        tcand[...] = jnp.full((8, 16 * 128), jnp.inf)
        icand[...] = jnp.zeros((8, 16 * 128), jnp.int32)

        (r0, r1, r2, r3, r4, r5, r6, r7, r8, r9, r10, r11) = [
            trb_ref[kk:kk + 1, :] for kk in range(12)
        ]

        def body(i, carry):
            g = jax.lax.rem(i, 128)
            s0 = g * 8

            def ext(k):
                return rays_ref[pl.ds(k * 1024 + s0, 8), :]

            rox, roy, roz = ext(0), ext(1), ext(2)
            rdx, rdy, rdz = ext(3), ext(4), ext(5)
            os_ = r6 * rox + r7 * roy + r8 * roz - r11
            ds_ = r6 * rdx + r7 * rdy + r8 * rdz
            ub = r0 * rox + r1 * roy + r2 * roz - r9
            ud = r0 * rdx + r1 * rdy + r2 * rdz
            vb = r3 * rox + r4 * roy + r5 * roz - r10
            vd = r3 * rdx + r4 * rdy + r5 * rdz
            epilogue(os_, ds_, ub, ud, vb, vd, t_cut, tcand, icand,
                     ids, jax.lax.rem(i, 16) * 128)
            return carry

        jax.lax.fori_loop(0, N, body, 0)
        out_ref[...] = tcand[:, 0:128] + icand[:, 0:128].astype(jnp.float32)

    def mk_mxu_kernel(precision):
        def mxu_kernel(rays_ref, bc_ref, out_ref, tcand, icand):
            # rays_ref: (1024, 8) compact [ox oy oz dx dy dz 1 0]
            # bc_ref:   (8, 768) coefficient block
            t_cut = jnp.float32(1e-4)
            ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            tcand[...] = jnp.full((8, 16 * 128), jnp.inf)
            icand[...] = jnp.zeros((8, 16 * 128), jnp.int32)

            def body(i, carry):
                g = jax.lax.rem(i, 128)
                a = rays_ref[pl.ds(g * 8, 8), :]          # (8, 8)
                res = jax.lax.dot_general(
                    a, bc_ref[...],
                    (((1,), (0,)), ((), ())),
                    precision=precision,
                    preferred_element_type=jnp.float32,
                )                                          # (8, 768)
                os_ = res[:, 0:128]
                ds_ = res[:, 128:256]
                ub = res[:, 256:384]
                ud = res[:, 384:512]
                vb = res[:, 512:640]
                vd = res[:, 640:768]
                epilogue(os_, ds_, ub, ud, vb, vd, t_cut, tcand, icand,
                         ids, jax.lax.rem(i, 16) * 128)
                return carry

            jax.lax.fori_loop(0, N, body, 0)
            out_ref[...] = (tcand[:, 0:128]
                            + icand[:, 0:128].astype(jnp.float32))
        return mxu_kernel

    rng = np.random.default_rng(0)
    rays_bcast = jnp.asarray(
        rng.standard_normal((6 * 1024, 128)).astype(np.float32))
    trb = jnp.asarray(rng.standard_normal((16, 128)).astype(np.float32))
    rays_c = jnp.asarray(rng.standard_normal((1024, 8)).astype(np.float32))
    bc = jnp.asarray(rng.standard_normal((8, 768)).astype(np.float32))

    scratch = [
        pltpu.VMEM((8, 16 * 128), jnp.float32),
        pltpu.VMEM((8, 16 * 128), jnp.int32),
    ]
    out_sd = jax.ShapeDtypeStruct((8, 128), jnp.float32)

    chain = pl.pallas_call(chain_kernel, out_shape=out_sd,
                           scratch_shapes=scratch)
    mxu_hi = pl.pallas_call(mk_mxu_kernel(jax.lax.Precision.HIGHEST),
                            out_shape=out_sd, scratch_shapes=scratch)
    mxu_lo = pl.pallas_call(mk_mxu_kernel(jax.lax.Precision.DEFAULT),
                            out_shape=out_sd, scratch_shapes=scratch)

    for tag, fn, a in (
        ("chain", chain, (rays_bcast, trb)),
        ("mxu_hi", mxu_hi, (rays_c, bc)),
        ("mxu_lo", mxu_lo, (rays_c, bc)),
    ):
        try:
            prof = kernel_profile_traced(jax.jit(fn), *a)
            ms = prof["device_total"] * 1e3
            cyc = prof["device_total"] * 940e6 / N
            print(f"{tag}: {ms:.3f} ms device for {N} pops -> "
                  f"{cyc:.1f} cycles/pop", flush=True)
        except Exception as e:  # noqa: BLE001 - probe must report and go on
            print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
