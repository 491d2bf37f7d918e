"""MXU-offloaded ray-triangle intersection: standalone probe kernel.

The VMEM brute kernel is ISSUE-bound on the VPU at ~27 G tests/s
(benchmarks/mfu_plateau.py): of its ~55 vector-op slots per (128-tri,
128-ray) pair tile, ~33 are the broadcast multiply-add chains that
evaluate the affine (os, ds, ou, du, ov, dv) sextet. Those are exactly
one K=8 contraction per pair — this probe moves them onto the MXU as a
single HIGHEST-precision (bf16x3-exact) dot per chunk:

    Y (768, 128) = W_chunk (768, 8) @ X (8, 128)
    rows 0:128 = os, 128:256 = ds, ... 640:768 = dv
    X = [ox oy oz 1 dx dy dz 0] per ray lane

leaving the VPU ~22 slots (t = -os/ds, u/v fold, validity, min/argmin).
Ceiling if the MXU hides completely: ~2.5x the VPU kernel.

Measures G tests/s for the existing pallas_closest_tuv vs the MXU
variant at 64k rays x {512, 2048, 8192} triangles, pipelined (one sync
for n calls — the axon tunnel sync tax otherwise dominates), and
cross-checks (t, id) agreement (eps-level: bf16x3 reassociates).

Usage: python benchmarks/mxu_intersect_probe.py
Writes benchmarks/mxu_intersect_probe_result.json.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

HERE = os.path.dirname(os.path.abspath(__file__))


def build_w(tri_pack_np):
    """(C*768, 8) f32: six 128-row output blocks per 128-tri chunk.

    tri_pack columns (pack_triangles): 0-2 inv row u, 3-5 inv row v,
    6-8 inv row s, 9/10/11 = inv·v0 per row (subtracted as constants).
    """
    tp = np.asarray(tri_pack_np, np.float32)
    tpad = tp.shape[0]
    c = tpad // 128
    w = np.zeros((c, 6, 128, 8), np.float32)
    blk = tp.reshape(c, 128, 16)
    for ci in range(c):
        b = blk[ci]
        w[ci, 0, :, 0:3] = b[:, 6:9]     # os <- o
        w[ci, 0, :, 3] = -b[:, 11]
        w[ci, 1, :, 4:7] = b[:, 6:9]     # ds <- d
        w[ci, 2, :, 0:3] = b[:, 0:3]     # ou
        w[ci, 2, :, 3] = -b[:, 9]
        w[ci, 3, :, 4:7] = b[:, 0:3]     # du
        w[ci, 4, :, 0:3] = b[:, 3:6]     # ov
        w[ci, 4, :, 3] = -b[:, 10]
        w[ci, 5, :, 4:7] = b[:, 3:6]     # dv
    # transposed (8, C*768): a (rows, 8) f32 array pads its 8-wide lane
    # dim to 128 in VMEM (16x bloat, >VMEM at 8k tris); lanes-major is
    # compact and the dot contracts dim 0 of both operands instead.
    return np.ascontiguousarray(w.reshape(c * 768, 8).T)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import tpu_pathtracer.ops.intersect_pallas as ip
    from tpu_pathtracer.render.camera import CameraController
    from tpu_pathtracer.scene.builtin import cornell_box
    from tpu_pathtracer.scene.mesh import subdivide

    ROWS, RT = ip.ROWS_PER_STEP, ip.RAY_TILE

    def _kernel_mxu(w_ref, ox, oy, oz, dx, dy, dz, tmin_ref,
                    t_out, id_out):
        n_chunks = w_ref.shape[1] // 768
        t_min = tmin_ref[0]
        ones = jnp.ones((1, RT), jnp.float32)
        zeros = jnp.zeros((1, RT), jnp.float32)
        for r in range(ROWS):
            x = jnp.concatenate(
                [ox[r:r + 1], oy[r:r + 1], oz[r:r + 1], ones,
                 dx[r:r + 1], dy[r:r + 1], dz[r:r + 1], zeros], axis=0
            )                                            # (8, 128)

            def chunk(c, carry):
                t_cur, id_cur = carry
                w = w_ref[:, pl.ds(c * 768, 768)]        # (8, 768)
                y = jax.lax.dot_general(
                    w, x,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )                                        # (768, 128)
                os_, ds_ = y[0:128], y[128:256]
                ou, du = y[256:384], y[384:512]
                ov, dv = y[512:640], y[640:768]
                t = -os_ / ds_
                u = ou + t * du
                v = ov + t * dv
                ok = (
                    (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                    & (t > 1e-8) & (t >= t_min)
                )
                tt = jnp.where(ok, t, jnp.inf)
                tmin_c = jnp.min(tt, axis=0, keepdims=True)
                ids = (
                    jax.lax.broadcasted_iota(jnp.int32, tt.shape, 0)
                    + c * 128
                )
                idc = jnp.min(
                    jnp.where(tt == tmin_c, ids, ip._BIG_ID),
                    axis=0, keepdims=True,
                )
                better = tmin_c < t_cur
                return (
                    jnp.where(better, tmin_c, t_cur),
                    jnp.where(better, idc, id_cur),
                )

            t0 = jnp.full((1, RT), jnp.inf)
            i0 = jnp.full((1, RT), -1, jnp.int32)
            t_fin, id_fin = jax.lax.fori_loop(
                0, n_chunks, chunk, (t0, i0)
            )
            t_out[r:r + 1, :] = t_fin
            id_out[r:r + 1, :] = jnp.maximum(id_fin, 0)

    @jax.jit
    def mxu_closest(w, o, d, t_min):
        b = o.shape[0]
        rows = b // RT
        ray_spec = ip._ray_spec()
        return pl.pallas_call(
            _kernel_mxu,
            grid=(rows // ROWS,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            + [ray_spec] * 6
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=[ray_spec, ray_spec],
            out_shape=[
                jax.ShapeDtypeStruct((rows, RT), jnp.float32),
                jax.ShapeDtypeStruct((rows, RT), jnp.int32),
            ],
        )(w, *ip._ray_comps(o, d, rows),
          jnp.full((1,), t_min, jnp.float32))

    @jax.jit
    def mxu_flat(w, o, d, t_min):
        t, idx = mxu_closest(w, o, d, t_min)
        return t.reshape(-1), idx.reshape(-1)

    vpu_closest = jax.jit(partial(ip.pallas_closest_tuv))

    n = 1 << 16
    cam = CameraController.default().build()
    u = jax.random.uniform(jax.random.key(0), (2, n))
    o, d = cam.get_rays(u[0], u[1])
    o = jax.block_until_ready(o)

    results = {}
    for sub, label in ((2, "512"), (3, "2048"), (4, "8192")):
        geom = subdivide(cornell_box("quads"), sub).build()
        tp = ip.pack_triangles(geom)
        tpad = tp.shape[0]
        w = jnp.asarray(build_w(np.asarray(tp)))

        tv, iv = vpu_closest(tp, o, d)
        tm, im = mxu_flat(w, o, d, 1e-4)
        tv, tm = np.asarray(tv), np.asarray(tm)
        m = np.isfinite(tv)
        agree = bool(
            (np.isfinite(tm) == m).all()
            and np.allclose(tm[m], tv[m], rtol=1e-5, atol=1e-6)
        )
        ids_eq = float((np.asarray(iv) == np.asarray(im)).mean())

        def bench(fn, *args):
            fn(*args)[0].block_until_ready()
            reps = 8
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(reps)]
            outs[-1][0].block_until_ready()
            dt = (time.perf_counter() - t0) / reps
            return n * tpad / dt / 1e9

        g_vpu = bench(vpu_closest, tp, o, d)
        g_mxu = bench(mxu_flat, w, o, d, 1e-4)
        results[label] = {
            "tris_padded": int(tpad),
            "vpu_Gtests_s": round(g_vpu, 1),
            "mxu_Gtests_s": round(g_mxu, 1),
            "speedup": round(g_mxu / g_vpu, 2),
            "t_agree": agree,
            "id_agree_frac": round(ids_eq, 4),
        }
        print(label, results[label], flush=True)

    with open(os.path.join(HERE, "mxu_intersect_probe_result.json"),
              "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
