"""Sub-block gate on-fraction probe (host/CPU, numpy slab math).

The fused gated prepass skips (tile, 128-cluster block) steps whose
union AABB no tile ray hits. This probe asks how much finer gating
granularity would skip: for the 2.1M-tri scene it computes the gate
on-fraction at 128-, 32- and 8-cluster box granularity, for a real
camera batch and a synthetic bounce batch (uniform origins in the
scene box, uniform sphere directions — the round-3 probe convention;
real bounce mixes measured between the two).

The conditional fraction P(32-sub-box on | 128-block on) bounds the
slab-arithmetic saving of in-kernel sub-block gating: saved share =
(1 - frac32 / frac128) x (slab share of the fused prepass).

Runs fully on CPU (forces jax_platforms=cpu BEFORE any computation so
the axon tunnel is untouched — safe while a TPU job runs).

Usage: python benchmarks/subgate_probe.py [--tag 2m]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="2m")
    ap.add_argument("--n", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import tpu_pathtracer.ops.intersect_pallas as ip
    from tpu_pathtracer.render.camera import CameraController
    from tpu_pathtracer.scene.pbrt_loader import parse_pbrt

    pbrt = f"/tmp/tpt_stress{args.tag}/stress{args.tag}.pbrt"
    if not os.path.exists(pbrt):
        sys.path.insert(0, os.path.join(HERE, "..", "scenes"))
        from generate_stress import generate
        n_tess = args.n or {"1m": 709, "2m": 1025}.get(args.tag, 1025)
        pbrt = generate(f"/tmp/tpt_stress{args.tag}", tag=args.tag,
                        n=n_tess)
    scene = parse_pbrt(pbrt, max_triangles=1 << 31)
    geom = scene.prims.build()
    cs = ip.CulledScene(geom)
    cmin = np.asarray(cs.cluster_min)
    cmax = np.asarray(cs.cluster_max)
    c = cmin.shape[0]
    print(f"{geom.num_tris} tris, {c} clusters", flush=True)

    eye, tgt, up = scene.camera_lookat
    cam = CameraController(
        lookfrom=np.array(eye, np.float32),
        lookat=np.array(tgt, np.float32),
        vup=np.array(up, np.float32),
        vfov=scene.camera_fov or 40.0, aspect=1.0,
    ).build()
    n = 16384
    side = 128
    u = (np.arange(n) % side + 0.5) / side
    v = (np.arange(n) // side + 0.5) / side
    o_c, d_c = cam.get_rays(u, v)
    o_c, d_c = np.asarray(o_c), np.asarray(d_c)
    lo, hi = cmin.min(0), cmax.max(0)
    rs = np.random.RandomState(3)
    o_i = (rs.rand(n, 3) * (hi - lo) + lo).astype(np.float32)
    d_i = rs.randn(n, 3).astype(np.float32)
    d_i /= np.linalg.norm(d_i, axis=-1, keepdims=True)

    tiles = n // ip.RAYS_PER_TILE
    cpad = (c + 127) // 128 * 128

    def union_boxes(gran):
        nb = cpad // gran
        bmin = np.full((nb * gran, 3), np.inf, np.float32)
        bmax = np.full((nb * gran, 3), -np.inf, np.float32)
        bmin[:c] = cmin
        bmax[:c] = cmax
        return (bmin.reshape(nb, gran, 3).min(1),
                bmax.reshape(nb, gran, 3).max(1),
                (np.arange(nb) * gran < c))

    def gate_frac(o, d, gran):
        bmin, bmax, real = union_boxes(gran)
        nb = bmin.shape[0]
        inv = 1.0 / np.where(np.abs(d) > 1e-8, d, 1e-8)
        on = np.zeros((tiles, nb), bool)
        for t in range(tiles):
            sl = slice(t * ip.RAYS_PER_TILE, (t + 1) * ip.RAYS_PER_TILE)
            lo_t = (bmin[None] - o[sl, None]) * inv[sl, None]
            hi_t = (bmax[None] - o[sl, None]) * inv[sl, None]
            tn = np.maximum(np.minimum(lo_t, hi_t).max(-1), 1e-4)
            tf = np.maximum(lo_t, hi_t).min(-1)
            on[t] = ((tf >= tn) & (tf > 0)).any(0)
        on &= real[None]
        return on

    # MIXED batch: the real bench workload (balance_lanes=4 lane
    # queues) packs pixels at different depths into one batch, then
    # sorts by nearest-touched-cluster (the renderer's schedule key).
    # A 1024-ray tile of such a batch turns a quarter ON if ANY of its
    # mixed rays touches it — the pure-camera/pure-bounce numbers
    # below bound the saving only if tiles are depth-pure, which lane
    # queues break. This reproduces that mixing host-side.
    o_m = np.concatenate([o_c[: n // 2], o_i[: n // 2]])
    d_m = np.concatenate([d_c[: n // 2], d_i[: n // 2]])
    inv_m = 1.0 / np.where(np.abs(d_m) > 1e-8, d_m, 1e-8)
    best_tn = np.full(n, np.inf, np.float32)
    best_id = np.full(n, c, np.int32)
    for c0 in range(0, c, 2048):
        c1 = min(c0 + 2048, c)
        lo_t = (cmin[None, c0:c1] - o_m[:, None]) * inv_m[:, None]
        hi_t = (cmax[None, c0:c1] - o_m[:, None]) * inv_m[:, None]
        tn = np.maximum(np.minimum(lo_t, hi_t).max(-1), 1e-4)
        tf = np.maximum(lo_t, hi_t).min(-1)
        tn = np.where((tf >= tn) & (tf > 0), tn, np.inf)
        j = tn.argmin(1)
        t = tn[np.arange(n), j]
        upd = t < best_tn
        best_tn = np.where(upd, t, best_tn)
        best_id = np.where(upd, (j + c0).astype(np.int32), best_id)
    order = np.argsort(best_id, kind="stable")
    o_s, d_s = o_m[order], d_m[order]

    out = {"clusters": int(c)}
    for tag_r, (o, d) in (("camera", (o_c, d_c)),
                          ("bounce", (o_i, d_i)),
                          ("mixed", (o_m, d_m)),
                          ("mixsort", (o_s, d_s))):
        on128 = gate_frac(o, d, 128)
        on32 = gate_frac(o, d, 32)
        on8 = gate_frac(o, d, 8)
        f128 = float(on128.mean())
        f32 = float(on32.mean())
        f8 = float(on8.mean())
        # conditional: of quarters inside an ON block, how many are on
        q_in_on = (on32.reshape(tiles, -1, 4)[on128].mean()
                   if on128.any() else 0.0)
        q8_in_on = (on8.reshape(tiles, -1, 16)[on128].mean()
                    if on128.any() else 0.0)
        out[f"{tag_r}_frac128"] = round(f128, 4)
        out[f"{tag_r}_frac32"] = round(f32, 4)
        out[f"{tag_r}_frac8"] = round(f8, 4)
        out[f"{tag_r}_q_given_block"] = round(float(q_in_on), 4)
        out[f"{tag_r}_q8_given_block"] = round(float(q8_in_on), 4)
        print(f"{tag_r:7s} on-frac 128: {f128:.4f}  32: {f32:.4f} "
              f"8: {f8:.4f}  P(q|blk): {q_in_on:.4f} "
              f"P(q8|blk): {q8_in_on:.4f}", flush=True)

    with open(os.path.join(HERE, "subgate_probe_result.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
