"""Probe: where does the 101k-tri culled kernel spend its time?

Measures, on the real TPU:
  1. kernel ms + visited-cluster stats for PRIMARY rays (coherent),
  2. the same for a realistic BOUNCE-1 batch (cosine respawn off the
     primary hits, misses respawned as fresh camera rays),
  3. the bounce batch SORTED by (hit-cluster id, direction octant) and
     by (octant, origin Morton),
  4. jnp.argsort cost at 64k keys (is per-bounce sorting affordable?),
and host-side (numpy): per-ray cluster-AABB incidence counts and
per-128-ray-row union sizes for each ordering — the per-ray-exact lower
bound vs what the row-granular kernel actually pays.

Usage: python benchmarks/stress_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

import jax
import jax.numpy as jnp

from tpu_pathtracer.ops.intersect_pallas_legacy import (
    pallas_closest_tuv_dma,
)
from tpu_pathtracer.ops.intersect_pallas import (
    CulledScene,
    RAY_TILE,
    RAYS_PER_TILE,
    TRI_CHUNK,
)
from tpu_pathtracer.render.camera import CameraController
from tpu_pathtracer.scene.pbrt_loader import parse_pbrt


def timed(fn, n=8):
    jax.block_until_ready(fn())  # compile + warmup
    t0 = time.time()
    r = None
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.time() - t0) / n


def row_stats(cmin, cmax, o, d, label):
    """numpy: per-ray incidence + per-row/tile unions for this order."""
    o = np.asarray(o)
    d = np.asarray(d)
    inv = 1.0 / np.where(np.abs(d) > 1e-8, d, 1e-8)
    t1 = (cmin[None, :, :] - o[:, None, :]) * inv[:, None, :]
    t2 = (cmax[None, :, :] - o[:, None, :]) * inv[:, None, :]
    tn = np.maximum(np.minimum(t1, t2).max(-1), 1e-4)
    tf = np.maximum(t1, t2).min(-1)
    hit = (tf >= tn) & (tf > 0)                    # (B, C)
    per_ray = hit.sum(1)
    rows = hit.reshape(-1, RAY_TILE, hit.shape[1]).any(1)   # (rows, C)
    tiles = hit.reshape(-1, RAYS_PER_TILE, hit.shape[1]).any(1)
    pairs = rows.sum()          # exact per-row pair workload (no early-out)
    print(
        f"[{label}] per-ray incidence mean {per_ray.mean():.1f} "
        f"p50 {np.percentile(per_ray, 50):.0f} "
        f"p95 {np.percentile(per_ray, 95):.0f}; "
        f"row-union mean {rows.sum(1).mean():.1f}; "
        f"tile-sched mean {tiles.sum(1).mean():.1f}; "
        f"total (row,cluster) pairs {pairs} "
        f"(per-ray-exact bound {per_ray.sum() / RAY_TILE:.0f})"
    )
    return hit


def main():
    scene = parse_pbrt("scenes/stress100k.pbrt")
    geom = scene.prims.build()
    cs = CulledScene(geom)
    cmin = np.asarray(cs.cluster_min)
    cmax = np.asarray(cs.cluster_max)
    ncl = cmin.shape[0]
    print(f"{geom.num_tris} tris, {ncl} clusters")

    eye, tgt, up = scene.camera_lookat
    cam = CameraController(
        lookfrom=np.array(eye, np.float32),
        lookat=np.array(tgt, np.float32),
        vup=np.array(up, np.float32),
        vfov=scene.camera_fov or 40.0,
        aspect=1.0,
    ).build()
    w = h = 256
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    u = jnp.asarray((xx.reshape(-1) + 0.5) / w, jnp.float32)
    v = jnp.asarray((yy.reshape(-1) + 0.5) / h, jnp.float32)
    o, d = cam.get_rays(u, v)

    def run(o_, d_):
        return pallas_closest_tuv_dma(
            cs.tri_pack, cs.cluster_min, cs.cluster_max, o_, d_
        )

    ms = timed(lambda: run(o, d)) * 1e3
    b = o.shape[0]
    print(f"primary: {ms:.2f} ms = {b / ms / 1e3:.2f} Mrays/s")

    # visited vs scheduled (early-out effectiveness), primary
    t, ridx, visited, count = pallas_closest_tuv_dma(
        cs.tri_pack, cs.cluster_min, cs.cluster_max, o, d,
        return_stats=True,
    )
    print(
        f"primary visited/scheduled: {np.asarray(visited).mean():.1f}"
        f"/{np.asarray(count).mean():.1f} per tile"
    )

    # --- bounce-1 batch: cosine respawn off the hits ---
    hit = cs.closest_hit(geom, o, d)
    key = jax.random.key(7)
    u1, u2 = jax.random.uniform(key, (2, b))
    # cosine hemisphere around n (Malley)
    r = jnp.sqrt(u1)
    phi = 2 * jnp.pi * u2
    n = hit.n
    up_ = jnp.where(
        jnp.abs(n[:, 2:3]) < 0.9,
        jnp.array([0.0, 0.0, 1.0]),
        jnp.array([1.0, 0.0, 0.0]),
    )
    tang = jnp.cross(up_, n)
    tang = tang / jnp.linalg.norm(tang, axis=1, keepdims=True)
    bit = jnp.cross(n, tang)
    local = jnp.stack(
        [r * jnp.cos(phi), r * jnp.sin(phi), jnp.sqrt(1 - u1)], 1
    )
    bd = (
        local[:, 0:1] * tang + local[:, 1:2] * bit + local[:, 2:3] * n
    )
    bo = hit.p + 1e-4 * n
    # misses respawn as fresh camera rays (same pixel) like the wavefront
    valid = hit.valid[:, None]
    bo = jnp.where(valid, bo, o)
    bd = jnp.where(valid, bd, d)
    bo, bd = jax.block_until_ready((bo, bd))
    frac = float(jnp.mean(hit.valid))
    print(f"bounce batch: {frac:.2f} of lanes are true bounce rays")

    ms = timed(lambda: run(bo, bd)) * 1e3
    print(f"bounce natural order: {ms:.2f} ms = {b / ms / 1e3:.2f} Mrays/s")

    # --- sorted by (hit cluster, octant) ---
    oct_ = (
        (bd[:, 0] > 0).astype(jnp.int32)
        + 2 * (bd[:, 1] > 0).astype(jnp.int32)
        + 4 * (bd[:, 2] > 0).astype(jnp.int32)
    )
    ckey = jnp.where(hit.valid, ridx // TRI_CHUNK, ncl + 1)
    perm = np.asarray(jnp.argsort(ckey * 8 + oct_))
    bo_s, bd_s = bo[perm], bd[perm]
    ms = timed(lambda: run(bo_s, bd_s)) * 1e3
    print(f"bounce sorted(cluster,oct): {ms:.2f} ms = "
          f"{b / ms / 1e3:.2f} Mrays/s")

    # --- sorted by (octant, origin morton) — the existing sort_rays key
    from tpu_pathtracer.render.integrator import _morton30

    lo = jnp.min(geom.corners.reshape(-1, 3), axis=0)
    hi = jnp.max(geom.corners.reshape(-1, 3), axis=0)
    code = (oct_ << 27) | (_morton30(bo, lo, 1.0 / (hi - lo)) >> 3)
    perm2 = np.asarray(jnp.argsort(code))
    bo_m, bd_m = bo[perm2], bd[perm2]
    ms = timed(lambda: run(bo_m, bd_m)) * 1e3
    print(f"bounce sorted(oct,morton): {ms:.2f} ms = "
          f"{b / ms / 1e3:.2f} Mrays/s")

    # --- argsort cost at 64k on TPU ---
    k64 = jnp.asarray(np.random.randint(0, 1 << 30, b).astype(np.int32))
    ms = timed(lambda: jnp.argsort(k64), n=16) * 1e3
    print(f"argsort 64k i32: {ms:.2f} ms")
    sortfn = jax.jit(lambda kk, *arrs: tuple(
        a[jnp.argsort(kk)] for a in arrs))
    ms = timed(lambda: sortfn(k64, bo, bd, t, ridx), n=16) * 1e3
    print(f"argsort + 4-array gather: {ms:.2f} ms")

    # --- host-side union stats per ordering ---
    row_stats(cmin, cmax, o, d, "primary")
    row_stats(cmin, cmax, bo, bd, "bounce natural")
    row_stats(cmin, cmax, bo_s, bd_s, "bounce sorted(cluster,oct)")
    row_stats(cmin, cmax, bo_m, bd_m, "bounce sorted(oct,morton)")


if __name__ == "__main__":
    main()
