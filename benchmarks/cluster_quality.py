"""Cluster-quality ablation for the grouped culled intersector (host-only).

The grouped kernel's work is SUM over 8-ray groups of the number of
clusters whose AABB the group hits (pair count; 58 cycles each). The
current clustering is "consecutive 128-tri runs of Morton order". This
script scores alternative triangle orders by EXACT pair count on the
stress scene's coherent and incoherent ray sets, without touching the
TPU: slab-test every (group, cluster) with the same math as the
prepass, count pairs.

Orders:
  morton : ops.intersect_pallas.morton_order (production today)
  median : recursive longest-axis object-median split, leaf boundaries
           forced to multiples of TRI_CHUNK so cluster count and the
           kernel are unchanged - only the permutation differs.

Usage: python benchmarks/cluster_quality.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def group_pairs(cmin, cmax, o, d, t_min=1e-4, group=8):
    """Exact pair count: per 8-ray group, clusters whose slab interval
    is non-empty for ANY member ray (matches _kernel_prepass_groups)."""
    n = o.shape[0]
    safe = np.where(np.abs(d) > 1e-8, d, 1e-8)
    inv = 1.0 / safe
    hits = np.zeros((n // group, cmin.shape[0]), bool)
    for s in range(0, n, 4096):
        ot = o[s:s + 4096, None, :]
        it = inv[s:s + 4096, None, :]
        t1 = (cmin[None] - ot) * it
        t2 = (cmax[None] - ot) * it
        tn = np.minimum(t1, t2).max(-1)
        tf = np.maximum(t1, t2).min(-1)
        h = (tf >= np.maximum(tn, t_min))
        hits[s // group:(s + 4096) // group] |= (
            h.reshape(-1, group, cmin.shape[0]).any(1))
    return int(hits.sum()), hits


def leaf_bounds(tmin, tmax, order, chunk):
    t = order.shape[0]
    tpad = ((t + chunk - 1) // chunk) * chunk
    cmin = np.full((tpad // chunk, chunk, 3), np.inf, np.float32)
    cmax = np.full((tpad // chunk, chunk, 3), -np.inf, np.float32)
    cmin.reshape(-1, 3)[:t] = tmin[order]
    cmax.reshape(-1, 3)[:t] = tmax[order]
    return cmin.min(1), cmax.max(1)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    import tpu_pathtracer.ops.intersect_pallas as ip
    from tpu_pathtracer.render.camera import CameraController
    from tpu_pathtracer.scene.pbrt_loader import parse_pbrt

    scene = parse_pbrt("scenes/stress100k.pbrt")
    geom = scene.prims.build()
    v0 = np.asarray(geom.tri_v0)
    v1 = v0 + np.asarray(geom.tri_e1)
    v2 = v0 + np.asarray(geom.tri_e2)
    tmin = np.minimum(np.minimum(v0, v1), v2)
    tmax = np.maximum(np.maximum(v0, v1), v2)
    t = v0.shape[0]
    print(f"tris {t}")

    eye, tgt, up = scene.camera_lookat
    cam = CameraController(
        lookfrom=np.array(eye, np.float32),
        lookat=np.array(tgt, np.float32),
        vup=np.array(up, np.float32),
        vfov=scene.camera_fov or 40.0, aspect=1.0,
    ).build()
    n = 65536
    side = int(np.sqrt(n))
    # same 4x2-block swizzle as production grouped tracing
    u = (np.arange(n) % side + 0.5) / side
    v = (np.arange(n) // side + 0.5) / side
    o_c, d_c = (np.asarray(x) for x in cam.get_rays(
        jnp.asarray(u), jnp.asarray(v)))

    rng = np.random.default_rng(3)
    lo, hi = tmin.min(0), tmax.max(0)
    o_i = (rng.random((n, 3)) * (hi - lo) + lo).astype(np.float32)
    d_i = rng.standard_normal((n, 3)).astype(np.float32)
    d_i /= np.linalg.norm(d_i, axis=-1, keepdims=True)

    orders = {
        "morton": ip.morton_order(geom),
        "median": ip.median_split_order(geom),
    }
    for name, order in orders.items():
        assert np.array_equal(np.sort(order), np.arange(t)), name
        cmin, cmax = leaf_bounds(tmin, tmax, order, ip.TRI_CHUNK)
        area = (lambda e: 2 * (e[:, 0] * e[:, 1] + e[:, 1] * e[:, 2]
                               + e[:, 0] * e[:, 2]))(
            np.maximum(cmax - cmin, 0))
        pc, _ = group_pairs(cmin, cmax, o_c, d_c)
        pi, _ = group_pairs(cmin, cmax, o_i, d_i)
        print(f"{name}: clusters {cmin.shape[0]}  "
              f"mean_area {area[np.isfinite(area)].mean():.4f}  "
              f"pairs coherent {pc} ({pc / (n // 8):.2f}/grp)  "
              f"incoherent {pi} ({pi / (n // 8):.2f}/grp)", flush=True)


if __name__ == "__main__":
    main()
