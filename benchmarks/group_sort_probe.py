"""Within-tile ray regrouping: host-side pair-count upper bound.

The grouped kernel's pair count is SUM over 8-ray groups of the union
of member cluster incidences. Production groups are fixed 8-lane
windows of the pixel-block swizzle — coherent for camera rays,
direction-spread for bounce rays. This probe measures how many pairs a
WITHIN-TILE regroup would save: sort each 1024-ray kernel tile's lanes
by (octant, nearest-touched-cluster) — both available from the prepass
— and re-cut 8-ray groups from the sorted order. A minor-dim batched
sort costs ~0.02 ms on TPU (vs the dead 3.8 ms global argsort), so if
the pair savings are large this becomes a kernel-side lever; if small,
the group-granularity floor is confirmed.

Usage: python benchmarks/group_sort_probe.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from cluster_quality import leaf_bounds  # noqa: E402


def ray_hits(cmin, cmax, o, d, t_min=1e-4):
    """Per-ray cluster incidence + nearest-touched-cluster id."""
    n = o.shape[0]
    c = cmin.shape[0]
    safe = np.where(np.abs(d) > 1e-8, d, 1e-8)
    inv = 1.0 / safe
    hits = np.zeros((n, c), bool)
    cbest = np.zeros(n, np.int32)
    for s in range(0, n, 4096):
        ot = o[s:s + 4096, None, :]
        it = inv[s:s + 4096, None, :]
        t1 = (cmin[None] - ot) * it
        t2 = (cmax[None] - ot) * it
        tn = np.minimum(t1, t2).max(-1)
        tf = np.maximum(t1, t2).min(-1)
        h = tf >= np.maximum(tn, t_min)
        hits[s:s + 4096] = h
        tn = np.where(h, np.maximum(tn, t_min), np.inf)
        cbest[s:s + 4096] = tn.argmin(-1)
    return hits, cbest


def pairs_for_grouping(hits, perm=None, group=8):
    h = hits if perm is None else hits[perm]
    return int(h.reshape(-1, group, h.shape[1]).any(1).sum())


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import tpu_pathtracer.ops.intersect_pallas as ip
    from tpu_pathtracer.render.camera import CameraController
    from tpu_pathtracer.render.renderer import _tile_swizzle
    from tpu_pathtracer.scene.pbrt_loader import parse_pbrt

    scene = parse_pbrt("scenes/stress100k.pbrt")
    geom = scene.prims.build()
    v0 = np.asarray(geom.tri_v0)
    v1 = v0 + np.asarray(geom.tri_e1)
    v2 = v0 + np.asarray(geom.tri_e2)
    tmin = np.minimum(np.minimum(v0, v1), v2)
    tmax = np.maximum(np.maximum(v0, v1), v2)
    order = ip.median_split_order(geom)
    cmin, cmax = leaf_bounds(tmin, tmax, order, ip.TRI_CHUNK)

    eye, tgt, up = scene.camera_lookat
    cam = CameraController(
        lookfrom=np.array(eye, np.float32),
        lookat=np.array(tgt, np.float32),
        vup=np.array(up, np.float32),
        vfov=scene.camera_fov or 40.0, aspect=1.0,
    ).build()
    n, side = 65536, 256
    # production lane order: the 4x2-pixel-block swizzle
    swz, _ = _tile_swizzle(side, side, n)
    px = (swz % side).astype(np.float64)
    py = (swz // side).astype(np.float64)
    o_c, d_c = (np.asarray(x) for x in cam.get_rays(
        jnp.asarray((px + 0.5) / side), jnp.asarray((py + 0.5) / side)))

    # bounce-shaped: cosine hemisphere from the camera hit surface,
    # approximated by scattering origins near the scene's front surface
    # with locally-correlated positions (same swizzle layout) and
    # cosine-spread directions about +z-ish normals.
    rng = np.random.default_rng(7)
    lo, hi = tmin.min(0), tmax.max(0)
    jitter = rng.random((n, 3)) * 0.02 * (hi - lo)
    o_b = o_c + d_c * 2.0 + jitter            # roughly on the blob front
    nrm = rng.standard_normal((n, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    d_b = nrm * np.sign(nrm[:, 2:3])          # hemisphere, spread dirs

    for tag, (o, d) in {"coherent": (o_c, d_c),
                        "bounce-ish": (o_b, d_b.astype(np.float32))}.items():
        hits, cbest = ray_hits(cmin, cmax, o, d)
        base = pairs_for_grouping(hits)
        octant = ((d[:, 0] > 0) + 2 * (d[:, 1] > 0)
                  + 4 * (d[:, 2] > 0)).astype(np.int64)
        key = octant * (cmin.shape[0] + 1) + cbest
        perm = np.concatenate([
            s + 1024 * t for t in range(n // 1024)
            for s in [np.argsort(key[t * 1024:(t + 1) * 1024],
                                 kind="stable")]
        ])
        regrp = pairs_for_grouping(hits, perm)
        floor = int(hits.sum())  # per-ray incidence (group=1)
        print(f"{tag}: pairs fixed-groups {base} ({base/(n//8):.2f}/grp) "
              f"-> tile-sorted {regrp} ({regrp/(n//8):.2f}/grp, "
              f"{base/max(regrp,1):.2f}x fewer); per-ray floor "
              f"{floor/n:.2f}/ray = {floor/8/(n//8):.2f}/grp-equiv",
              flush=True)


if __name__ == "__main__":
    main()
