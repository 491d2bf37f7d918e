"""Host-side cluster layout for the culled intersectors.

The HBM-streaming kernels (intersect_pallas.py) operate on triangles
spatially ordered and grouped into 128-triangle clusters — the kernel's
natural DMA granule. This module owns that layout: the shared tile/chunk
constants, the packed schedule-key bit layout, the cluster orderings
(Morton, recursive median split), the compile-cache shape bucketing, and
the ordered triangle pack builder. Pure host/NumPy code — no Pallas.

Split out of intersect_pallas.py (round-5 VERDICT item 9) verbatim; no
behavior change. Plays the role of the reference's host BVH build
(/root/reference/include/rendering/bvh.h:76-219) for the cluster
schedule.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..scene.mesh import Geometry, host_array

TRI_CHUNK = 128      # triangles per inner-loop chunk (sublane dim)
RAY_TILE = 128       # rays per lane row
DMA_ROWS = 8         # lane rows per culled-kernel tile (fine cull masks)
RAYS_PER_TILE = RAY_TILE * DMA_ROWS  # cull-mask granularity (rays/tile)

# Packed cluster-key layout (one int32 per cluster slot):
#   [bit 30] inactive  [bits 20..29] tnear bucket  [bits 12..19] row
#   bits  [bits 0..11] cluster id
# A single-operand jnp.sort on this key yields the active-first,
# front-to-back, fully deterministic cluster schedule — multi-operand
# lexicographic lax.sort measured 25 ms/bounce on the 101k-tri scene,
# single-key sort is ~10x cheaper. The id field caps scenes at
# _MAX_CLUSTERS clusters (1.05M triangles at 13 id bits; the row
# kernel's layout then carries 13 id + 8 row + 9 bucket + inactive
# bit 30 — widening id past 13 would start eating row bits).
_ID_BITS = 13
_BITS_SHIFT = _ID_BITS
_BUCKET_SHIFT = _ID_BITS + DMA_ROWS
_BUCKETS = 1 << (30 - _BUCKET_SHIFT)
_MAX_CLUSTERS = 1 << _ID_BITS

# The GROUPED kernels carry their masks out-of-key, so the 8 row-mask
# bits of the row-kernel key layout are free: cluster ids get 21 bits
# (2M clusters = 268M triangles in ONE pack) and the bucket field keeps
# the exact same shift/width as the row layout.
_GID_BITS = _BUCKET_SHIFT           # 21
_GMAX_CLUSTERS = 1 << _GID_BITS

_SC = 8                  # clusters per SUPERCLUSTER schedule entry
                         # (also the pack rounding quantum; see the
                         # supercluster walk in intersect_pallas_lab.py)


def morton_order(geom: Geometry) -> np.ndarray:
    """Triangle permutation by Morton code of the bbox centroid."""
    v0 = host_array(geom.tri_v0)
    v1 = v0 + host_array(geom.tri_e1)
    v2 = v0 + host_array(geom.tri_e2)
    tmin = np.minimum(np.minimum(v0, v1), v2)
    tmax = np.maximum(np.maximum(v0, v1), v2)
    cen = 0.5 * (tmin + tmax)
    lo, hi = cen.min(0), cen.max(0)
    norm = (cen - lo) / np.maximum(hi - lo, 1e-12)
    q = np.clip(norm * 1023.0, 0, 1023).astype(np.uint64)

    def expand(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    code = (expand(q[:, 0]) << 2) | (expand(q[:, 1]) << 1) | expand(
        q[:, 2]
    )
    return np.argsort(code, kind="stable").astype(np.int32)


def median_split_order(geom: Geometry) -> np.ndarray:
    """Triangle permutation by recursive longest-axis object-median split.

    Split points snap to multiples of TRI_CHUNK, so the consecutive
    128-triangle blocks that become cull clusters are the LEAVES of the
    split tree — spatially compact boxes instead of arbitrary Morton-run
    spans. Same cluster count, same pack layout, same kernels; measured
    on stress100k (benchmarks/cluster_quality.py): group→cluster pair
    count 86.3k → 36.4k coherent (2.37x) and 30.4k → 16.2k incoherent
    (1.87x) vs morton_order. Plays the role of the reference's BVH
    build quality (reference include/rendering/bvh.h:64-120 midpoint
    split) for the cluster schedule.
    """
    v0 = host_array(geom.tri_v0)
    v1 = v0 + host_array(geom.tri_e1)
    v2 = v0 + host_array(geom.tri_e2)
    cen = 0.5 * (np.minimum(np.minimum(v0, v1), v2)
                 + np.maximum(np.maximum(v0, v1), v2))
    out = []

    def rec(idx):
        if idx.shape[0] <= TRI_CHUNK:
            out.append(idx)
            return
        c = cen[idx]
        axis = int(np.argmax(c.max(0) - c.min(0)))
        half = idx.shape[0] // 2
        k = max(TRI_CHUNK, (half // TRI_CHUNK) * TRI_CHUNK)
        if k >= idx.shape[0]:
            k = idx.shape[0] - TRI_CHUNK
        # argpartition, not argsort: the split only needs the below/
        # above-median SETS (deeper recursion refines order; leaves
        # are unordered 128-tri clusters) — O(n) per level instead of
        # O(n log n), ~2x faster clustering at 2.1M tris. Deterministic
        # for a given input.
        part = np.argpartition(c[:, axis], k)
        rec(idx[part[:k]])
        rec(idx[part[k:]])

    rec(np.arange(cen.shape[0], dtype=np.int32))
    return np.concatenate(out)


def _bucket_clusters(c: int) -> int:
    """Cluster-count compile-cache bucket: round up to a multiple of
    max(_SC, 2^(msb(c)) / 16) — at most 16 distinct shapes per octave,
    worst-case pad 6.7%. Scenes whose cluster counts land in the same
    bucket compile to identical HLO (the persistent XLA cache then
    serves the 13-min remote compile of the big-scene programs). Pad
    is not free at runtime (the schedule sort and block gate scale
    with cpad), so the quantum balances cache hits against that tax:
    stress2m's 16408 clusters bucket to 17408 (+6.1%). Small scenes
    (c <= 128) keep the old _SC-multiple rounding exactly, so the pad
    there is the supercluster rounding we always paid."""
    q = max(_SC, (1 << max(c.bit_length() - 1, 0)) >> 4)
    return min(-(-c // q) * q, _GMAX_CLUSTERS)


def pack_triangles_ordered(geom: Geometry, order: np.ndarray):
    """Morton-permuted triangle constants in TRANSPOSED layout (16, Tpad):
    constants on sublanes, triangles on lanes. Unlike the (Tpad, 16)
    layout this has no lane padding (exact 64B/triangle), so XLA can stage
    it in VMEM inside loops without 8x bloat, and per-cluster slices are
    lane-aligned for DMA. Row 12 carries the triangle's LOGICAL primitive
    id (f32-exact below 2^24; padding lanes get -2, matching no real
    primitive) so the any-hit variant can apply source/target exclusion
    in-kernel. Returns (tri_pack_T, cluster_min, cluster_max).
    """
    inv = host_array(geom.tri_inv)[order]
    v0 = host_array(geom.tri_v0)[order]
    e1 = host_array(geom.tri_e1)[order]
    e2 = host_array(geom.tri_e2)[order]
    t = inv.shape[0]
    # COMPILE-CACHE SHAPE BUCKETING (VERDICT r4 #4): the remote compile
    # of the big-scene wavefront program costs 13-14 min, and every new
    # scene used to get fresh (cluster, tri) shapes. Clusters round up
    # to <=8 sizes per octave (pad <=12.5%) and the pack to exactly
    # cbucket*TRI_CHUNK columns, so nearby scene sizes share one HLO
    # and hit the persistent cache. Padded clusters carry NaN bounds:
    # NaN fails every slab compare, so they never gate on, never
    # schedule, never contribute to tn/texit — bitwise-invisible.
    # ((inf, -inf) boxes would spuriously slab-HIT: the per-axis
    # min/max recovers a full interval. NaN is the only always-miss
    # pad under this formulation.) Padded tris keep a zero inverse
    # (NaN t -> rejected) and prim -2. The _SC*TRI_CHUNK supercluster
    # rounding is subsumed: cbucket is a multiple of _SC.
    c = (t + TRI_CHUNK - 1) // TRI_CHUNK
    cbucket = _bucket_clusters(c)
    tpad = cbucket * TRI_CHUNK
    out = np.zeros((tpad, 16), np.float32)
    out[:t, 0:9] = inv.reshape(t, 9)
    out[:t, 9:12] = np.einsum("tij,tj->ti", inv, v0)
    out[:t, 12] = host_array(geom.tri_prim)[order]
    out[t:, 12] = -2.0

    v1, v2 = v0 + e1, v0 + e2
    tmin = np.minimum(np.minimum(v0, v1), v2)
    tmax = np.maximum(np.maximum(v0, v1), v2)
    cmin = np.full((c, TRI_CHUNK, 3), np.inf, np.float32)
    cmax = np.full((c, TRI_CHUNK, 3), -np.inf, np.float32)
    cmin.reshape(-1, 3)[:t] = tmin
    cmax.reshape(-1, 3)[:t] = tmax
    cmin = cmin.min(axis=1)
    cmax = cmax.max(axis=1)
    pad = np.full((cbucket - c, 3), np.nan, np.float32)
    return (
        jnp.asarray(out.T.copy()),
        jnp.asarray(np.concatenate([cmin, pad])),
        jnp.asarray(np.concatenate([cmax, pad])),
    )
