"""Pallas TPU kernels for batched ray-triangle closest-hit.

The XLA brute-force intersector (ops/intersect.py) materializes (B, T)
temporaries in HBM every bounce; these kernels keep the whole triangle set
resident in VMEM and stream rays through the VPU, writing only per-ray
results — the hot op of the wavefront loop at memory-traffic speed of light.

Layout: triangles live on *sublanes*, rays on *lanes*:
  * per-triangle constants are packed as (Tpad, 16) f32 blocks, Tpad a
    multiple of the 128-sublane chunk;
  * each grid step processes 8 lane-rows of 128 rays, fori-looping over
    128-triangle chunks with a running (t_min, id) carried in registers;
  * the full-hit kernel runs a second chunk loop that selects the winning
    triangle's shading attributes (normal/albedo/emission/material/prim)
    with an exact-id one-hot mask — replacing four XLA gathers per bounce
    that cost more than the intersection itself;
  * (128, 128) pair tiles never leave VMEM/registers.

Semantics identical to ops/intersect.intersect_tuv + argmin: first-minimum
tie-break, t > 1e-8, t >= t_min, NaN-safe (degenerate triangles have a
zero inverse -> t = NaN -> ordered comparisons reject).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.mesh import Geometry, host_array
from .cluster_layout import (
    DMA_ROWS,
    RAYS_PER_TILE,
    RAY_TILE,
    TRI_CHUNK,
    _BITS_SHIFT,
    _BUCKETS,
    _BUCKET_SHIFT,
    _GID_BITS,
    _GMAX_CLUSTERS,
    _ID_BITS,
    _MAX_CLUSTERS,
    _SC,
    _bucket_clusters,
    median_split_order,
    morton_order,
    pack_triangles_ordered,
)

ROWS_PER_STEP = 32   # lane rows per grid step (amortizes step overhead)


def ray_batch_multiple() -> int:
    """Pallas ray batches must be a multiple of this many rays."""
    return RAY_TILE * ROWS_PER_STEP
ATTR_COLS = 16       # packed attribute width
_BIG_ID = 2**30


def _pallas_call(*args, **kwargs):
    """pl.pallas_call that interprets on CPU (virtual-mesh tests and the
    driver's multichip dryrun run every backend without TPU hardware;
    on the TPU backend this is a zero-cost passthrough)."""
    if jax.default_backend() == "cpu":
        kwargs.setdefault("interpret", True)
    return pl.pallas_call(*args, **kwargs)


def _tri_pad(t: int) -> int:
    """Sublane-aligned triangle padding: small scenes pad to a multiple of
    8 (the f32 sublane tile) instead of a full 128-chunk — a 32-triangle
    Cornell box then costs 32 sublanes of kernel work, not 128."""
    if t <= TRI_CHUNK:
        return max(8, ((t + 7) // 8) * 8)
    return ((t + TRI_CHUNK - 1) // TRI_CHUNK) * TRI_CHUNK


def pack_triangles(geom: Geometry) -> jax.Array:
    """(Tpad, 16) packed intersection constants: inv (9) + c = inv@v0 (3)."""
    inv = host_array(geom.tri_inv)                    # (T, 3, 3)
    v0 = host_array(geom.tri_v0)                      # (T, 3)
    t = inv.shape[0]
    tpad = _tri_pad(t)
    out = np.zeros((tpad, 16), np.float32)
    out[:t, 0:9] = inv.reshape(t, 9)
    out[:t, 9:12] = np.einsum("tij,tj->ti", inv, v0)
    # rows >= t keep a zero inverse -> NaN t -> rejected in-kernel
    return jnp.asarray(out)


def pack_attributes(geom: Geometry, guide_table=None) -> jax.Array:
    """(16, Tpad) per-triangle shading attributes (transposed: attributes on
    sublanes, triangles on lanes), pre-dereferenced through tri_prim so the
    kernel needs no indirection:
    rows [nx ny nz | ar ag ab | er eg eb | material | prim_id | pad].
    prim_id is exact in f32 for < 2^24 primitives.

    With `guide_table` ((N, 16) — CDFPack.prim_table), the pack gains 16
    more rows [16:32] carrying the hit primitive's guided-sampling row,
    so the SAME one-hot contraction that selects shading attributes also
    delivers the guided integrator's prim_table fetch for free."""
    prim = host_array(geom.tri_prim)
    t = prim.shape[0]
    tpad = _tri_pad(t)
    rows = ATTR_COLS if guide_table is None else 2 * ATTR_COLS
    out = np.zeros((rows, tpad), np.float32)
    out[0:3, :t] = host_array(geom.normal)[prim].T
    out[3:6, :t] = host_array(geom.albedo)[prim].T
    out[6:9, :t] = host_array(geom.emission)[prim].T
    out[9, :t] = host_array(geom.material)[prim]
    out[10, :t] = prim
    if guide_table is not None:
        out[ATTR_COLS:, :t] = np.asarray(guide_table)[prim].T
    return jnp.asarray(out)


def _row_closest(tri_ref, n_chunks, t_min, rox, roy, roz, rdx, rdy, rdz):
    """Closest (t, triangle id) for one (1, 128) lane-row of rays."""
    csize = min(TRI_CHUNK, tri_ref.shape[0])

    def chunk(c, carry):
        t_cur, id_cur = carry
        blk = tri_ref[pl.ds(c * csize, csize), :]          # (csize, 16)

        def col(k):
            return blk[:, k][:, None]                       # (128, 1)

        os_ = col(6) * rox + col(7) * roy + col(8) * roz - col(11)
        ds_ = col(6) * rdx + col(7) * rdy + col(8) * rdz
        t = -os_ / ds_
        u = (col(0) * rox + col(1) * roy + col(2) * roz - col(9)) + t * (
            col(0) * rdx + col(1) * rdy + col(2) * rdz
        )
        v = (col(3) * rox + col(4) * roy + col(5) * roz - col(10)) + t * (
            col(3) * rdx + col(4) * rdy + col(5) * rdz
        )
        ok = (
            (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > 1e-8) & (t >= t_min)
        )
        tt = jnp.where(ok, t, jnp.inf)                      # (128, 128)

        tmin_c = jnp.min(tt, axis=0, keepdims=True)          # (1, 128)
        ids = (
            jax.lax.broadcasted_iota(jnp.int32, tt.shape, 0)
            + c * csize
        )
        idc = jnp.min(
            jnp.where(tt == tmin_c, ids, _BIG_ID), axis=0, keepdims=True
        )
        better = tmin_c < t_cur
        return (
            jnp.where(better, tmin_c, t_cur),
            jnp.where(better, idc, id_cur),
        )

    t0 = jnp.full((1, RAY_TILE), jnp.inf)
    i0 = jnp.full((1, RAY_TILE), -1, jnp.int32)
    return jax.lax.fori_loop(0, n_chunks, chunk, (t0, i0))


def _kernel(tri_ref, ox, oy, oz, dx, dy, dz, tmin_ref, t_out, id_out):
    n_chunks = tri_ref.shape[0] // min(TRI_CHUNK, tri_ref.shape[0])
    t_min = tmin_ref[0]
    for r in range(ROWS_PER_STEP):
        t_fin, id_fin = _row_closest(
            tri_ref, n_chunks, t_min,
            ox[r:r + 1, :], oy[r:r + 1, :], oz[r:r + 1, :],
            dx[r:r + 1, :], dy[r:r + 1, :], dz[r:r + 1, :],
        )
        t_out[r:r + 1, :] = t_fin
        id_out[r:r + 1, :] = jnp.maximum(id_fin, 0)


def _row_closest_full(tri_ref, attr_ref, n_chunks, t_min,
                      rox, roy, roz, rdx, rdy, rdz):
    """Closest hit + winner attributes for one lane-row: the per-chunk
    winner's attribute column is selected with a one-hot (16, 128) x
    (128, 128) f32 matmul (MXU, HIGHEST precision -> exact for one-hot)
    and blended into the running record."""

    csize = min(TRI_CHUNK, tri_ref.shape[0])

    def chunk(c, carry):
        t_cur, id_cur, attr_cur = carry
        blk = tri_ref[pl.ds(c * csize, csize), :]          # (csize, 16)

        def col(k):
            return blk[:, k][:, None]                       # (128, 1)

        os_ = col(6) * rox + col(7) * roy + col(8) * roz - col(11)
        ds_ = col(6) * rdx + col(7) * rdy + col(8) * rdz
        t = -os_ / ds_
        u = (col(0) * rox + col(1) * roy + col(2) * roz - col(9)) + t * (
            col(0) * rdx + col(1) * rdy + col(2) * rdz
        )
        v = (col(3) * rox + col(4) * roy + col(5) * roz - col(10)) + t * (
            col(3) * rdx + col(4) * rdy + col(5) * rdz
        )
        ok = (
            (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > 1e-8) & (t >= t_min)
        )
        tt = jnp.where(ok, t, jnp.inf)                      # (128, 128)

        tmin_c = jnp.min(tt, axis=0, keepdims=True)          # (1, 128)
        ids = (
            jax.lax.broadcasted_iota(jnp.int32, tt.shape, 0)
            + c * csize
        )
        idc = jnp.min(
            jnp.where(tt == tmin_c, ids, _BIG_ID), axis=0, keepdims=True
        )
        onehot = ((ids == idc) & (tt == tmin_c)).astype(jnp.float32)
        attr_blk = attr_ref[:, pl.ds(c * csize, csize)]    # (16, csize)
        attrs_c = jax.lax.dot_general(
            attr_blk, onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                    # (16, 128)
        better = tmin_c < t_cur                              # (1, 128)
        return (
            jnp.where(better, tmin_c, t_cur),
            jnp.where(better, idc, id_cur),
            jnp.where(better, attrs_c, attr_cur),
        )

    t0 = jnp.full((1, RAY_TILE), jnp.inf)
    i0 = jnp.full((1, RAY_TILE), -1, jnp.int32)
    a0 = jnp.zeros((attr_ref.shape[0], RAY_TILE), jnp.float32)
    return jax.lax.fori_loop(0, n_chunks, chunk, (t0, i0, a0))


def _kernel_full(tri_ref, attr_ref, ox, oy, oz, dx, dy, dz, tmin_ref,
                 t_out, id_out, attr_out):
    n_chunks = tri_ref.shape[0] // min(TRI_CHUNK, tri_ref.shape[0])
    t_min = tmin_ref[0]
    for r in range(ROWS_PER_STEP):
        t_fin, id_fin, attrs = _row_closest_full(
            tri_ref, attr_ref, n_chunks, t_min,
            ox[r:r + 1, :], oy[r:r + 1, :], oz[r:r + 1, :],
            dx[r:r + 1, :], dy[r:r + 1, :], dz[r:r + 1, :],
        )
        t_out[r:r + 1, :] = t_fin
        id_out[r:r + 1, :] = jnp.maximum(id_fin, 0)
        if attr_out.shape[0] > 11:
            # guide-augmented pack: emit attrs + the 16 guide rows
            attr_out[:, r, :] = jnp.concatenate(
                [attrs[:11, :], attrs[ATTR_COLS:, :]], axis=0
            )
        else:
            attr_out[:, r, :] = attrs[:11, :]


def _pad_rays(*arrays):
    """Pad ray-batch arrays to the kernel batch multiple; returns
    (padded_arrays, original_size). Padding lanes trace dummy rays whose
    outputs are sliced away."""
    b = arrays[0].shape[0]
    m = RAY_TILE * ROWS_PER_STEP
    pad = (-b) % m
    if pad == 0:
        return arrays, b
    out = []
    for a in arrays:
        fill = jnp.ones((pad,) + a.shape[1:], a.dtype)
        out.append(jnp.concatenate([a, fill]))
    return tuple(out), b


def _ray_comps(o, d, rows):
    return [
        o[:, 0].reshape(rows, RAY_TILE),
        o[:, 1].reshape(rows, RAY_TILE),
        o[:, 2].reshape(rows, RAY_TILE),
        d[:, 0].reshape(rows, RAY_TILE),
        d[:, 1].reshape(rows, RAY_TILE),
        d[:, 2].reshape(rows, RAY_TILE),
    ]


def _ray_spec():
    return pl.BlockSpec(
        (ROWS_PER_STEP, RAY_TILE), lambda i: (i, 0),
        memory_space=pltpu.VMEM,
    )


@partial(jax.jit, static_argnames=())
def pallas_closest_tuv(tri_pack: jax.Array, o, d, t_min=1e-4):
    """(t, tri_idx) closest hit (any batch size; padded internally)."""
    (o, d), b0 = _pad_rays(o, d)
    b = o.shape[0]
    rows = b // RAY_TILE

    ray_spec = _ray_spec()
    t, idx = _pallas_call(
        _kernel,
        grid=(rows // ROWS_PER_STEP,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [ray_spec] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, RAY_TILE), jnp.float32),
            jax.ShapeDtypeStruct((rows, RAY_TILE), jnp.int32),
        ],
    )(tri_pack, *_ray_comps(o, d, rows), jnp.full((1,), t_min, jnp.float32))
    return t.reshape(b)[:b0], idx.reshape(b)[:b0]


@partial(jax.jit, static_argnames=())
def pallas_closest_record(tri_pack, attr_pack, o, d, t_min=1e-4):
    """Full hit query: (t, tri_idx, attrs) with attrs (11, B) f32 rows
    [nx ny nz ar ag ab er eg eb material prim] — or (27, B) with the 16
    guided-sampling rows appended when attr_pack is guide-augmented."""
    (o, d), b0 = _pad_rays(o, d)
    b = o.shape[0]
    rows = b // RAY_TILE
    n_attr = 11 if attr_pack.shape[0] <= ATTR_COLS else 27

    ray_spec = _ray_spec()
    attr_spec = pl.BlockSpec(
        (n_attr, ROWS_PER_STEP, RAY_TILE), lambda i: (0, i, 0),
        memory_space=pltpu.VMEM,
    )
    t, idx, attrs = _pallas_call(
        _kernel_full,
        grid=(rows // ROWS_PER_STEP,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        + [ray_spec] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[ray_spec, ray_spec, attr_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, RAY_TILE), jnp.float32),
            jax.ShapeDtypeStruct((rows, RAY_TILE), jnp.int32),
            jax.ShapeDtypeStruct((n_attr, rows, RAY_TILE), jnp.float32),
        ],
    )(
        tri_pack, attr_pack, *_ray_comps(o, d, rows),
        jnp.full((1,), t_min, jnp.float32),
    )
    return (
        t.reshape(b)[:b0],
        idx.reshape(b)[:b0],
        attrs.reshape(n_attr, b)[:, :b0],
    )


def pallas_closest_hit(geom: Geometry, tri_pack, o, d, t_min=1e-4,
                       t_max=jnp.inf, attr_pack=None):
    """Drop-in equivalent of ops.intersect.closest_hit.

    With attr_pack (pack_attributes), shading attributes come out of the
    kernel directly (no XLA gathers); otherwise they are gathered.
    """
    from .intersect import Hit

    if attr_pack is not None:
        t, tri_idx, attrs = pallas_closest_record(
            tri_pack, attr_pack, o, d, t_min
        )
        valid = jnp.isfinite(t) & (t < t_max)
        p = o + jnp.where(valid, t, 0.0)[:, None] * d
        return Hit(
            valid=valid,
            t=jnp.where(valid, t, jnp.inf),
            prim=attrs[10].astype(jnp.int32),
            p=p,
            n=attrs[0:3].T,
            albedo=attrs[3:6].T,
            emission=attrs[6:9].T,
            material=attrs[9].astype(jnp.int32),
            guide=attrs[11:27].T if attrs.shape[0] > 11 else None,
        )

    t, tri_idx = pallas_closest_tuv(tri_pack, o, d, t_min)
    valid = jnp.isfinite(t) & (t < t_max)
    prim = jnp.where(valid, geom.tri_prim[tri_idx], 0)
    p = o + jnp.where(valid, t, 0.0)[:, None] * d
    return Hit(
        valid=valid,
        t=jnp.where(valid, t, jnp.inf),
        prim=prim,
        p=p,
        n=geom.normal[prim],
        albedo=geom.albedo[prim],
        emission=jnp.where(valid[:, None], geom.emission[prim], 0.0),
        material=geom.material[prim],
    )


# ---------------------------------------------------------------------------
# Cluster-culled kernel for large scenes
# ---------------------------------------------------------------------------
#
# Beyond a few thousand triangles, brute force wastes compute and the
# lockstep BVH walk drowns in XLA gathers. The TPU-native middle ground:
# triangles are spatially ordered (median_split_order; morton_order kept
# as the cheaper fallback) and grouped into 128-triangle clusters (the
# kernel's natural chunk); a cheap XLA pre-pass tests each 1024-ray tile's
# rays against cluster AABBs and ORs them into a per-tile cluster mask; the
# kernel then `lax.cond`-skips masked-out chunks. Spatially coherent ray
# tiles (primary rays, shadow rays to a common light) touch a small
# fraction of clusters; incoherent bounce tiles degrade gracefully toward
# brute force. Handles scenes up to VMEM capacity (~150k triangles).
#
# Cluster ordering (morton_order / median_split_order), the packed
# schedule-key bit layout, compile-cache shape bucketing, and the ordered
# pack builder live in cluster_layout.py (host-side, no Pallas).


def _fetch_attr_rows(at128, ids):
    """(B,) triangle ids -> (B, 16) attr rows from the BRICKED
    (tpad/8, 128) table (see _build_part): one contiguous 512 B row
    gather per id + a one-hot blend over the brick's 8 sub-rows. Each
    output element sums 8 f32 terms of which at most one is nonzero,
    so the result is BITWISE equal to a plain (tpad, 16) row gather."""
    rows = jnp.take(at128, ids >> 3, axis=0)         # (B, 128)
    b = rows.shape[0]
    oh = ((ids[:, None] & 7) == jnp.arange(8)[None, :]).astype(
        jnp.float32
    )
    return jnp.sum(
        rows.reshape(b, 8, ATTR_COLS) * oh[:, :, None], axis=1
    )


@jax.tree_util.register_pytree_node_class
class CulledScene:
    """Precomputed state for the cluster-culled intersector (pytree so it
    can ride through jit boundaries)."""

    def __init__(self, geom: Geometry = None, _leaves=None,
                 sort_rays=False, grouped=True, regroup=False,
                 max_tris_per_part=None):
        self.sort_rays = sort_rays
        # grouped=True dispatches to the 8-ray-group kernel (measured
        # 1.8x coherent / 2.3x incoherent over the row kernel on the
        # 101k-tri scene); sort_rays only applies to the row kernel.
        self.grouped = grouped and not sort_rays
        # regroup=True re-cuts the 8-ray groups WITHIN each 1024-ray
        # kernel tile by (octant, nearest-touched-cluster) before the
        # grouped kernel runs: bounce-shaped batches reach the per-ray
        # incidence floor (host probe: 2.48x fewer (group, cluster)
        # pairs, benchmarks/group_sort_probe.py) while camera rays keep
        # their pixel-block layout via the caller's camera_mask. Uses
        # one slim probe prepass + two minor-dim batched sorts (the
        # cheap kind, ~0.02 ms — NOT the dead 3.8 ms global argsort).
        self.regroup = regroup and self.grouped
        if _leaves is not None:
            (self.tri_pack, self.cluster_min, self.cluster_max,
             self.attr_table) = _leaves[:4]
            self._extra_parts = _leaves[4] if len(_leaves) > 4 else ()
            return
        # The GROUPED kernels carry a 21-bit cluster-id field (their
        # masks ride out-of-key and the schedule streams through SMEM
        # chunks — _sched_stream), so one pack holds 2M clusters =
        # 268M triangles: partitioning is effectively retired for
        # them. The row kernel keeps the 13-bit in-key layout
        # (row-mask bits 13..20), so its scenes still PARTITION along
        # the median-split order into contiguous cap-sized parts
        # (each a compact run of split-tree leaves); closest-hit takes
        # the min over parts (earlier part wins exact ties, matching
        # the serial schedule's in-pack convention) and any-hit ORs.
        # Cost is linear in parts — contrast the reference, which
        # refuses >2M triangles outright and draws a bbox proxy
        # instead (pbrt_loader.h:205-272).
        kernel_cap = (_GMAX_CLUSTERS if self.grouped
                      else _MAX_CLUSTERS) * TRI_CHUNK
        cap = (kernel_cap if max_tris_per_part is None
               else (max_tris_per_part // TRI_CHUNK) * TRI_CHUNK)
        cap = max(cap, TRI_CHUNK)
        self.order = median_split_order(geom)
        parts = []
        for s in range(0, self.order.shape[0], cap):
            parts.append(self._build_part(geom, self.order[s:s + cap]))
        (self.tri_pack, self.cluster_min, self.cluster_max,
         self.attr_table) = parts[0]
        self._extra_parts = tuple(parts[1:])
        if self._extra_parts and self.regroup:
            self.regroup = False   # probe keys span one pack only

    @staticmethod
    def _build_part(geom: Geometry, order: np.ndarray):
        tri_pack, cmin, cmax = pack_triangles_ordered(geom, order)
        # One packed shading row per REORDERED triangle:
        # [nx ny nz | ar ag ab | er eg eb | material | prim | pad].
        # closest_hit then needs a single (B,) -> (B, 16) gather instead
        # of six chained per-lane gathers (order -> tri_prim -> 4 attr
        # tables), which measured 5.6 ms/bounce on the 101k-tri scene.
        prim = host_array(geom.tri_prim)[order]
        tpad = tri_pack.shape[1]
        at = np.zeros((tpad, ATTR_COLS), np.float32)
        t = prim.shape[0]
        at[:t, 0:3] = host_array(geom.normal)[prim]
        at[:t, 3:6] = host_array(geom.albedo)[prim]
        at[:t, 6:9] = host_array(geom.emission)[prim]
        at[:t, 9] = host_array(geom.material)[prim]
        at[:t, 10] = prim
        # BRICKED (tpad/8, 128) layout: triangle i's 16 attrs live at
        # [i>>3, (i&7)*16 : (i&7)*16+16], so the per-bounce winner-row
        # fetch is a (B,) -> (B, 128) row gather of whole 512 B lines
        # (the canonical fast gather shape — 128-lane minor dim, row-
        # major) + an exact one-hot blend over the 8 sub-rows. The
        # (tpad, 16) row gather this replaces lowered column-major in-
        # program and cost 0.56 ms/call at 2.1M rows — 15% of the 2M-
        # scene device budget (trace_profile stress2m fusion.168);
        # see benchmarks/attr_gather_probe.py.
        return tri_pack, cmin, cmax, jnp.asarray(
            at.reshape(tpad // 8, 8 * ATTR_COLS)
        )

    @property
    def parts(self):
        """All triangle parts, primary first: tuples of
        (tri_pack, cluster_min, cluster_max, attr_table)."""
        return ((self.tri_pack, self.cluster_min, self.cluster_max,
                 self.attr_table),) + self._extra_parts

    @staticmethod
    def _part_may_hit(part, o, d, t_min, maxd=None):
        """Conservative ray-vs-part-AABB slab test (B,) bool.

        Parts are contiguous runs of the median-split order — spatially
        compact — so most rays provably miss every part but one. The
        formula mirrors the prepass slab (_kernel_prepass_groups: tn
        clamped to t_min, tf > 0, optional tn <= maxd; same 1e-8 inv-d
        clamp), and slab hits are float-monotone under box inclusion
        (per-axis intervals only widen, min/max/rounding are monotone),
        so cluster-hit in the prepass implies part-hit here: culling on
        a miss is EXACT, never drops a schedulable cluster."""
        _, cmin, cmax, _ = part
        # nan-aware: bucketed packs pad cluster bounds with NaN rows
        lo = jnp.nanmin(cmin, axis=0)
        hi = jnp.nanmax(cmax, axis=0)
        it = 1.0 / jnp.where(jnp.abs(d) > 1e-8, d, 1e-8)
        t1 = (lo[None, :] - o) * it
        t2 = (hi[None, :] - o) * it
        tn = jnp.maximum(
            jnp.max(jnp.minimum(t1, t2), axis=-1), t_min
        )
        tf = jnp.min(jnp.maximum(t1, t2), axis=-1)
        hit = (tf >= tn) & (tf > 0.0)
        if maxd is not None:
            hit = hit & (tn <= maxd)
        return hit, hi

    @staticmethod
    def _park_missing(may_hit, hi, o, d):
        """Park rays that miss the part outside its AABB pointing away
        (+x past hi: every cluster's x-interval is then negative, the
        prepass schedules nothing — the integrator's own dead-lane
        convention). Parked rays return t=inf for this part."""
        park_d = jnp.array([1.0, 0.0, 0.0], jnp.float32)
        return (
            jnp.where(may_hit[:, None], o, hi[None, :] + 1.0),
            jnp.where(may_hit[:, None], d, park_d),
        )

    def tree_flatten(self):
        return (
            (self.tri_pack, self.cluster_min, self.cluster_max,
             self.attr_table, self._extra_parts),
            (self.sort_rays, self.grouped, self.regroup),
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        if isinstance(aux, tuple):
            sort_rays, grouped, regroup = (
                aux if len(aux) == 3 else (*aux, False)
            )
        else:                       # older pickles: bool aux
            sort_rays, grouped, regroup = aux, True, False
        return cls(_leaves=leaves, sort_rays=sort_rays, grouped=grouped,
                   regroup=regroup)

    def _regrouped_tuv(self, o, d, t_min, camera_mask):
        """Grouped kernel on tile-locally re-sorted lanes.

        Keys: camera rays (camera_mask) keep their swizzled order and
        sort FIRST (their 4x2-pixel-block groups are already near the
        per-ray incidence floor; re-cutting them measured 10% WORSE);
        bounce rays sort by (octant, nearest touched cluster) so rays
        that enter the scene at the same place share a group; misses and
        parked lanes sink to the end with zero incidence. Both sorts are
        minor-dim batched (one 1024-wide row per kernel tile). Per-ray
        (t, id) is order-invariant up to the documented exact-tie caveat
        of the serial cluster schedule."""
        b = o.shape[0]
        # function-local import: the slim probe prepass lives with the
        # row kernel's sort path in the legacy module (which imports
        # this one at module level — importing it lazily here avoids
        # the cycle; by call time both modules are fully initialized).
        from .intersect_pallas_legacy import _prepass_probe
        c_probe = _prepass_probe(
            self.cluster_min, self.cluster_max, o, d, t_min
        )
        octant = (
            (d[:, 0] > 0).astype(jnp.int32)
            + 2 * (d[:, 1] > 0).astype(jnp.int32)
            + 4 * (d[:, 2] > 0).astype(jnp.int32)
        )
        touches = c_probe < jnp.float32(2**30)
        # grouped-path key: cluster id gets the wide _GID_BITS field
        # (single packs can exceed 8192 clusters), octant above it
        key = jnp.where(
            touches,
            (jnp.int32(1) << 30) | (octant << _GID_BITS)
            | c_probe.astype(jnp.int32),
            jnp.int32(0x7FFFFFFF),
        )
        lane = jnp.arange(b, dtype=jnp.int32)
        if camera_mask is not None:
            key = jnp.where(camera_mask, lane % RAYS_PER_TILE, key)
        shape2 = (-1, RAYS_PER_TILE)
        ops = tuple(x.reshape(shape2) for x in (
            key, lane, o[:, 0], o[:, 1], o[:, 2],
            d[:, 0], d[:, 1], d[:, 2],
        ))
        out = jax.lax.sort(ops, dimension=1, num_keys=1, is_stable=True)
        lane_s = out[1]
        o_s = jnp.stack([x.reshape(-1) for x in out[2:5]], axis=-1)
        d_s = jnp.stack([x.reshape(-1) for x in out[5:8]], axis=-1)
        t, ridx = pallas_closest_tuv_dma_grouped(
            self.tri_pack, self.cluster_min, self.cluster_max,
            o_s, d_s, t_min,
        )
        # Un-permute by sorting each tile back on the original lane id
        # (global ids are monotone within a tile) — a second cheap
        # minor-dim sort instead of two per-lane gathers.
        _, t, ridx = jax.lax.sort(
            (lane_s, t.reshape(shape2), ridx.reshape(shape2)),
            dimension=1, num_keys=1, is_stable=True,
        )
        return t.reshape(b), ridx.reshape(b)

    def _part_tuv(self, part, o, d, t_min, camera_mask):
        tri_pack, cmin, cmax, _ = part
        if (self.regroup and self.grouped and not self._extra_parts
                and o.shape[0] % RAYS_PER_TILE == 0):
            return self._regrouped_tuv(o, d, t_min, camera_mask)
        if self.grouped:
            return pallas_closest_tuv_dma_grouped(
                tri_pack, cmin, cmax, o, d, t_min,
            )
        from .intersect_pallas_legacy import pallas_closest_tuv_dma

        return pallas_closest_tuv_dma(
            tri_pack, cmin, cmax, o, d, t_min, sort_rays=self.sort_rays,
        )

    def closest_hit(self, geom: Geometry, o, d, t_min=1e-4,
                    t_max=jnp.inf, camera_mask=None):
        from .intersect import Hit

        parts = self.parts
        multi = len(parts) > 1

        def part_od(part):
            # multi-part: park rays that provably miss this part's AABB
            # so its prepass schedules nothing for them (exact cull —
            # see _part_may_hit); single-part stays untouched.
            if not multi:
                return o, d
            may_hit, hi = self._part_may_hit(part, o, d, t_min)
            return self._park_missing(may_hit, hi, o, d)

        op, dp = part_od(parts[0])
        t, ridx = self._part_tuv(parts[0], op, dp, t_min, camera_mask)
        pidx = jnp.zeros_like(ridx)
        for pi, part in enumerate(parts[1:], start=1):
            # min-combine across parts; strict < keeps the EARLIER part
            # on exact ties (the serial schedule's own convention)
            op, dp = part_od(part)
            t2, r2 = self._part_tuv(part, op, dp, t_min, camera_mask)
            better = t2 < t
            t = jnp.where(better, t2, t)
            ridx = jnp.where(better, r2, ridx)
            pidx = jnp.where(better, pi, pidx)
        valid = jnp.isfinite(t) & (t < t_max)
        if os.environ.get("TPT_ABLATE_ATTR_GATHER"):
            # perf ablation only: wrong attrs, same shapes/dtypes
            row = jnp.broadcast_to(
                self.attr_table[0:1, :ATTR_COLS], (o.shape[0], 16)
            )
        else:
            safe = jnp.where(valid, ridx, 0)
            # one bricked row fetch per part (_fetch_attr_rows: 512 B
            # line gather + exact one-hot sub-row blend), winner
            # selected per lane (indices clamped to 0 on non-winning
            # parts so every gather stays in range)
            row = _fetch_attr_rows(parts[0][3],
                                   jnp.where(pidx == 0, safe, 0))
            for pi, part in enumerate(parts[1:], start=1):
                win = pidx == pi
                row = jnp.where(
                    win[:, None],
                    _fetch_attr_rows(part[3], jnp.where(win, safe, 0)),
                    row,
                )
        p = o + jnp.where(valid, t, 0.0)[:, None] * d
        return Hit(
            valid=valid,
            t=jnp.where(valid, t, jnp.inf),
            prim=jnp.where(valid, row[:, 10].astype(jnp.int32), 0),
            p=p,
            n=row[:, 0:3],
            albedo=row[:, 3:6],
            emission=jnp.where(valid[:, None], row[:, 6:9], 0.0),
            material=row[:, 9].astype(jnp.int32),
        )

    def occluded(self, o, d, max_dist, exclude_a=None, exclude_b=None):
        """Segment any-hit through the grouped culled kernel — the
        form-factor visibility backend for HBM-scale scenes (drop-in
        for ops.intersect.occluded; same eps=1e-5 window and two
        excluded logical primitives, form_factors.h:144-209). OR over
        triangle parts for scenes past the one-pack cluster cap; rays
        whose segment provably misses a part's AABB get max_dist=0 for
        that part (the prepass then schedules nothing — the same free
        inactive-lane mask the FF estimator uses)."""
        parts = self.parts
        multi = len(parts) > 1
        max_dist = jnp.broadcast_to(
            jnp.asarray(max_dist, jnp.float32), (o.shape[0],)
        )

        def part_md(part):
            if not multi:
                return max_dist
            may_hit, _ = self._part_may_hit(
                part, o, d, 1e-5, maxd=max_dist
            )
            return jnp.where(may_hit, max_dist, 0.0)

        blocked = pallas_occluded_dma_grouped(
            self.tri_pack, self.cluster_min, self.cluster_max,
            o, d, part_md(parts[0]), exclude_a, exclude_b,
        )
        for part in parts[1:]:
            tri_pack, cmin, cmax, _ = part
            blocked = blocked | pallas_occluded_dma_grouped(
                tri_pack, cmin, cmax, o, d, part_md(part),
                exclude_a, exclude_b,
            )
        return blocked


# ---------------------------------------------------------------------------
# Any-hit occlusion kernel (form-factor visibility)
# ---------------------------------------------------------------------------


def _kernel_anyhit(tri_ref, prim_ref, ox, oy, oz, dx, dy, dz, maxd,
                   ex_a, ex_b, blocked_out):
    """Per-ray any-hit with two excluded primitive ids
    (visibility_test_anyhit parity, form_factors.h:144-209)."""
    csize = min(TRI_CHUNK, tri_ref.shape[0])
    n_chunks = tri_ref.shape[0] // csize

    for r in range(ROWS_PER_STEP):
        rox, roy, roz = ox[r:r + 1, :], oy[r:r + 1, :], oz[r:r + 1, :]
        rdx, rdy, rdz = dx[r:r + 1, :], dy[r:r + 1, :], dz[r:r + 1, :]
        rmax = maxd[r:r + 1, :]
        rea = ex_a[r:r + 1, :]
        reb = ex_b[r:r + 1, :]

        def chunk(c, blocked):
            blk = tri_ref[pl.ds(c * csize, csize), :]

            def col(k):
                return blk[:, k][:, None]

            os_ = col(6) * rox + col(7) * roy + col(8) * roz - col(11)
            ds_ = col(6) * rdx + col(7) * rdy + col(8) * rdz
            t = -os_ / ds_
            u = (
                col(0) * rox + col(1) * roy + col(2) * roz - col(9)
            ) + t * (col(0) * rdx + col(1) * rdy + col(2) * rdz)
            v = (
                col(3) * rox + col(4) * roy + col(5) * roz - col(10)
            ) + t * (col(3) * rdx + col(4) * rdy + col(5) * rdz)
            prim = prim_ref[pl.ds(c * csize, csize), :][:, 0][
                :, None
            ]                                                   # (csize, 1)
            ok = (
                (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t > 1e-5) & (t < rmax)
                & (prim != rea) & (prim != reb)
            )
            hit_any = jnp.max(
                ok.astype(jnp.float32), axis=0, keepdims=True
            )
            return jnp.maximum(blocked, hit_any)

        b0 = jnp.zeros((1, RAY_TILE), jnp.float32)
        blocked = jax.lax.fori_loop(0, n_chunks, chunk, b0)
        blocked_out[r:r + 1, :] = blocked.astype(jnp.int32)


def pack_prim_ids(geom: Geometry) -> jax.Array:
    """(Tpad, 16) f32 with column 0 = logical primitive id per triangle
    (padding rows get -2, matching no real primitive)."""
    prim = host_array(geom.tri_prim)
    t = prim.shape[0]
    tpad = _tri_pad(t)
    out = np.full((tpad, 16), -2.0, np.float32)
    out[:t, 0] = prim
    return jnp.asarray(out)


@partial(jax.jit, static_argnames=())
def pallas_occluded(tri_pack, prim_pack, o, d, max_dist,
                    exclude_a=None, exclude_b=None):
    """Blocked mask for ray segments (any batch size; padded internally).

    Drop-in for ops.intersect.occluded (eps=1e-5 any-hit window with two
    excluded logical primitives)."""
    if exclude_a is None:
        exclude_a = jnp.full((o.shape[0],), -1, jnp.int32)
    if exclude_b is None:
        exclude_b = jnp.full((o.shape[0],), -1, jnp.int32)
    max_dist = jnp.asarray(max_dist, jnp.float32)
    (o, d, max_dist, exclude_a, exclude_b), b0 = _pad_rays(
        o, d, max_dist, exclude_a, exclude_b
    )
    # padded lanes: max_dist fill of 1.0 could report blocked; force 0
    b = o.shape[0]
    lane_ok = jnp.arange(b) < b0
    max_dist = jnp.where(lane_ok, max_dist, 0.0)
    rows = b // RAY_TILE

    ray_spec = _ray_spec()
    extra = [
        max_dist.reshape(rows, RAY_TILE),
        exclude_a.astype(jnp.float32).reshape(rows, RAY_TILE),
        exclude_b.astype(jnp.float32).reshape(rows, RAY_TILE),
    ]
    blocked = _pallas_call(
        _kernel_anyhit,
        grid=(rows // ROWS_PER_STEP,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        + [ray_spec] * 9,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((rows, RAY_TILE), jnp.int32),
    )(tri_pack, prim_pack, *_ray_comps(o, d, rows), *extra)
    return blocked.reshape(b)[:b0].astype(bool)


# ---------------------------------------------------------------------------
# HBM-resident culled kernel with double-buffered cluster DMA
# ---------------------------------------------------------------------------
#
# The VMEM-resident kernels cap out when the packed triangles no longer fit
# on-chip (a (T,16) f32 array tiles to (8,128) lanes -> 8x padding, so 100k
# triangles want ~52MB of VMEM). Production path for large scenes:
# triangle constants stay in HBM; an XLA pre-pass builds each 1024-ray
# tile's ACTIVE cluster list (ids of 128-triangle Morton clusters whose
# AABB the tile's rays can hit); the kernel walks only that list, streaming
# each cluster's 8KB constant block into a double-buffered VMEM scratch
# with async DMA overlapped against the previous cluster's intersection
# math. Scales to arbitrary triangle counts at O(active clusters) work.


# The packed schedule-key bit layout (_ID_BITS/_BUCKET_SHIFT/... — 13-bit
# row-kernel ids, 21-bit grouped ids) is defined in cluster_layout.py and
# imported above. The schedule no longer fits SMEM whole at 2M-cluster
# scale (1 MB cap measured on this chip) — the walk streams it from HBM
# in _SCHED_CHUNK-entry ring slots instead.
_SCHED_CHUNK = 1024                 # schedule entries per SMEM ring slot
                                    # (power of two: the per-visit
                                    # position->slot math must be shifts)

# The slim per-ray nearest-cluster prepass probe (_prepass_probe) used by
# the legacy row kernel's sort_rays path lives in intersect_pallas_legacy.



# ---------------------------------------------------------------------------
# Grouped (8-ray) culled-DMA intersector — second-generation large-scene path
# ---------------------------------------------------------------------------
# The 128-ray-row kernel above pays for every cluster ANY ray of a row
# touches: measured row-unions are 45 clusters vs a per-ray incidence of
# 3.6 on the 101k-tri scene, and the global ray sort that would shrink
# them costs more than it saves in XLA (3.8 ms argsort + 2.2 ms scatter
# at 64k). This kernel removes the need for any permutation by shrinking
# the cull granule 16x instead: rays ride the SUBLANES in groups of 8
# (lane = group id), triangles ride the lanes, and the pre-pass emits an
# exact per-(tile, cluster) 128-bit group mask. The serial schedule walk
# then iterates only the set bits — (group, cluster) pairs — with
# per-pair compute a single (8, 128) vector-op sequence:
#
#   * per-group running (t, id) candidates live in a VMEM accumulator
#     (8, 128*128) so no cross-lane reduction happens inside the walk;
#     one vectorized argmin pass at the end resolves winners;
#   * the group's 6 ray components are extracted with one-hot lane
#     blends (Mosaic has no dynamic unaligned lane slicing);
#   * set bits are found with a branch-free single-bit log2 on the
#     scalar core, so walk cost scales with PAIRS, not with bits
#     scanned.
#
# Semantics: same t/u/v math, ordered compares, first-strict-minimum
# update per lane slot; cross-cluster exact-t ties follow the serial
# schedule order (same caveat as pallas_closest_tuv_dma(sort_rays)).
# Replaces /root/reference's per-thread BVH descent (bvh.h:222-270) for
# arbitrary scene sizes.

GROUP = 8               # rays per cull group (sublane dim)
GROUPS_PER_TILE = RAYS_PER_TILE // GROUP   # 128 = one lane row
_DMA_RING = 8           # cluster-stream prefetch depth (hides DMA latency
                        # when per-cluster compute is a few group visits)
_SKIP_EXPAND = False        # probe only: skip the comp expansion
_SKIP_RESOLVE = False       # probe only: skip winner resolution
_SKIP_FILLS = False         # probe only: skip accumulator fills
_SKIP_WALK = False          # probe only: compile out the schedule walk
_GROUPED_EARLY_OUT = False  # group-level front-to-back exit: measured NET-NEGATIVE
                            # on stress100k (coherent 10.2 -> 13.1 ms: the
                            # per-pair gbest update exceeds the pair savings);
                            # kept as a flag for low-incidence scenes
_POP_GUARD = False          # guard the 2-bit ILP walk's second pop with a
                            # scalar branch instead of duplicating g1 when a
                            # mask word has an odd bit count: measured NET-
                            # NEGATIVE on the bench workload (walk 40.8 ->
                            # 46.6 ms, stress100k bal4 spp8) — the scf.if
                            # around the vector block costs more than the
                            # idempotent duplicate it skips, same lesson as
                            # the sub-box culling dead end


def _prepass_block_vals(cb_ref, ox, oy, oz, ix, iy, iz, t_min, n_real,
                        j, md_ref):
    """One (tile, 128-cluster block) prepass step's values.

    Returns (ghit (128, 8) packed halfword group masks, tn (8, 128)
    per-cluster tile-min entry, ex (8, 128) per-ray slab-exit bound)."""
    blk = jnp.transpose(cb_ref[...])          # (128 clusters, 8)
    cvalid = (
        jax.lax.broadcasted_iota(jnp.int32, (TRI_CHUNK, 1), 0)
        + j * TRI_CHUNK
    ).astype(jnp.float32) < n_real

    def col(k):
        return blk[:, k][:, None]             # (128, 1)

    hit_acc = jnp.zeros((TRI_CHUNK, RAY_TILE), jnp.float32)
    tn_min = jnp.full((TRI_CHUNK, 1), jnp.inf, jnp.float32)
    exits8 = []
    for s in range(GROUP):
        ro = (ox[s:s+1, :], oy[s:s+1, :], oz[s:s+1, :])
        ri = (ix[s:s+1, :], iy[s:s+1, :], iz[s:s+1, :])
        tn = jnp.full((TRI_CHUNK, RAY_TILE), t_min, jnp.float32)
        tf = jnp.full((TRI_CHUNK, RAY_TILE), jnp.inf, jnp.float32)
        for ax in range(3):
            lo = (col(ax) - ro[ax]) * ri[ax]
            hi = (col(ax + 3) - ro[ax]) * ri[ax]
            tn = jnp.maximum(tn, jnp.minimum(lo, hi))
            tf = jnp.minimum(tf, jnp.maximum(lo, hi))
        hit = (tf >= tn) & (tf > 0.0)         # (clusters, groups)
        if md_ref is not None:
            hit = hit & (tn <= md_ref[s:s + 1, :])
        hit_acc = jnp.maximum(
            hit_acc, (hit & cvalid).astype(jnp.float32)
        )
        tn_min = jnp.minimum(
            tn_min,
            jnp.min(jnp.where(hit & cvalid, tn, jnp.inf),
                    axis=1, keepdims=True),
        )
        # per-ray TIGHT interest bound: max slab exit over touched
        # clusters (any hit lies before it; rays touching nothing get
        # t_min and stop holding their group open immediately)
        exits8.append(
            jnp.max(jnp.where(hit & cvalid, tf, -jnp.inf),
                    axis=0, keepdims=True)
        )                                     # (1, 128)
    ex = jnp.concatenate(exits8, axis=0)      # (8, 128)
    # Pack the 128 group-hit lanes into 8 x 16-bit halfword sums
    # (distinct powers 2^0..2^15 sum exactly in f32; a full 32-bit word
    # would not) — shrinks the HBM output 16x and removes the XLA-side
    # one-hot packing pass entirely.
    lane16 = jax.lax.broadcasted_iota(
        jnp.int32, (TRI_CHUNK, RAY_TILE), 1
    ) % 16
    # exact power-of-two weights via integer shift (exp2 lowers to
    # exp(x ln 2) and is NOT exact)
    w16 = jnp.left_shift(jnp.int32(1), lane16).astype(jnp.float32)
    seg = jax.lax.broadcasted_iota(
        jnp.int32, (TRI_CHUNK, RAY_TILE), 1
    ) // 16
    halves = []
    for h in range(GROUP):
        halves.append(
            jnp.sum(
                jnp.where(seg == h, hit_acc * w16, 0.0),
                axis=1, keepdims=True,
            )
        )
    # transposed (8 halfwords, 128 clusters) output: the glue's i32
    # convert / word-pack / any-reduce then run on a cpad-minor array
    # instead of an 8-minor one (which pads 8 lanes -> 128, a measured
    # ~1 ms/call of XLA at 16.4k clusters)
    ghit = jnp.transpose(jnp.concatenate(halves, axis=1))  # (8, 128)
    tn = jnp.broadcast_to(
        jnp.transpose(tn_min), (GROUP, TRI_CHUNK)
    )
    return ghit, tn, ex


def _kernel_prepass_groups(cb_ref, ox, oy, oz, ix, iy, iz, scal_ref,
                           ghit_ref, tn_ref, texit_ref, md_ref=None):
    """Group-granular cluster visibility pre-pass (dense grid form).

    Transposed ray layout: (8, 128) blocks with lane = group, sublane =
    ray slot. One grid step = (tile i) x (128-cluster block j); per slot
    the slab test is a dense (128 clusters, 128 groups) VPU op,
    OR-accumulated over the 8 slots. Outputs per (tile, cluster): group
    hit flags (128 lanes) and the tile-min entry distance.

    With md_ref (per-ray segment length, any-hit mode) clusters whose
    slab entry lies beyond the ray's segment are culled: every triangle
    of the cluster then has t >= tn > maxd, outside the any-hit window.

    HBM-scale scenes (>= _GATE_MIN_BLOCKS blocks) use the FUSED gated
    form instead (_kernel_prepass_groups_fused)."""
    t_min = scal_ref[0]
    n_real = scal_ref[1]
    j = pl.program_id(1)
    ghit, tn, ex = _prepass_block_vals(
        cb_ref, ox, oy, oz, ix, iy, iz, t_min, n_real, j, md_ref
    )

    @pl.when(j == 0)
    def _():
        texit_ref[0] = jnp.maximum(ex, t_min)

    @pl.when(j > 0)
    def _():
        texit_ref[0] = jnp.maximum(texit_ref[0], ex)

    ghit_ref[0] = ghit
    tn_ref[0] = tn


_QGRAN = int(os.environ.get("TPT_QGRAN", "32"))
                        # SUB-BLOCK gate granularity (clusters per gate
                        # bit): the fused gate word carries one bit per
                        # _QGRAN-cluster quarter of a 128-cluster block,
                        # and an ON block's OFF quarters skip their slab
                        # arithmetic entirely. Probe (subgate_probe.py,
                        # 2.1M scene): bounce on-fraction 0.64 at 128-
                        # gran vs 0.29 at 32 (0.089 at 8) — so ~55%
                        # (86%) of the in-block slab work is dead at
                        # 128 granularity. Must divide TRI_CHUNK and be
                        # a multiple of 8: the scratch writes land at
                        # sublane offsets q*_QGRAN (static multiples of
                        # 8 — Mosaic-legal). Env-switchable for A/B.
if not (_QGRAN > 0 and TRI_CHUNK % _QGRAN == 0 and _QGRAN % 8 == 0):
    # explicit raise, not assert: python -O strips asserts and an
    # invalid TPT_QGRAN would silently yield non-multiple-of-8 sublane
    # scratch offsets (advisor r4)
    raise ValueError(
        f"TPT_QGRAN={_QGRAN} must be a positive multiple of 8 dividing "
        f"TRI_CHUNK={TRI_CHUNK}"
    )
_QPB = TRI_CHUNK // _QGRAN


def _prepass_quarter_vals(blk, q, ox, oy, oz, ix, iy, iz, t_min,
                          n_real, j, md_ref, hs_sc, tn_sc, texit_acc):
    """One ON _QGRAN-cluster quarter of a gated block.

    Exact per-cluster slab tests on (_QGRAN, 128 rays); group-hit
    halfword packing and the per-cluster tile-min entry are written
    into the block scratch at the quarter's sublane range, the per-ray
    slab-exit bound max-accumulated into texit_acc. Every value is
    bitwise what _prepass_block_vals computes for the same cluster
    rows (same ops, same shapes per row; f32 max/min reassociation
    across the quarter split is exact)."""
    qg = _QGRAN
    bq = blk[q * qg:(q + 1) * qg]             # (qg, 8) static slice
    cvalid = (
        jax.lax.broadcasted_iota(jnp.int32, (qg, 1), 0)
        + (j * TRI_CHUNK + q * qg)
    ).astype(jnp.float32) < n_real

    def col(k):
        return bq[:, k][:, None]              # (qg, 1)

    hit_acc = jnp.zeros((qg, RAY_TILE), jnp.float32)
    tn_min = jnp.full((qg, 1), jnp.inf, jnp.float32)
    exits8 = []
    for s in range(GROUP):
        ro = (ox[s:s+1, :], oy[s:s+1, :], oz[s:s+1, :])
        ri = (ix[s:s+1, :], iy[s:s+1, :], iz[s:s+1, :])
        tn = jnp.full((qg, RAY_TILE), t_min, jnp.float32)
        tf = jnp.full((qg, RAY_TILE), jnp.inf, jnp.float32)
        for ax in range(3):
            lo = (col(ax) - ro[ax]) * ri[ax]
            hi = (col(ax + 3) - ro[ax]) * ri[ax]
            tn = jnp.maximum(tn, jnp.minimum(lo, hi))
            tf = jnp.minimum(tf, jnp.maximum(lo, hi))
        hit = (tf >= tn) & (tf > 0.0)
        if md_ref is not None:
            hit = hit & (tn <= md_ref[s:s + 1, :])
        hit_acc = jnp.maximum(
            hit_acc, (hit & cvalid).astype(jnp.float32)
        )
        tn_min = jnp.minimum(
            tn_min,
            jnp.min(jnp.where(hit & cvalid, tn, jnp.inf),
                    axis=1, keepdims=True),
        )
        exits8.append(
            jnp.max(jnp.where(hit & cvalid, tf, -jnp.inf),
                    axis=0, keepdims=True)
        )                                     # (1, 128)
    ex = jnp.concatenate(exits8, axis=0)      # (8, 128)
    texit_acc[...] = jnp.maximum(texit_acc[...], ex)
    lane16 = jax.lax.broadcasted_iota(
        jnp.int32, (qg, RAY_TILE), 1
    ) % 16
    w16 = jnp.left_shift(jnp.int32(1), lane16).astype(jnp.float32)
    seg = jax.lax.broadcasted_iota(
        jnp.int32, (qg, RAY_TILE), 1
    ) // 16
    halves = [
        jnp.sum(jnp.where(seg == h, hit_acc * w16, 0.0),
                axis=1, keepdims=True)
        for h in range(GROUP)
    ]
    hs_sc[q * qg:(q + 1) * qg, :] = jnp.concatenate(halves, axis=1)
    tn_sc[q * qg:(q + 1) * qg, :] = jnp.broadcast_to(tn_min, (qg, GROUP))


def _kernel_prepass_groups_fused(cb_ref, ox, oy, oz, ix, iy, iz,
                                 scal_ref, ghit_ref, tn_ref, texit_ref,
                                 texit_acc, hs_sc, tn_sc,
                                 md_ref=None, gate_ref=None,
                                 sched_ref=None, non_ref=None):
    """Gated prepass as a WORKLIST: only ON blocks are visited.

    The grid-per-block formulation pays ~0.8 us of Mosaic step overhead
    per (tile, 128-cluster block) even for gated-off blocks; the first
    fused form (fori over ALL blocks, scalar branch per block) still
    paid a measured 1.63 ms/call of pure floor at 16.4k clusters — 73%
    of the real gated cost (benchmarks/prepass_floor_probe.py). Here
    the outputs are bulk-initialized (one zeros + one inf store per
    tile) and a fori_loop with a DYNAMIC trip count (non_ref[i], from
    SMEM) walks only tile i's gated-ON blocks via sched_ref[i, k] —
    machinery proportional to the ON fraction (0.36 on the 2.1M mixed
    schedule) instead of nblk. Bitwise == the dense loop: block output
    slices are disjoint and the texit max-accumulation is exact under
    any visit order.

    gate_ref[i, j] is a WORD: bit q gates the block's q-th
    _QGRAN-cluster quarter (conservative union-AABB slab, so skipping
    is bitwise-exact). An ON block computes only its ON quarters —
    probe-measured 0.45 quarter-on fraction inside ON blocks on bounce
    batches (subgate_probe.py) — through (TRI_CHUNK, GROUP) block
    scratch written at static quarter sublane offsets (lane-dim stores
    must stay 128-aligned, so quarters live in sublanes)."""
    i = pl.program_id(0)
    t_min = scal_ref[0]
    n_real = scal_ref[1]
    cpad = cb_ref.shape[1]
    texit_acc[...] = jnp.full((GROUP, RAY_TILE), t_min, jnp.float32)
    ghit_ref[0] = jnp.zeros((GROUP, cpad), jnp.float32)
    tn_ref[0] = jnp.full((GROUP, cpad), jnp.inf, jnp.float32)

    def body(k, carry):
        j = sched_ref[i, k]
        gate = gate_ref[i, j]
        hs_sc[...] = jnp.zeros((TRI_CHUNK, GROUP), jnp.float32)
        tn_sc[...] = jnp.full((TRI_CHUNK, GROUP), jnp.inf,
                              jnp.float32)
        blk = jnp.transpose(
            cb_ref[:, pl.ds(j * TRI_CHUNK, TRI_CHUNK)]
        )                                 # (128 clusters, 8)
        for q in range(_QPB):
            @pl.when(
                (jax.lax.shift_right_logical(gate, q) & 1) != 0
            )
            def _(q=q):
                _prepass_quarter_vals(
                    blk, q, ox, oy, oz, ix, iy, iz, t_min,
                    n_real, j, md_ref, hs_sc, tn_sc, texit_acc
                )
        ghit_ref[0, :, pl.ds(j * TRI_CHUNK, TRI_CHUNK)] = (
            jnp.transpose(hs_sc[...])
        )
        tn_ref[0, :, pl.ds(j * TRI_CHUNK, TRI_CHUNK)] = (
            jnp.transpose(tn_sc[...])
        )
        return carry

    jax.lax.fori_loop(0, non_ref[i], body, 0)
    texit_ref[0] = texit_acc[...]


def _kernel_prepass_groups_fused_plain(cb, ox, oy, oz, ix, iy, iz,
                                       gate, sched, non, scal,
                                       ghit, tn, texit,
                                       texit_acc, hs_sc, tn_sc):
    _kernel_prepass_groups_fused(cb, ox, oy, oz, ix, iy, iz, scal,
                                 ghit, tn, texit, texit_acc,
                                 hs_sc, tn_sc, gate_ref=gate,
                                 sched_ref=sched, non_ref=non)


def _kernel_prepass_groups_fused_seg(cb, ox, oy, oz, ix, iy, iz, md,
                                     gate, sched, non, scal,
                                     ghit, tn, texit,
                                     texit_acc, hs_sc, tn_sc):
    _kernel_prepass_groups_fused(cb, ox, oy, oz, ix, iy, iz, scal,
                                 ghit, tn, texit, texit_acc,
                                 hs_sc, tn_sc, md_ref=md, gate_ref=gate,
                                 sched_ref=sched, non_ref=non)


def _kernel_prepass_groups_seg(cb_ref, ox, oy, oz, ix, iy, iz, md,
                               scal_ref, ghit_ref, tn_ref, texit_ref):
    """Segment-bounded (any-hit) variant: extra per-ray maxd operand."""
    _kernel_prepass_groups(cb_ref, ox, oy, oz, ix, iy, iz, scal_ref,
                           ghit_ref, tn_ref, texit_ref, md_ref=md)


_GATE_MIN_BLOCKS = 16   # block-gate the prepass only past 2048 clusters
                        # (262k tris): below that, bounce-mixture tiles
                        # touch ~every 128-cluster block (99.6% measured
                        # on stress100k) and the gate is pure overhead;
                        # above, per-tile incidence is a small fraction
                        # of the blocks and the dense slab pass is the
                        # dominant device cost (measured 2.1M scene)


def _block_gate(cluster_min, cluster_max, comps, t_min, tiles, c,
                cpad, maxd=None):
    """(tiles, nblocks) i32: does ANY ray of tile i hit the union AABB
    of 128-cluster block j?  Conservative (slab hits are float-monotone
    under box inclusion), so the gated prepass is bitwise-exact. Pure
    XLA: one fused (rays, nblocks) slab test + a per-tile OR — ~128x
    less arithmetic than the cluster-granular pass it gates."""
    nblk = cpad // TRI_CHUNK
    pad = cpad - c
    # nanmin/nanmax: a boundary block mixing real clusters with the
    # bucketed pack's NaN pad rows must union over the REAL rows only
    # (plain min would poison the union and gate real clusters off)
    bmin = jnp.nanmin(
        jnp.pad(cluster_min, ((0, pad), (0, 0)),
                constant_values=jnp.inf).reshape(nblk, TRI_CHUNK, 3),
        axis=1,
    )                                          # (nblk, 3)
    bmax = jnp.nanmax(
        jnp.pad(cluster_max, ((0, pad), (0, 0)),
                constant_values=-jnp.inf).reshape(nblk, TRI_CHUNK, 3),
        axis=1,
    )
    ox, oy, oz, dx, dy, dz = comps[:6]
    safe = lambda a: jnp.where(jnp.abs(a) > 1e-8, a, 1e-8)
    o3 = [x.reshape(-1)[:, None] for x in (ox, oy, oz)]
    i3 = [1.0 / safe(x.reshape(-1))[:, None] for x in (dx, dy, dz)]
    tn = jnp.full((tiles * RAYS_PER_TILE, nblk), t_min, jnp.float32)
    tf = jnp.full((tiles * RAYS_PER_TILE, nblk), jnp.inf, jnp.float32)
    for ax in range(3):
        lo = (bmin[None, :, ax] - o3[ax]) * i3[ax]
        hi = (bmax[None, :, ax] - o3[ax]) * i3[ax]
        tn = jnp.maximum(tn, jnp.minimum(lo, hi))
        tf = jnp.minimum(tf, jnp.maximum(lo, hi))
    hit = (tf >= tn) & (tf > 0.0)
    if maxd is not None:
        hit = hit & (tn <= maxd.reshape(-1)[:, None])
    # fully-padded blocks (bmin=+inf, bmax=-inf) slab to a spurious
    # always-hit (tn=t_min, tf=+inf); the kernel's cvalid mask writes
    # zeros for them either way, but gate them off to skip the work
    real = (
        jnp.arange(nblk, dtype=jnp.int32) * TRI_CHUNK < c
    )
    gate = (
        jnp.any(hit.reshape(tiles, RAYS_PER_TILE, nblk), axis=1)
        & real[None, :]
    )
    return gate.astype(jnp.int32)


def _quarter_gate(cluster_min, cluster_max, comps, t_min, b, c, cpad,
                  maxd=None):
    """(tiles, nblocks) i32 gate WORDS for the fused gated prepass.

    Bit q of word [i, j] is 1 iff some ray of tile i slab-hits the
    union AABB of block j's q-th _QGRAN-cluster quarter. The gate is
    ITSELF a (recursion-guarded) prepass over the quarter union AABBs
    — ~_QGRANx fewer boxes, same kernel, same conservative slab. The
    XLA formulation of the 128-gran test (_block_gate, kept as the
    test oracle) measured ~1.0 ms/call at 16.4k clusters vs ~0.05 ms
    for the kernel one. Bit q off implies every cluster of quarter q
    misses (slab monotone under box inclusion), so the fused kernel
    skips that quarter's slab arithmetic bitwise-exactly."""
    tiles = b // RAYS_PER_TILE
    nblk = cpad // TRI_CHUNK
    nq = cpad // _QGRAN
    pad = cpad - c
    # nanmin/nanmax: boundary quarters mixing real clusters with NaN
    # pad rows (bucketed packs) union over the real rows only; fully-
    # padded quarters yield +/-inf unions and realq masks them below
    qmin = jnp.nanmin(
        jnp.pad(cluster_min, ((0, pad), (0, 0)),
                constant_values=jnp.inf)
        .reshape(nq, _QGRAN, 3),
        axis=1,
    )
    qmax = jnp.nanmax(
        jnp.pad(cluster_max, ((0, pad), (0, 0)),
                constant_values=-jnp.inf)
        .reshape(nq, _QGRAN, 3),
        axis=1,
    )
    bghit, _, _, _, _ = _prepass_groups(
        qmin, qmax, comps, t_min, b, maxd=maxd, _no_gate=True
    )
    # fully-padded quarters (union +inf/-inf, from cpad padding or the
    # bucketed pack's NaN rows) slab to a spurious always-hit; mask by
    # union finiteness — real quarters always have a finite min corner
    realq = jnp.isfinite(qmin[:, 0]) & (
        jnp.arange(nq, dtype=jnp.int32) * _QGRAN < c
    )
    qon = jnp.any(bghit[:, :, :nq] > 0.0, axis=1) & realq[None, :]
    bits = jnp.left_shift(
        jnp.int32(1), jnp.arange(_QPB, dtype=jnp.int32)
    )
    return jnp.sum(
        qon.reshape(tiles, nblk, _QPB).astype(jnp.int32)
        * bits[None, None, :],
        axis=-1,
    )


def _prepass_groups(cluster_min, cluster_max, comps, t_min, b,
                    maxd=None, _no_gate=False, _force_dense=False,
                    _gate_override=None):
    """Run the group pre-pass on transposed ray comps.

    comps: 6 arrays (tiles*8, 128); maxd optionally a 7th (segment
    length per ray, any-hit culling). Returns (ghit (tiles, Cpad, 8)
    f32 16-bit-halfword group masks, tn (tiles, Cpad), n_clusters,
    Cpad).

    _gate_override is a PROBE knob (benchmarks/prepass_floor_probe.py):
    "zero" forces every gate word off (measures the fused kernel's pure
    loop+store floor — outputs are then all-zero/inf, NOT a real
    prepass), "one" forces every quarter on (the dense fused cost)."""
    c = cluster_min.shape[0]
    if c > _GMAX_CLUSTERS:
        raise ValueError(
            f"{c} clusters exceeds the packed-key cap {_GMAX_CLUSTERS}"
        )
    tiles = b // RAYS_PER_TILE
    cpad = ((c + RAY_TILE - 1) // RAY_TILE) * RAY_TILE
    ox, oy, oz, dx, dy, dz = comps
    safe = lambda a: jnp.where(jnp.abs(a) > 1e-8, a, 1e-8)
    ix, iy, iz = 1.0 / safe(dx), 1.0 / safe(dy), 1.0 / safe(dz)
    cb = jnp.concatenate(
        [
            jnp.pad(cluster_min.T, ((0, 0), (0, cpad - c)),
                    constant_values=jnp.inf),
            jnp.pad(cluster_max.T, ((0, 0), (0, cpad - c)),
                    constant_values=jnp.inf),
            jnp.zeros((2, cpad), jnp.float32),
        ]
    )                                         # (8, Cpad)
    if _gate_override not in (None, "zero", "one"):
        raise ValueError(f"unknown _gate_override {_gate_override!r}")
    gated = (not _no_gate and not _force_dense
             and cpad // TRI_CHUNK >= _GATE_MIN_BLOCKS)
    gate_ops = ()
    if gated:
        if _gate_override == "zero":
            gate_ops = (jnp.zeros(
                (tiles, cpad // TRI_CHUNK), jnp.int32),)
        elif _gate_override == "one":
            gate_ops = (jnp.full(
                (tiles, cpad // TRI_CHUNK),
                (1 << _QPB) - 1, jnp.int32),)
        else:
            gate_ops = (
                _quarter_gate(cluster_min, cluster_max, comps, t_min,
                              b, c, cpad, maxd=maxd),
            )
        # Worklist: per tile, the indices of gated-ON blocks (ON
        # first, index order) + their count. (tiles, nblk) is tiny
        # (~2k entries at 16.4k clusters) so the argsort is noise
        # next to the 64k-scale sorts the schedule path avoids.
        on = gate_ops[0] != 0
        gate_ops = gate_ops + (
            jnp.argsort(jnp.logical_not(on), axis=1,
                        stable=True).astype(jnp.int32),
            jnp.sum(on, axis=1, dtype=jnp.int32),
        )
    scal = jnp.stack([
        jnp.asarray(t_min, jnp.float32),
        jnp.asarray(float(c), jnp.float32),
    ])
    out_shape = [
        jax.ShapeDtypeStruct((tiles, GROUP, cpad), jnp.float32),
        jax.ShapeDtypeStruct((tiles, GROUP, cpad), jnp.float32),
        jax.ShapeDtypeStruct((tiles, GROUP, RAY_TILE), jnp.float32),
    ]
    if gated:
        # fused formulation: grid over tiles only, blocks walked by an
        # in-kernel fori_loop — a gated-off block costs a scalar branch
        # instead of a ~0.8 us Mosaic grid step (1.65 ms/call of pure
        # floor at 16.4k clusters, prepass_gate_probe.py)
        ray_spec1 = pl.BlockSpec(
            (GROUP, RAY_TILE), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        )
        ghit, tn, texit = _pallas_call(
            _kernel_prepass_groups_fused_plain if maxd is None
            else _kernel_prepass_groups_fused_seg,
            grid=(tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            + [ray_spec1] * (6 if maxd is None else 7)
            + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 4,
            out_specs=[
                pl.BlockSpec((1, GROUP, cpad), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, GROUP, cpad), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, GROUP, RAY_TILE),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((GROUP, RAY_TILE), jnp.float32),
                pltpu.VMEM((TRI_CHUNK, GROUP), jnp.float32),
                pltpu.VMEM((TRI_CHUNK, GROUP), jnp.float32),
            ],
        )(
            cb, ox, oy, oz, ix, iy, iz,
            *(() if maxd is None else (maxd,)),
            *gate_ops,
            scal,
        )
        return ghit, tn[:, 0, :], texit, c, cpad
    ray_spec = pl.BlockSpec(
        (GROUP, RAY_TILE), lambda i, j: (i, 0),
        memory_space=pltpu.VMEM,
    )
    ghit, tn, texit = _pallas_call(
        _kernel_prepass_groups if maxd is None
        else _kernel_prepass_groups_seg,
        grid=(tiles, cpad // TRI_CHUNK),
        in_specs=[
            pl.BlockSpec((8, TRI_CHUNK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM)
        ]
        + [ray_spec] * (6 if maxd is None else 7)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[
            pl.BlockSpec((1, GROUP, TRI_CHUNK),
                         lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GROUP, TRI_CHUNK),
                         lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GROUP, RAY_TILE),
                         lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
    )(
        cb, ox, oy, oz, ix, iy, iz,
        *(() if maxd is None else (maxd,)),
        scal,
    )
    return ghit, tn[:, 0, :], texit, c, cpad


# _SC (clusters per SUPERCLUSTER schedule entry) comes from cluster_layout.
_SC_MIN_CLUSTERS = 1 << 30   # SUPERCLUSTER WALK: measured WASH on the
                         # 2.1M-tri scene (device 306 vs 298 ms; walk
                         # 1.211 vs 1.243 ms/call, sort -0.14, glue
                         # +0.3) — the per-visit overhead it amortizes
                         # (one DMA + key read per 8 clusters) is NOT
                         # where the zero_mask 55 ms lives; that is the
                         # per-MEMBER word loads + pop loops, which the
                         # sc walk pays identically. Kept fully tested
                         # (TestSCWalk forces it via this threshold)
                         # as the documented two-level-walk experiment;
                         # lower to ~2048 to re-enable at HBM scale.


def _sc_mode(n_clusters):
    return n_clusters >= _SC_MIN_CLUSTERS


def _cluster_list_groups(cluster_min, cluster_max, comps, t_min, b,
                         maxd=None, sc=False):
    """Schedule + group masks for the grouped kernel.

    Returns (count (tiles,), keys (tiles, E), mask_rows
    (tiles, R, E) i32, lostep (tiles, 2), texit (tiles, 8, 128)).

    Per-cluster mode (small scenes): E = Cpad entries, R = 4 rows of
    128 group bits per SCHEDULE ENTRY (sorted into schedule order
    alongside the keys, so the walk reads masks positionally and the
    schedule can stream through a small SMEM ring).

    Supercluster mode (>= _SC_MIN_CLUSTERS): E = Cpad/8 entries, each
    one _SC consecutive clusters = one contiguous (16, 1024) tri DMA;
    R = 33 rows — member m's four group words at rows 4m..4m+3 and an
    active-member bitmap at row 32. Entry order is (min member entry
    distance bucket, sc id); members pop in id order."""
    ghit, tn, texit, c, cpad = _prepass_groups(
        cluster_min, cluster_max, comps, t_min, b, maxd=maxd
    )
    # ghit: (tiles, 8, Cpad) f32 16-bit halfword sums (packed and
    # TRANSPOSED in-kernel so these ops run cpad-minor, not 8-minor)
    tiles = ghit.shape[0]
    h = ghit.astype(jnp.int32)
    gmask = h[:, 0::2, :] | (h[:, 1::2, :] << 16)  # (tiles, 4, Cpad)
    active = jnp.any(ghit > 0.0, axis=1) & (
        jnp.arange(cpad)[None, :] < c
    )
    if sc:
        ne = cpad // _SC
        act_m = active.reshape(tiles, ne, _SC)
        entry_act = jnp.any(act_m, axis=-1)
        tn_entry = jnp.min(
            jnp.where(act_m, tn.reshape(tiles, ne, _SC), jnp.inf),
            axis=-1,
        )
        mem_bits = jnp.sum(
            jnp.where(
                act_m,
                jnp.left_shift(
                    jnp.int32(1), jnp.arange(_SC, dtype=jnp.int32)
                )[None, None, :],
                0,
            ),
            axis=-1,
            dtype=jnp.int32,
        )
    else:
        ne = cpad
        entry_act = active
        tn_entry = tn
    count = jnp.sum(entry_act, axis=1).astype(jnp.int32)

    # front-to-back bucket quantization (same scheme as _cluster_list)
    tn_act = jnp.where(entry_act, tn_entry, jnp.inf)
    lo = jnp.min(tn_act, axis=1)
    hi = jnp.max(jnp.where(entry_act, tn_entry, -jnp.inf), axis=1)
    lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
    hi = jnp.where(jnp.isfinite(hi), hi, 0.0)
    step = jnp.maximum((hi - lo) / (_BUCKETS - 1), 1e-30)
    bucket = jnp.clip(
        ((tn_entry - lo[:, None]) / step[:, None]).astype(jnp.int32),
        0, _BUCKETS - 1,
    )
    bucket = jnp.where(entry_act, bucket, 0)
    iota = jnp.broadcast_to(
        jnp.arange(ne, dtype=jnp.int32)[None, :], (tiles, ne)
    )
    keys = (
        jnp.where(entry_act, 0, jnp.int32(1) << 30)
        | (bucket << _BUCKET_SHIFT)
        | iota
    )
    # Front-to-back compacted schedule in the glue: XLA's minor-dim
    # sort of (tiles, E) i32 costs ~0.02 ms (the 3.8 ms round-2
    # number was ONE 64k-long sort) — the in-kernel scalar counting
    # sort/compaction it replaces measured ~20k cycles/tile. Inactive
    # keys carry bit 30 and sink to the tail. The mask words ride the
    # sort as values (keys are UNIQUE — iota is a key field — so an
    # unstable sort is bit-identical, and XLA's stable lowering would
    # add an iota tiebreak operand, pure waste).
    if sc:
        gm = gmask.reshape(tiles, 4, ne, _SC)
        vals = [gm[:, w, :, m] for m in range(_SC) for w in range(4)]
        vals.append(mem_bits)
        srt = jax.lax.sort((keys, *vals), dimension=-1,
                           num_keys=1, is_stable=False)
        keys = srt[0]
        mask_rows = jnp.stack(srt[1:], axis=1)  # (tiles, 33, ne)
    else:
        srt = jax.lax.sort(
            (keys, gmask[:, 0, :], gmask[:, 1, :], gmask[:, 2, :],
             gmask[:, 3, :]),
            dimension=-1, num_keys=1, is_stable=False,
        )
        keys = srt[0]
        mask_rows = jnp.stack(srt[1:], axis=1)  # (tiles, 4, ne)
    lostep = jnp.stack([lo, step], axis=1)          # (tiles, 2)
    return count, keys, mask_rows, lostep, texit


def _log2_onehot(m):
    """Bit index of a single-bit int32 mask, branch-free on the scalar
    core (works for bit 31: m-1 wraps to 0x7fffffff)."""
    x = m - 1
    # popcount via SWAR adds (scalar int32 ops only)
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return (x * 0x01010101) >> 24


def _sched_slots(cpad):
    """(ring slots, entries per slot) for a schedule of length cpad."""
    if cpad <= _SCHED_CHUNK:
        return 2, cpad
    return 4, _SCHED_CHUNK


def _sched_stream(sched_hbm, smem_ring, smem_sem, i, n_tiles):
    """Schedule access through a chunked SMEM ring.

    Single-chunk scenes (cpad <= _SCHED_CHUNK) keep the resident
    layout: one (8, cpad) slot per tile parity, primed one grid step
    ahead. Larger schedules STREAM (8, ch)-entry chunks instead —
    SMEM tops out under 1 MB on this chip, so a 16k-cluster scene's
    schedule cannot sit resident; slots are (tile parity x chunk
    parity). Chunk 0 of tile i+1 is primed during tile i's walk;
    chunk c+1 is fetched start+wait (a ~us stall against ~ch visits
    of walk) when the walk enters chunk c. The tri-DMA lookahead reads
    at most _DMA_RING-1 << ch positions ahead, so iterations inside
    chunk c only ever read chunks c and c+1 — both resident by the
    invariant above.

    Returns (prologue, advance, sched_at, mask_at)."""
    ch = smem_ring.shape[2]
    multi = smem_ring.shape[0] == 4

    def chunk_dma(slot, t, c):
        if not multi:
            return pltpu.make_async_copy(
                sched_hbm.at[t], smem_ring.at[slot], smem_sem.at[slot]
            )
        return pltpu.make_async_copy(
            sched_hbm.at[t, :, pl.ds(c * ch, ch)],
            smem_ring.at[slot], smem_sem.at[slot],
        )

    if not multi:
        cur = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        def prologue():
            @pl.when(i == 0)
            def _():
                chunk_dma(0, 0, 0).start()

            @pl.when(i + 1 < n_tiles)
            def _():
                chunk_dma(nxt, i + 1, 0).start()

            chunk_dma(cur, i, 0).wait()

        def advance(k, n_active):
            pass

        def sched_at(pos):
            return smem_ring[cur, 0, pos]

        def mask_at(w, pos):
            return smem_ring[cur, 1 + w, pos]

        return prologue, advance, sched_at, mask_at

    i_base = jax.lax.rem(i, 2) * 2

    def slot_of(pos):
        return i_base + jax.lax.rem(pos // ch, 2)

    def prologue():
        @pl.when(i == 0)
        def _():
            chunk_dma(0, 0, 0).start()

        @pl.when(i + 1 < n_tiles)
        def _():
            chunk_dma(jax.lax.rem(i + 1, 2) * 2, i + 1, 0).start()

        chunk_dma(i_base, i, 0).wait()

    def advance(k, n_active):
        @pl.when(jax.lax.rem(k, ch) == 0)
        def _():
            c = k // ch

            @pl.when((c + 1) * ch < n_active)
            def _():
                dma = chunk_dma(
                    i_base + jax.lax.rem(c + 1, 2), i, c + 1
                )
                dma.start()
                dma.wait()

    def sched_at(pos):
        return smem_ring[slot_of(pos), 0, jax.lax.rem(pos, ch)]

    def mask_at(w, pos):
        return smem_ring[slot_of(pos), 1 + w, jax.lax.rem(pos, ch)]

    return prologue, advance, sched_at, mask_at


def _kernel_grouped_dma(count_ref, lostep_ref, tmin_ref,
                        sched_hbm, comp_hbm, tri_hbm,
                        out_ref,
                        scratch, sem, tcand, icand,
                        gbest, smem_ring, smem_sem,
                        comp_ring, comp_sem, bcast):
    # Per-tile inputs (schedule keys + group masks -> SMEM; lane-
    # broadcast ray comps + exit bounds -> VMEM) are DMA'd BY THE
    # KERNEL through prefetch rings primed one grid step ahead (the
    # schedule ring is chunked past _SCHED_CHUNK entries — see
    # _sched_stream). Mosaic's own per-step block copies do NOT
    # overlap the body at all (benchmarks/visit_probe.py: an empty
    # body still costs 13 us/tile and dummy compute is fully additive;
    # block-granular SMEM copies add 7.6 us/tile at Cpad=896) — manual
    # prefetch hides the whole ~20.6 us/tile input floor behind the
    # previous tile's walk.
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    cur = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)
    prologue, advance, sched_at, mask_at = _sched_stream(
        sched_hbm, smem_ring, smem_sem, i, n_tiles
    )

    def comp_dma(slot, t):
        return pltpu.make_async_copy(
            comp_hbm.at[t], comp_ring.at[slot], comp_sem.at[slot]
        )

    @pl.when(i == 0)
    def _():
        comp_dma(0, 0).start()

    @pl.when(i + 1 < n_tiles)
    def _():
        comp_dma(nxt, i + 1).start()

    prologue()
    comp_dma(cur, i).wait()

    # Expand the compact comps to lane-broadcast form (ray r of the
    # tile at sublane r, identical across lanes, so the walk reads
    # group g's rays as one aligned (8, 128) slice). All offsets are
    # STATIC (dynamic lane extraction is not expressible on the VPU);
    # ~770 unrolled slice+broadcast+store ops, ~3 us/tile — replacing
    # a 3.1 MB/tile DMA that cost 15 us/tile and stalled the walk's
    # cluster fetches behind it on the same queue.
    if not _SKIP_EXPAND:
        for c in range(6):
            for g in range(GROUPS_PER_TILE):
                bcast[c * RAYS_PER_TILE + g * GROUP:
                      c * RAYS_PER_TILE + (g + 1) * GROUP, :] = (
                    jnp.broadcast_to(
                        comp_ring[cur, c * GROUP:(c + 1) * GROUP,
                                  g:g + 1],
                        (GROUP, RAY_TILE),
                    )
                )

    n_active = count_ref[i]
    t_min = tmin_ref[0]
    # (t > 1e-8) & (t >= t_min) == t >= max(nextafter(1e-8f), t_min):
    # one fused compare per pair instead of two compares + an and.
    t_cut = jnp.maximum(jnp.float32(1.000000082740371e-08), t_min)
    lo = lostep_ref[i, 0]
    step = lostep_ref[i, 1]
    cpad = sched_hbm.shape[2]

    # The schedule arrives pre-sorted and compacted from the glue
    # (lax.sort in _cluster_list_groups, group-mask words carried
    # alongside): entries [0, n_active) are the active clusters
    # front-to-back, masks read POSITIONALLY. The in-kernel scalar
    # counting sort/compaction this replaces measured ~20k cycles/tile
    # (1.3 ms of a 2.2 ms kernel at 64k rays — benchmarks/visit_probe.py).
    def sched(k):
        return sched_at(k)

    def get_dma(slot, k):
        cid = sched(k) & (_GMAX_CLUSTERS - 1)
        return pltpu.make_async_copy(
            tri_hbm.at[:, pl.ds(cid * TRI_CHUNK, TRI_CHUNK)],
            scratch.at[slot],
            sem.at[slot],
        )

    # Prime the DMA ring: with per-cluster compute as small as ~2 group
    # visits, a 2-deep pipeline leaves the walk DMA-LATENCY bound
    # (measured ~0.4 us/cluster visit); _DMA_RING-deep prefetch hides it.
    def prime(k, carry):
        @pl.when(k < n_active)
        def _():
            get_dma(jax.lax.rem(k, _DMA_RING), k).start()

        return carry

    jax.lax.fori_loop(0, _DMA_RING - 1, prime, 0)

    # candidates: +inf / BIG id per (ray slot, group*128 + tri lane).
    # They live in a VMEM accumulator addressed by dynamic lane offset
    # g*128 — carrying them as while_loop registers instead was measured
    # 2x SLOWER (Mosaic spills vector loop carries every iteration).
    if not _SKIP_FILLS:
        tcand[...] = jnp.full(
            (GROUP, GROUPS_PER_TILE * TRI_CHUNK), jnp.inf
        )
        icand[...] = jnp.full(
            (GROUP, GROUPS_PER_TILE * TRI_CHUNK), _BIG_ID, jnp.int32
        )
    if _GROUPED_EARLY_OUT:
        # per-(ray slot, group) running interest: best hit so far,
        # capped by the ray's scene-exit bound so miss rays stop
        # holding their group open once the schedule passes their exit
        # (exit bounds ride the comp pack's last 8 rows)
        gbest[...] = comp_ring[cur, 6 * GROUP:7 * GROUP, :]

    lane_iota = jax.lax.broadcasted_iota(
        jnp.int32, (GROUP, RAY_TILE), 1
    )
    tri_iota = jax.lax.broadcasted_iota(
        jnp.int32, (GROUP, TRI_CHUNK), 1
    )
    hw16 = jnp.left_shift(jnp.int32(1), lane_iota % 16).astype(
        jnp.float32
    )
    seg16 = lane_iota // 16                    # (8, 128) in [0, 8)

    def body(k, carry):
        open0, open1, open2, open3 = carry
        advance(k, n_active)
        slot = jax.lax.rem(k, _DMA_RING)
        ahead = jnp.minimum(k + _DMA_RING - 1, cpad - 1)

        @pl.when(k + _DMA_RING - 1 < n_active)
        def _():
            get_dma(jax.lax.rem(ahead, _DMA_RING), ahead).start()

        get_dma(slot, k).wait()

        trb = scratch[slot]                    # (16, 128)

        # the 12 affine rows are invariant across this cluster's popped
        # groups: load + sublane-broadcast them ONCE per cluster visit
        # instead of once per (group, cluster) pair (measured 58 ->
        # fewer cycles/pair; the walk pops ~2.3-10 groups per visit)
        (r0, r1, r2, r3, r4, r5, r6, r7, r8, r9, r10, r11) = [
            trb[kk:kk+1, :] for kk in range(12)
        ]

        cid = sched(k) & (_GMAX_CLUSTERS - 1)
        ids_lane = tri_iota + cid * TRI_CHUNK

        def process_group(g):
            # group g's rays arrive pre-broadcast over lanes: rows
            # [c*1024 + g*8, +8) of the prefetched comp pack — a
            # dynamic sublane slice at a provable multiple of 8,
            # replacing six one-hot extract reductions per pair
            s0 = g * GROUP

            def ext(c):
                return bcast[
                    pl.ds(c * RAYS_PER_TILE + s0, GROUP), :
                ]                                          # (8, 128)

            rox, roy, roz = ext(0), ext(1), ext(2)
            rdx, rdy, rdz = ext(3), ext(4), ext(5)
            os_ = r6 * rox + r7 * roy + r8 * roz - r11
            ds_ = r6 * rdx + r7 * rdy + r8 * rdz
            t = -os_ / ds_
            u = (
                r0 * rox + r1 * roy + r2 * roz - r9
            ) + t * (r0 * rdx + r1 * rdy + r2 * rdz)
            v = (
                r3 * rox + r4 * roy + r5 * roz - r10
            ) + t * (r3 * rdx + r4 * rdy + r5 * rdz)
            # fused predicate: min(u,v)>=0 == (u>=0)&(v>=0); t>=t_cut
            # == (t>1e-8)&(t>=t_min) (see t_cut above). NaN lanes
            # (ds_==0) fail every compare either way.
            ok = (
                (jnp.minimum(u, v) >= 0.0) & (u + v <= 1.0)
                & (t >= t_cut)
            )
            off = g * TRI_CHUNK
            tcur = tcand[:, pl.ds(off, TRI_CHUNK)]
            icur = icand[:, pl.ds(off, TRI_CHUNK)]
            better = ok & (t < tcur)
            tcand[:, pl.ds(off, TRI_CHUNK)] = jnp.where(
                better, t, tcur
            )
            icand[:, pl.ds(off, TRI_CHUNK)] = jnp.where(
                better, ids_lane, icur
            )
            if _GROUPED_EARLY_OUT:
                # shrink this group's interest for the early-out
                tw = jnp.min(
                    jnp.where(ok, t, jnp.inf), axis=1, keepdims=True
                )                                            # (8, 1)
                sel = lane_iota == g
                gbest[...] = jnp.where(
                    sel, jnp.minimum(gbest[...], tw), gbest[...]
                )

        ow = (open0, open1, open2, open3)
        for w in range(4):
            # Pop up to FOUR set bits per iteration and emit their four
            # pair computations into one basic block: the chains are
            # independent, so the scheduler can interleave them (one
            # pair per while-iteration measured ~58 cycles, dominated
            # by dependency latency, not issue slots). When fewer than
            # 4 bits remain the spares duplicate g1 — the min-updates
            # are idempotent, and the ILP win outweighs the duplicate
            # arithmetic even at the incoherent mean of 2.3 bits.
            def bit_body(m):
                lb1 = m & (-m)
                m1 = m & (m - 1)
                lb2 = m1 & (-m1)
                m2 = m1 & (m1 - 1)
                g1 = w * 32 + _log2_onehot(lb1)
                process_group(g1)
                if _POP_GUARD:
                    # skip the odd-count duplicate entirely: the
                    # scalar branch costs less than the (8, 128)
                    # pair arithmetic it saves (measured)
                    @pl.when(lb2 != 0)
                    def _():
                        process_group(w * 32 + _log2_onehot(lb2))
                else:
                    g2 = jnp.where(lb2 != 0,
                                   w * 32 + _log2_onehot(lb2), g1)
                    process_group(g2)
                return m2

            jax.lax.while_loop(
                lambda m: m != 0, bit_body,
                mask_at(w, k) & ow[w],
            )
        return open0, open1, open2, open3

    full = jnp.int32(-1)
    if _SKIP_WALK:
        pass
    elif not _GROUPED_EARLY_OUT:
        jax.lax.fori_loop(0, n_active, body, (full, full, full, full))
    else:
        # Front-to-back early-out: the schedule is sorted by quantized
        # entry distance, so the BIN lower edge of the block's first
        # cluster bounds every remaining cluster's closest possible
        # hit; groups whose every ray's interest (best-hit-or-exit) is
        # closer are finished. The refresh runs STRAIGHT-LINE once per
        # _EARLY_BLOCK clusters (an outer while): the same reductions
        # inside a lax.cond hang the Mosaic compiler.
        def outer(carry):
            kbase, _, _, _, _ = carry
            key0 = sched(kbase)
            bucket = (key0 >> _BUCKET_SHIFT) & (
                (_BUCKETS - 1) ^ ((1 << _BIN_SUB_BITS) - 1)
            )
            bound = lo + bucket.astype(jnp.float32) * step
            grp_open = jnp.max(
                (gbest[...] >= bound).astype(jnp.float32),
                axis=0, keepdims=True,
            )                                          # (1, 128)
            words = []
            for h in range(8):
                words.append(jnp.sum(jnp.where(
                    (seg16[0:1, :] == h) & (grp_open > 0.0),
                    hw16[0:1, :], 0.0,
                )).astype(jnp.int32))
            ow = (words[0] | (words[1] << 16),
                  words[2] | (words[3] << 16),
                  words[4] | (words[5] << 16),
                  words[6] | (words[7] << 16))
            kend = jnp.minimum(kbase + _EARLY_BLOCK, n_active)
            _ = jax.lax.fori_loop(kbase, kend, body, ow)
            any_open = ow[0] | ow[1] | ow[2] | ow[3]
            return kend, any_open, ow[1], ow[2], ow[3]

        def outer_cond(carry):
            kbase, any_open, _, _, _ = carry
            return (kbase < n_active) & (any_open != 0)

        fin = jax.lax.while_loop(
            outer_cond, outer, (jnp.int32(0), full, full, full, full)
        )
        # DMAs are issued _DMA_RING-1 ahead of the wait point; on an
        # early exit retire anything still in flight so the kernel
        # never ends with an armed semaphore.
        kfin = fin[0]

        def drain(k, carry):
            @pl.when((k >= kfin) & (k < n_active))
            def _():
                get_dma(jax.lax.rem(k, _DMA_RING), k).wait()

            return carry

        jax.lax.fori_loop(
            kfin, jnp.minimum(kfin + _DMA_RING - 1, n_active), drain, 0
        )

    if _SKIP_RESOLVE:
        out_ref[0:GROUP, :] = tcand[:, 0:RAY_TILE]
        out_ref[GROUP:2 * GROUP, :] = icand[:, 0:RAY_TILE].astype(
            jnp.float32
        )
        return

    # ---- final vectorized winner resolution (one pass over groups)
    tacc = jnp.full((GROUP, RAY_TILE), jnp.inf)
    iacc = jnp.zeros((GROUP, RAY_TILE), jnp.int32)
    for g in range(GROUPS_PER_TILE):
        tg = tcand[:, g * TRI_CHUNK:(g + 1) * TRI_CHUNK]
        ig = icand[:, g * TRI_CHUNK:(g + 1) * TRI_CHUNK]
        tw = jnp.min(tg, axis=1, keepdims=True)             # (8, 1)
        iw = jnp.min(
            jnp.where(tg == tw, ig, _BIG_ID), axis=1, keepdims=True
        )
        sel = lane_iota == g
        tacc = jnp.where(sel, tw, tacc)
        iacc = jnp.where(sel, iw, iacc)
    # single merged output block (ids bitcast to f32 rows 8..15): one
    # per-step output copy instead of two
    out_ref[0:GROUP, :] = tacc
    out_ref[GROUP:2 * GROUP, :] = jax.lax.bitcast_convert_type(
        jnp.where(jnp.isfinite(tacc), iacc, 0), jnp.float32
    )




@partial(jax.jit, static_argnames=("zero_mask", "parallel", "zero_sched",
                                   "tiny_smem"))
def pallas_closest_tuv_dma_grouped(tri_pack, cluster_min, cluster_max,
                                   o, d, t_min=1e-4, *,
                                   zero_mask=False, parallel=False,
                                   zero_sched=False, tiny_smem=False):
    """(t, reordered tri idx) closest hit, 8-ray-group cull granularity.

    Same scene inputs as pallas_closest_tuv_dma (transposed spatially-
    clustered tri_pack + cluster AABBs); any batch size.

    zero_mask=True is a PROBE ONLY: the schedule walk runs with all
    group masks zeroed (every cluster visit happens, no pair is
    processed), isolating per-visit overhead. zero_sched=True empties
    the schedule entirely (per-tile floor). parallel=True marks the
    tile grid dimension parallel so Mosaic may split it across
    TensorCores (no-op on single-TensorCore v5e — measured)."""
    (o, d), b0 = _pad_rays(o, d)
    b = o.shape[0]
    tiles = b // RAYS_PER_TILE

    def tcomp(x):
        return (
            x.reshape(tiles, GROUPS_PER_TILE, GROUP)
            .transpose(0, 2, 1)
            .reshape(tiles * GROUP, RAY_TILE)
        )

    comps = [tcomp(o[:, 0]), tcomp(o[:, 1]), tcomp(o[:, 2]),
             tcomp(d[:, 0]), tcomp(d[:, 1]), tcomp(d[:, 2])]
    sc = _sc_mode(cluster_min.shape[0])
    count, keys, gmask, lostep, texit = _cluster_list_groups(
        cluster_min, cluster_max, comps, t_min, b, sc=sc
    )
    if zero_mask:
        gmask = gmask * 0
    if zero_sched:
        # PROBE ONLY: empty schedule — the kernel still copies the
        # per-tile inputs but visits nothing (per-tile floor)
        count = count * 0
        keys = keys | (1 << 30)
    cpad = keys.shape[1]

    # schedule pack (tiles, R, cpad) i32: row 0 = sorted keys, then the
    # mask rows IN SCHEDULE ORDER (4 group words per cluster, or 32
    # member words + member bitmap per supercluster), zero-padded to a
    # multiple of 8 rows (Mosaic DMA slices must cover whole 8-sublane
    # tiles); streamed to SMEM by the kernel's chunked prefetch ring
    # (_sched_stream). cpad rounds up to whole chunks so every chunk
    # DMA slice is in bounds — the zero padding is never read (reads
    # stop at n_active <= cpad).
    rows = 1 + gmask.shape[1]
    rows_pad = (-rows) % 8
    sched_pack = jnp.concatenate(
        [keys[:, None, :], gmask,
         jnp.zeros((tiles, rows_pad, cpad), jnp.int32)], axis=1
    )
    if cpad > _SCHED_CHUNK and cpad % _SCHED_CHUNK:
        pad = _SCHED_CHUNK - cpad % _SCHED_CHUNK
        sched_pack = jnp.pad(sched_pack, ((0, 0), (0, 0), (0, pad)))
        cpad += pad
    if tiny_smem:
        # PROBE ONLY (with zero_sched): shrink the per-tile schedule
        # DMA to measure its share of the floor
        sched_pack = sched_pack[:, :, :TRI_CHUNK]
        cpad = TRI_CHUNK
    n_slots, ch = _sched_slots(cpad)
    n_rows = sched_pack.shape[1]

    # comp pack (tiles, 56, 128): the six COMPACT transposed comps
    # (sublane = ray slot, lane = group — the prepass layout) stacked
    # as 8-row blocks, ++ the per-ray exit bounds as rows 48..55.
    # 28 KB/tile instead of the 3.1 MB/tile lane-broadcast form: the
    # big DMA was the per-tile floor (15 us/tile, single-queue HBM
    # stream) AND a 200 MB XLA materialization per call. The kernel
    # re-expands to lane-broadcast form on-chip with static slices.
    comp_pack = jnp.concatenate(
        [x.reshape(tiles, GROUP, GROUPS_PER_TILE) for x in comps]
        + [texit],
        axis=1,
    )                            # (tiles, 7*8, 128)
    scratch_shapes = [
        pltpu.VMEM((_DMA_RING, 16,
                    (_SC if sc else 1) * TRI_CHUNK), jnp.float32),
        pltpu.SemaphoreType.DMA((_DMA_RING,)),
        pltpu.VMEM((GROUP, GROUPS_PER_TILE * TRI_CHUNK),
                   jnp.float32),
        pltpu.VMEM((GROUP, GROUPS_PER_TILE * TRI_CHUNK),
                   jnp.int32),
    ]
    if not sc:
        scratch_shapes.append(
            pltpu.VMEM((GROUP, RAY_TILE), jnp.float32)   # gbest
        )
    scratch_shapes += [
        pltpu.SMEM((n_slots, n_rows, ch), jnp.int32),
        pltpu.SemaphoreType.DMA((n_slots,)),
        pltpu.VMEM((2, 7 * GROUP, RAY_TILE), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.VMEM((6 * RAYS_PER_TILE, RAY_TILE), jnp.float32),
    ]
    if sc:
        from .intersect_pallas_lab import _kernel_grouped_dma_sc
    out = _pallas_call(
        _kernel_grouped_dma_sc if sc else _kernel_grouped_dma,
        grid=(tiles,),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel" if parallel else "arbitrary",
            ),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (2 * GROUP, RAY_TILE), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (tiles * 2 * GROUP, RAY_TILE), jnp.float32
        ),
        scratch_shapes=scratch_shapes,
    )(
        count,
        lostep,
        jnp.full((1,), t_min, jnp.float32),
        sched_pack,
        comp_pack,
        tri_pack,
    )

    out = out.reshape(tiles, 2, GROUP, RAY_TILE)
    t = out[:, 0].reshape(tiles * GROUP, RAY_TILE)
    idx = jax.lax.bitcast_convert_type(
        out[:, 1], jnp.int32
    ).reshape(tiles * GROUP, RAY_TILE)

    def untcomp(x):
        return (
            x.reshape(tiles, GROUP, GROUPS_PER_TILE)
            .transpose(0, 2, 1)
            .reshape(b)
        )

    return untcomp(t)[:b0], untcomp(idx)[:b0]


# ---------------------------------------------------------------------------
# Grouped any-hit: form-factor visibility at scale
# ---------------------------------------------------------------------------
#
# The N^2 radiosity form-factor pass (visibility_test_anyhit,
# form_factors.h:144-209) is a ray workload as large as rendering itself:
# N^2 pairs x S sample segments, each tested against EVERY triangle by the
# brute/VMEM any-hit backends (32k tests/segment at subdivision 5). This
# variant reuses the grouped culled machinery — median-split clusters,
# group-granular prepass (with the ray's segment length as an extra cull
# bound), sorted SMEM schedule, 8-deep cluster DMA ring — so each segment
# only tests the clusters its line pierces within (eps, maxd]. Exclusion
# of the source/target primitives rides row 12 of the ordered tri pack.


def _kernel_grouped_anyhit_dma(count_ref, sched_hbm, comp_hbm, tri_hbm,
                               out_ref,
                               scratch, sem, hcand,
                               smem_ring, smem_sem,
                               comp_ring, comp_sem, bcast):
    """Any-hit walk: OR-accumulates the blocked flag per (ray slot,
    group) in a VMEM accumulator; no (t, id) tracking, no tie-breaks.
    Same prefetch structure as _kernel_grouped_dma; comp pack carries
    NINE per-ray values (o, d, maxd, ex_a, ex_b)."""
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    cur = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)
    prologue, advance, sched_at, mask_at = _sched_stream(
        sched_hbm, smem_ring, smem_sem, i, n_tiles
    )

    def comp_dma(slot, t):
        return pltpu.make_async_copy(
            comp_hbm.at[t], comp_ring.at[slot], comp_sem.at[slot]
        )

    @pl.when(i == 0)
    def _():
        comp_dma(0, 0).start()

    @pl.when(i + 1 < n_tiles)
    def _():
        comp_dma(nxt, i + 1).start()

    prologue()
    comp_dma(cur, i).wait()

    for c in range(9):
        for g in range(GROUPS_PER_TILE):
            bcast[c * RAYS_PER_TILE + g * GROUP:
                  c * RAYS_PER_TILE + (g + 1) * GROUP, :] = (
                jnp.broadcast_to(
                    comp_ring[cur, c * GROUP:(c + 1) * GROUP, g:g + 1],
                    (GROUP, RAY_TILE),
                )
            )

    n_active = count_ref[i]

    def sched(k):
        return sched_at(k)

    def get_dma(slot, k):
        cid = sched(k) & (_GMAX_CLUSTERS - 1)
        return pltpu.make_async_copy(
            tri_hbm.at[:, pl.ds(cid * TRI_CHUNK, TRI_CHUNK)],
            scratch.at[slot],
            sem.at[slot],
        )

    def prime(k, carry):
        @pl.when(k < n_active)
        def _():
            get_dma(jax.lax.rem(k, _DMA_RING), k).start()

        return carry

    jax.lax.fori_loop(0, _DMA_RING - 1, prime, 0)

    hcand[...] = jnp.zeros(
        (GROUP, GROUPS_PER_TILE * TRI_CHUNK), jnp.float32
    )
    lane_iota = jax.lax.broadcasted_iota(
        jnp.int32, (GROUP, RAY_TILE), 1
    )
    cpad = sched_hbm.shape[2]

    def body(k, carry):
        advance(k, n_active)
        slot = jax.lax.rem(k, _DMA_RING)
        ahead = jnp.minimum(k + _DMA_RING - 1, cpad - 1)

        @pl.when(k + _DMA_RING - 1 < n_active)
        def _():
            get_dma(jax.lax.rem(ahead, _DMA_RING), ahead).start()

        get_dma(slot, k).wait()

        trb = scratch[slot]                    # (16, 128)
        (r0, r1, r2, r3, r4, r5, r6, r7, r8, r9, r10, r11) = [
            trb[kk:kk + 1, :] for kk in range(12)
        ]
        prim_row = trb[12:13, :]               # (1, 128) logical prim id

        def process_group(g):
            s0 = g * GROUP

            def ext(c):
                return bcast[
                    pl.ds(c * RAYS_PER_TILE + s0, GROUP), :
                ]                                          # (8, 128)

            rox, roy, roz = ext(0), ext(1), ext(2)
            rdx, rdy, rdz = ext(3), ext(4), ext(5)
            rmax, rea, reb = ext(6), ext(7), ext(8)
            os_ = r6 * rox + r7 * roy + r8 * roz - r11
            ds_ = r6 * rdx + r7 * rdy + r8 * rdz
            t = -os_ / ds_
            u = (
                r0 * rox + r1 * roy + r2 * roz - r9
            ) + t * (r0 * rdx + r1 * rdy + r2 * rdz)
            v = (
                r3 * rox + r4 * roy + r5 * roz - r10
            ) + t * (r3 * rdx + r4 * rdy + r5 * rdz)
            # the any-hit window (eps=1e-5 < t < maxd) + two excluded
            # primitive ids, exactly pallas_occluded's predicate
            # (visibility_test_anyhit, form_factors.h:144-209)
            ok = (
                (jnp.minimum(u, v) >= 0.0) & (u + v <= 1.0)
                & (t > 1e-5) & (t < rmax)
                & (prim_row != rea) & (prim_row != reb)
            )
            off = g * TRI_CHUNK
            hcand[:, pl.ds(off, TRI_CHUNK)] = jnp.maximum(
                hcand[:, pl.ds(off, TRI_CHUNK)],
                ok.astype(jnp.float32),
            )

        for w in range(4):
            def bit_body(m):
                lb1 = m & (-m)
                m1 = m & (m - 1)
                lb2 = m1 & (-m1)
                m2 = m1 & (m1 - 1)
                g1 = w * 32 + _log2_onehot(lb1)
                process_group(g1)
                if _POP_GUARD:
                    @pl.when(lb2 != 0)
                    def _():
                        process_group(w * 32 + _log2_onehot(lb2))
                else:
                    g2 = jnp.where(lb2 != 0,
                                   w * 32 + _log2_onehot(lb2), g1)
                    process_group(g2)
                return m2

            jax.lax.while_loop(
                lambda m: m != 0, bit_body,
                mask_at(w, k),
            )
        return carry

    jax.lax.fori_loop(0, n_active, body, jnp.int32(-1))

    acc = jnp.zeros((GROUP, RAY_TILE), jnp.float32)
    for g in range(GROUPS_PER_TILE):
        hg = hcand[:, g * TRI_CHUNK:(g + 1) * TRI_CHUNK]
        hw = jnp.max(hg, axis=1, keepdims=True)            # (8, 1)
        acc = jnp.where(lane_iota == g, hw, acc)
    out_ref[...] = acc




@partial(jax.jit, static_argnames=())
def pallas_occluded_dma_grouped(tri_pack, cluster_min, cluster_max,
                                o, d, max_dist,
                                exclude_a=None, exclude_b=None):
    """Blocked mask for ray segments via the grouped culled kernel
    (any batch size; padded internally). Drop-in for
    ops.intersect.occluded / pallas_occluded on HBM-scale scenes:
    each segment tests only the median-split clusters its line pierces
    within (1e-5, maxd], not the whole triangle set.

    tri_pack must come from pack_triangles_ordered (row 12 = logical
    prim ids for the exclusion test)."""
    if exclude_a is None:
        exclude_a = jnp.full((o.shape[0],), -1, jnp.int32)
    if exclude_b is None:
        exclude_b = jnp.full((o.shape[0],), -1, jnp.int32)
    max_dist = jnp.broadcast_to(
        jnp.asarray(max_dist, jnp.float32), (o.shape[0],)
    )
    (o, d, max_dist, exa, exb), b0 = _pad_rays(
        o, d, max_dist,
        exclude_a.astype(jnp.float32), exclude_b.astype(jnp.float32),
    )
    b = o.shape[0]
    # padded lanes: max_dist fill of 1.0 could report blocked; force 0
    # (the prepass then finds zero clusters for them: tn >= 1e-5 > 0)
    lane_ok = jnp.arange(b) < b0
    max_dist = jnp.where(lane_ok, max_dist, 0.0)
    tiles = b // RAYS_PER_TILE

    def tcomp(x):
        return (
            x.reshape(tiles, GROUPS_PER_TILE, GROUP)
            .transpose(0, 2, 1)
            .reshape(tiles * GROUP, RAY_TILE)
        )

    comps = [tcomp(o[:, 0]), tcomp(o[:, 1]), tcomp(o[:, 2]),
             tcomp(d[:, 0]), tcomp(d[:, 1]), tcomp(d[:, 2])]
    md_t, exa_t, exb_t = tcomp(max_dist), tcomp(exa), tcomp(exb)
    sc = _sc_mode(cluster_min.shape[0])
    count, keys, gmask, _lostep, _texit = _cluster_list_groups(
        cluster_min, cluster_max, comps, 1e-5, b, maxd=md_t, sc=sc
    )
    cpad = keys.shape[1]
    rows_pad = (-(1 + gmask.shape[1])) % 8
    sched_pack = jnp.concatenate(
        [keys[:, None, :], gmask,
         jnp.zeros((tiles, rows_pad, cpad), jnp.int32)], axis=1
    )
    if cpad > _SCHED_CHUNK and cpad % _SCHED_CHUNK:
        pad = _SCHED_CHUNK - cpad % _SCHED_CHUNK
        sched_pack = jnp.pad(sched_pack, ((0, 0), (0, 0), (0, pad)))
        cpad += pad
    n_slots, ch = _sched_slots(cpad)
    n_rows = sched_pack.shape[1]
    comp_pack = jnp.concatenate(
        [x.reshape(tiles, GROUP, GROUPS_PER_TILE)
         for x in comps + [md_t, exa_t, exb_t]],
        axis=1,
    )                            # (tiles, 9*8, 128)
    if sc:
        from .intersect_pallas_lab import _kernel_grouped_anyhit_dma_sc
    out = _pallas_call(
        _kernel_grouped_anyhit_dma_sc if sc
        else _kernel_grouped_anyhit_dma,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (GROUP, RAY_TILE), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (tiles * GROUP, RAY_TILE), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((_DMA_RING, 16,
                        (_SC if sc else 1) * TRI_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((_DMA_RING,)),
            pltpu.VMEM((GROUP, GROUPS_PER_TILE * TRI_CHUNK),
                       jnp.float32),
            pltpu.SMEM((n_slots, n_rows, ch), jnp.int32),
            pltpu.SemaphoreType.DMA((n_slots,)),
            pltpu.VMEM((2, 9 * GROUP, RAY_TILE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((9 * RAYS_PER_TILE, RAY_TILE), jnp.float32),
        ],
    )(
        count,
        sched_pack,
        comp_pack,
        tri_pack,
    )

    blocked = (
        out.reshape(tiles, GROUP, GROUPS_PER_TILE)
        .transpose(0, 2, 1)
        .reshape(b)
    )
    return blocked[:b0] > 0.0
