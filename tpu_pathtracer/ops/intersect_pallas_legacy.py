"""First-generation culled intersectors (live fallbacks, off the hot path).

Three earlier TPU intersector designs that the grouped culled-DMA path
(intersect_pallas.py) superseded as the production backend but which
remain selectable and equivalence-tested:

  * pallas_closest_tuv_culled — VMEM-resident triangles with an XLA
    per-row cluster visibility mask (scenes that fit VMEM).
  * _prepass / _kernel_prepass — per-ray-row cluster prepass feeding...
  * pallas_closest_tuv_dma — the 128-ray-row HBM cluster-DMA walk
    (CulledScene(grouped=False) and the sort_rays=True variant).

Moved here from intersect_pallas.py (round-5 VERDICT item 9) verbatim;
no behavior change. Provenance citations unchanged: the row walk
replaces the reference's per-thread BVH descent
(/root/reference/include/rendering/bvh.h:222-270).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect_pallas import (
    DMA_ROWS,
    RAYS_PER_TILE,
    RAY_TILE,
    ROWS_PER_STEP,
    TRI_CHUNK,
    _BIG_ID,
    _BITS_SHIFT,
    _BUCKETS,
    _BUCKET_SHIFT,
    _ID_BITS,
    _MAX_CLUSTERS,
    _pad_rays,
    _pallas_call,
    _ray_comps,
    _ray_spec,
)

def _kernel_prepass_probe(cb_ref, ox, oy, oz, ix, iy, iz, scal_ref,
                          tbest_ref, cbest_ref):
    """Slim prepass variant: per-ray nearest touched cluster ONLY.

    Same slab tests as _kernel_prepass but skips the per-(tile, cluster)
    row-hit flags, tile-min entry distances and t_exit accumulation —
    the sort path in pallas_closest_tuv_dma needs only c_best on the
    UNSORTED rays (the full prepass then runs once on the sorted batch),
    so the old full double-prepass paid ~2x the pre-pass cost per bounce
    for outputs it discarded."""
    t_min = scal_ref[0]
    n_real = scal_ref[1]
    j = pl.program_id(1)
    blk = jnp.transpose(cb_ref[...])          # (128 clusters, 8)
    cvalid = (
        jax.lax.broadcasted_iota(jnp.int32, (TRI_CHUNK, 1), 0)
        + j * TRI_CHUNK
    ).astype(jnp.float32) < n_real

    def col(k):
        return blk[:, k][:, None]

    tbest8 = []
    cbest8 = []
    for r in range(DMA_ROWS):
        ro = (ox[r:r+1, :], oy[r:r+1, :], oz[r:r+1, :])
        ri = (ix[r:r+1, :], iy[r:r+1, :], iz[r:r+1, :])
        tn = jnp.full((TRI_CHUNK, RAY_TILE), t_min, jnp.float32)
        tf = jnp.full((TRI_CHUNK, RAY_TILE), jnp.inf, jnp.float32)
        for ax in range(3):
            lo = (col(ax) - ro[ax]) * ri[ax]
            hi = (col(ax + 3) - ro[ax]) * ri[ax]
            tn = jnp.maximum(tn, jnp.minimum(lo, hi))
            tf = jnp.minimum(tf, jnp.maximum(lo, hi))
        hit = (tf >= tn) & (tf > 0.0)
        tn_ray = jnp.where(hit & cvalid, tn, jnp.inf)
        tbr = jnp.min(tn_ray, axis=0, keepdims=True)
        cids = jax.lax.broadcasted_iota(
            jnp.int32, (TRI_CHUNK, RAY_TILE), 0
        ) + j * TRI_CHUNK
        cbr = jnp.min(
            jnp.where(tn_ray == tbr, cids, jnp.int32(0x7FFFFFFF)),
            axis=0, keepdims=True,
        ).astype(jnp.float32)
        tbest8.append(tbr)
        cbest8.append(cbr)
    tb = jnp.concatenate(tbest8, axis=0)      # (8, 128)
    cb = jnp.concatenate(cbest8, axis=0)

    @pl.when(j == 0)
    def _():
        tbest_ref[0] = tb
        cbest_ref[0] = cb

    @pl.when(j > 0)
    def _():
        closer = tb < tbest_ref[0]
        tbest_ref[0] = jnp.where(closer, tb, tbest_ref[0])
        cbest_ref[0] = jnp.where(closer, cb, cbest_ref[0])


def _prepass_probe(cluster_min, cluster_max, o, d, t_min):
    """c_best (B,) f32 only — the sort key probe (see _kernel_prepass_probe)."""
    b = o.shape[0]
    c = cluster_min.shape[0]
    tiles = b // RAYS_PER_TILE
    rows = b // RAY_TILE
    cpad = ((c + RAY_TILE - 1) // RAY_TILE) * RAY_TILE
    safe_d = jnp.where(jnp.abs(d) > 1e-8, d, 1e-8)
    inv_d = 1.0 / safe_d
    cb = jnp.concatenate(
        [
            jnp.pad(cluster_min.T, ((0, 0), (0, cpad - c)),
                    constant_values=jnp.inf),
            jnp.pad(cluster_max.T, ((0, 0), (0, cpad - c)),
                    constant_values=jnp.inf),
            jnp.zeros((2, cpad), jnp.float32),
        ]
    )
    ray_spec = pl.BlockSpec(
        (DMA_ROWS, RAY_TILE), lambda i, j: (i, 0),
        memory_space=pltpu.VMEM,
    )
    per_ray_spec = pl.BlockSpec(
        (1, DMA_ROWS, RAY_TILE), lambda i, j: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    per_ray_shape = jax.ShapeDtypeStruct(
        (tiles, DMA_ROWS, RAY_TILE), jnp.float32
    )
    _t_best, c_best = _pallas_call(
        _kernel_prepass_probe,
        grid=(tiles, cpad // TRI_CHUNK),
        in_specs=[
            pl.BlockSpec((8, TRI_CHUNK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM)
        ]
        + [ray_spec] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[per_ray_spec, per_ray_spec],
        out_shape=[per_ray_shape, per_ray_shape],
    )(
        cb,
        *_ray_comps(o, jnp.zeros_like(o), rows)[:3],
        *_ray_comps(inv_d, jnp.zeros_like(o), rows)[:3],
        jnp.stack([
            jnp.asarray(t_min, jnp.float32),
            jnp.asarray(float(c), jnp.float32),
        ]),
    )
    return c_best.reshape(b)


def _cluster_mask(cluster_min, cluster_max, o, d, t_min):
    """Per-1024-ray-tile cluster visibility mask (XLA pre-pass).

    Processed one ray tile at a time via lax.map so the (rays, C)
    intermediates stay small regardless of batch size.

    Returns (tiles, MROWS, 128) f32 where MROWS = ceil(C/128) rounded up
    to 8 (the kernel's mask block layout)."""
    b = o.shape[0]
    c = cluster_min.shape[0]
    tiles = b // RAYS_PER_TILE
    safe_d = jnp.where(jnp.abs(d) > 1e-8, d, 1e-8)
    inv_d = 1.0 / safe_d

    def one_tile(args):
        ot, it = args                                # (1024, 3) each
        t1 = (cluster_min[None] - ot[:, None]) * it[:, None]
        t2 = (cluster_max[None] - ot[:, None]) * it[:, None]
        tnear = jnp.max(jnp.minimum(t1, t2), axis=-1)
        tfar = jnp.min(jnp.maximum(t1, t2), axis=-1)
        hit = (tfar >= jnp.maximum(tnear, t_min)) & (tfar > 0.0)
        return jnp.any(hit, axis=0)                  # (C,)

    tile_hit = jax.lax.map(
        one_tile,
        (
            o.reshape(tiles, RAYS_PER_TILE, 3),
            inv_d.reshape(tiles, RAYS_PER_TILE, 3),
        ),
    )                                                # (tiles, C)
    cpad = ((c + RAY_TILE - 1) // RAY_TILE) * RAY_TILE
    mask = jnp.zeros((tiles, cpad), jnp.int32)
    mask = mask.at[:, :c].set(tile_hit.astype(jnp.int32))
    # (tiles, 1, cpad): the middle singleton makes the per-tile SMEM
    # block shape (1, 1, cpad) legal (last two dims == array dims)
    return mask[:, None, :]


def _kernel_culled(tri_ref, mask_ref, ox, oy, oz, dx, dy, dz, tmin_ref,
                   t_out, id_out):
    n_chunks = tri_ref.shape[1] // TRI_CHUNK
    t_min = tmin_ref[0]

    for r in range(ROWS_PER_STEP):
        rox, roy, roz = ox[r:r + 1, :], oy[r:r + 1, :], oz[r:r + 1, :]
        rdx, rdy, rdz = dx[r:r + 1, :], dy[r:r + 1, :], dz[r:r + 1, :]

        def chunk(c, carry):
            def active(carry):
                t_cur, id_cur = carry
                # (16, 128) lane-aligned slice, transposed on-chip to
                # triangles-on-sublanes for the broadcast math
                blk = jnp.transpose(
                    tri_ref[:, pl.ds(c * TRI_CHUNK, TRI_CHUNK)]
                )

                def col(k):
                    return blk[:, k][:, None]

                os_ = (
                    col(6) * rox + col(7) * roy + col(8) * roz - col(11)
                )
                ds_ = col(6) * rdx + col(7) * rdy + col(8) * rdz
                t = -os_ / ds_
                u = (
                    col(0) * rox + col(1) * roy + col(2) * roz - col(9)
                ) + t * (col(0) * rdx + col(1) * rdy + col(2) * rdz)
                v = (
                    col(3) * rox + col(4) * roy + col(5) * roz - col(10)
                ) + t * (col(3) * rdx + col(4) * rdy + col(5) * rdz)
                ok = (
                    (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                    & (t > 1e-8) & (t >= t_min)
                )
                tt = jnp.where(ok, t, jnp.inf)
                tmin_c = jnp.min(tt, axis=0, keepdims=True)
                ids = (
                    jax.lax.broadcasted_iota(jnp.int32, tt.shape, 0)
                    + c * TRI_CHUNK
                )
                idc = jnp.min(
                    jnp.where(tt == tmin_c, ids, _BIG_ID),
                    axis=0, keepdims=True,
                )
                better = tmin_c < t_cur
                return (
                    jnp.where(better, tmin_c, t_cur),
                    jnp.where(better, idc, id_cur),
                )

            # mask granularity is one 1024-ray tile (RAYS_PER_TILE);
            # each grid step spans ROWS_PER_STEP/DMA_ROWS such tiles, so
            # row r reads its own tile's mask (r // DMA_ROWS is static).
            m = mask_ref[r // DMA_ROWS, 0, c]
            return jax.lax.cond(m > 0, active, lambda cr: cr, carry)

        t0 = jnp.full((1, RAY_TILE), jnp.inf)
        i0 = jnp.full((1, RAY_TILE), -1, jnp.int32)
        t_fin, id_fin = jax.lax.fori_loop(0, n_chunks, chunk, (t0, i0))
        t_out[r:r + 1, :] = t_fin
        id_out[r:r + 1, :] = jnp.maximum(id_fin, 0)


@partial(jax.jit, static_argnames=())
def pallas_closest_tuv_culled(tri_pack, cluster_min, cluster_max, o, d,
                              t_min=1e-4):
    """(t, reordered-tri idx) closest hit with per-tile cluster culling."""
    (o, d), b0 = _pad_rays(o, d)
    b = o.shape[0]
    rows = b // RAY_TILE

    mask = _cluster_mask(cluster_min, cluster_max, o, d, t_min)

    ray_spec = _ray_spec()
    # Scalar mask lives in SMEM: per-cluster reads are scalar loads with
    # no vector-alignment constraints. Each grid step covers
    # ROWS_PER_STEP*RAY_TILE rays = ROWS_PER_STEP/DMA_ROWS mask tiles.
    tiles_per_step = ROWS_PER_STEP // DMA_ROWS
    mask_spec = pl.BlockSpec(
        (tiles_per_step, 1, mask.shape[2]), lambda i: (i, 0, 0),
        memory_space=pltpu.SMEM,
    )
    t, idx = _pallas_call(
        _kernel_culled,
        grid=(rows // ROWS_PER_STEP,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=14 * 1024 * 1024,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            mask_spec,
        ]
        + [ray_spec] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, RAY_TILE), jnp.float32),
            jax.ShapeDtypeStruct((rows, RAY_TILE), jnp.int32),
        ],
    )(
        tri_pack, mask, *_ray_comps(o, d, rows),
        jnp.full((1,), t_min, jnp.float32),
    )
    return t.reshape(b)[:b0], idx.reshape(b)[:b0]




def _kernel_prepass(cb_ref, ox, oy, oz, ix, iy, iz, scal_ref, out_ref,
                    texit_ref, tbest_ref, cbest_ref):
    """Per-tile cluster visibility pre-pass at register speed.

    One grid step = (1024-ray tile i) x (128-cluster block j): clusters
    ride the sublanes, rays the lanes, so each lane-row's slab test is a
    dense (128, 128) VPU op. The 52M ray/cluster pairs per bounce of the
    101k-tri scene cost ~1 ms here vs 25-32 ms for the XLA lax.map
    formulation (HBM-bound on its own temporaries).

    Layout notes (measured, not guessed): the chunk loop must live in
    the GRID, not a fori_loop with dynamic cb/out slices — the
    dynamic-slice variant ran 28 ms. The output is (tiles, cpad, 16)
    with per-step block (1, 128, 16): per-cluster row-hit flags go in
    lanes 0..7 and the tile-min entry distance in lanes 8..15, which
    keeps every write in the native (cluster-sublane) layout — writing
    a (ROWS, cpad) output instead would need a (128, 8) -> (8, 128)
    transpose per step.

    The second output is each ray's TIGHT interest bound: the max slab
    exit distance over the clusters it actually touches (accumulated
    across cluster blocks j). Any triangle hit lies inside some touched
    cluster at t <= its tfar, so no hit can exist beyond this bound; a
    ray that touches nothing gets t_min and stops holding its lane-row
    open immediately. This is what makes the front-to-back early-out
    fire: the old union-scene-AABB exit left visited == scheduled on
    the 101k-tri scene (miss rays kept every row open to the end).
    """
    t_min = scal_ref[0]
    n_real = scal_ref[1]
    j = pl.program_id(1)
    blk = jnp.transpose(cb_ref[...])          # (128 clusters, 8)
    # padded clusters carry all-inf AABBs that still pass the slab test
    # for rays positive on every axis — mask them out of the exit bound
    cvalid = (
        jax.lax.broadcasted_iota(jnp.int32, (TRI_CHUNK, 1), 0)
        + j * TRI_CHUNK
    ).astype(jnp.float32) < n_real            # (128, 1)

    def col(k):
        return blk[:, k][:, None]             # (128, 1)

    hits8 = []
    exits8 = []
    tbest8 = []
    cbest8 = []
    tn_min = jnp.full((TRI_CHUNK, 1), jnp.inf, jnp.float32)
    for r in range(DMA_ROWS):
        ro = (ox[r:r+1, :], oy[r:r+1, :], oz[r:r+1, :])
        ri = (ix[r:r+1, :], iy[r:r+1, :], iz[r:r+1, :])
        tn = jnp.full((TRI_CHUNK, RAY_TILE), t_min, jnp.float32)
        tf = jnp.full((TRI_CHUNK, RAY_TILE), jnp.inf, jnp.float32)
        for ax in range(3):
            lo = (col(ax) - ro[ax]) * ri[ax]
            hi = (col(ax + 3) - ro[ax]) * ri[ax]
            tn = jnp.maximum(tn, jnp.minimum(lo, hi))
            tf = jnp.minimum(tf, jnp.maximum(lo, hi))
        hit = (tf >= tn) & (tf > 0.0)         # (clusters, rays)
        hits8.append(
            jnp.max(hit.astype(jnp.float32), axis=1, keepdims=True)
        )                                     # (128, 1) row-any
        exits8.append(
            jnp.max(
                jnp.where(hit & cvalid, tf, -jnp.inf),
                axis=0, keepdims=True,
            )
        )                                     # (1, 128) per-ray
        # per-ray NEAREST touched cluster (entry distance + id): the
        # cluster-coherence sort key (see pallas_closest_tuv_dma).
        tn_ray = jnp.where(hit & cvalid, tn, jnp.inf)
        tbr = jnp.min(tn_ray, axis=0, keepdims=True)          # (1, 128)
        cids = jax.lax.broadcasted_iota(
            jnp.int32, (TRI_CHUNK, RAY_TILE), 0
        ) + j * TRI_CHUNK
        cbr = jnp.min(
            jnp.where(tn_ray == tbr, cids, jnp.int32(0x7FFFFFFF)),
            axis=0, keepdims=True,
        ).astype(jnp.float32)                                 # (1, 128)
        tbest8.append(tbr)
        cbest8.append(cbr)
        tn_min = jnp.minimum(
            tn_min,
            jnp.min(jnp.where(hit, tn, jnp.inf), axis=1, keepdims=True),
        )
    out_ref[0] = jnp.concatenate(
        hits8 + [jnp.broadcast_to(tn_min, (TRI_CHUNK, DMA_ROWS))], axis=1
    )                                         # (128, 16)
    ex = jnp.concatenate(exits8, axis=0)      # (8, 128)
    tb = jnp.concatenate(tbest8, axis=0)      # (8, 128)
    cb = jnp.concatenate(cbest8, axis=0)      # (8, 128)

    @pl.when(j == 0)
    def _():
        texit_ref[0] = jnp.maximum(ex, t_min)
        tbest_ref[0] = tb
        cbest_ref[0] = cb

    @pl.when(j > 0)
    def _():
        texit_ref[0] = jnp.maximum(texit_ref[0], ex)
        closer = tb < tbest_ref[0]
        tbest_ref[0] = jnp.where(closer, tb, tbest_ref[0])
        cbest_ref[0] = jnp.where(closer, cb, cbest_ref[0])


def _prepass(cluster_min, cluster_max, o, d, t_min):
    """Run the register-speed cluster visibility pre-pass.

    Returns (pre (tiles, Cpad, 16), t_exit (B,), c_best (B,) f32,
    n_clusters, Cpad). pre carries per-(tile, cluster) row-hit flags +
    tile-min entry distance; t_exit / c_best are per-ray (see
    _kernel_prepass)."""
    b = o.shape[0]
    c = cluster_min.shape[0]
    if c > _MAX_CLUSTERS:
        raise ValueError(
            f"{c} clusters exceeds the packed-key cap {_MAX_CLUSTERS} "
            f"({_MAX_CLUSTERS * TRI_CHUNK} triangles)"
        )
    tiles = b // RAYS_PER_TILE
    rows = b // RAY_TILE
    cpad = ((c + RAY_TILE - 1) // RAY_TILE) * RAY_TILE
    safe_d = jnp.where(jnp.abs(d) > 1e-8, d, 1e-8)
    inv_d = 1.0 / safe_d
    # padded clusters get a degenerate AABB at +inf; rays positive on
    # every axis still "hit" it (inf >= inf) — masked off by callers
    cb = jnp.concatenate(
        [
            jnp.pad(cluster_min.T, ((0, 0), (0, cpad - c)),
                    constant_values=jnp.inf),
            jnp.pad(cluster_max.T, ((0, 0), (0, cpad - c)),
                    constant_values=jnp.inf),
            jnp.zeros((2, cpad), jnp.float32),
        ]
    )                                         # (8, Cpad)

    ray_spec = pl.BlockSpec(
        (DMA_ROWS, RAY_TILE), lambda i, j: (i, 0),
        memory_space=pltpu.VMEM,
    )
    per_ray_spec = pl.BlockSpec(
        (1, DMA_ROWS, RAY_TILE), lambda i, j: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    per_ray_shape = jax.ShapeDtypeStruct(
        (tiles, DMA_ROWS, RAY_TILE), jnp.float32
    )
    pre, t_exit, _t_best, c_best = _pallas_call(
        _kernel_prepass,
        grid=(tiles, cpad // TRI_CHUNK),
        in_specs=[
            pl.BlockSpec((8, TRI_CHUNK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM)
        ]
        + [ray_spec] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[
            pl.BlockSpec(
                (1, TRI_CHUNK, 2 * DMA_ROWS), lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            per_ray_spec,
            per_ray_spec,
            per_ray_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tiles, cpad, 2 * DMA_ROWS), jnp.float32),
            per_ray_shape,
            per_ray_shape,
            per_ray_shape,
        ],
    )(
        cb,
        *_ray_comps(o, jnp.zeros_like(o), rows)[:3],
        *_ray_comps(inv_d, jnp.zeros_like(o), rows)[:3],
        jnp.stack([
            jnp.asarray(t_min, jnp.float32),
            jnp.asarray(float(c), jnp.float32),
        ]),
    )
    return pre, t_exit.reshape(b), c_best.reshape(b), c, cpad



def _cluster_list(cluster_min, cluster_max, o, d, t_min):
    """Active-cluster schedule per ray tile, ordered FRONT-TO-BACK.

    Returns (count (tiles,), keys (tiles, Cpad), lostep (tiles, 2),
    t_exit (B,)):
      * keys packs (inactive, quantized tnear bucket, per-row hit bits,
        cluster id) — see layout above — sorted so active clusters come
        first, nearest (by the tile's minimum ray entry distance) first;
      * lostep[t] = (lo, step) dequantizes a bucket to a SAFE lower
        bound on the entry distance: bound = lo + bucket*step <= tnear
        (verified exactly below), ascending along the sorted schedule —
        once every ray of a row holds a hit closer than the bound, no
        later cluster can improve that row;
      * t_exit[i] is ray i's max slab-exit over the clusters it
        touches — every possible hit lies before it, so
        min(best_t, t_exit) bounds the ray's remaining interest even
        when it has no hit yet (this is what lets rows containing miss
        rays converge; rays that touch nothing close immediately);
      * c_best[i] is ray i's NEAREST touched cluster id (by entry
        distance; 2^31-1 if it touches nothing) — the coherence key
        for the ray sort in pallas_closest_tuv_dma."""
    pre, t_exit, c_best, c, cpad = _prepass(
        cluster_min, cluster_max, o, d, t_min
    )
    b = o.shape[0]
    tiles = b // RAYS_PER_TILE
    row_hit = pre[:, :, :DMA_ROWS] > 0.0   # (tiles, Cpad, ROWS)
    tn = pre[:, :, DMA_ROWS]               # (tiles, Cpad)

    shifts = jnp.int32(1) << jnp.arange(DMA_ROWS, dtype=jnp.int32)
    bits = jnp.sum(
        row_hit.astype(jnp.int32) * shifts[None, None, :], axis=2
    )                                        # (tiles, Cpad)
    # the all-inf padded AABBs still pass the slab test for rays whose
    # direction is positive on every axis (inf >= inf) — mask them off
    bits = jnp.where(jnp.arange(cpad)[None, :] < c, bits, 0)
    active = bits > 0
    count = jnp.sum(active, axis=1).astype(jnp.int32)

    # Quantize tnear to _BUCKETS per-tile linear buckets; fix the bucket
    # down where float rounding would push its edge above tnear (the
    # edge must stay a LOWER bound for the early-out to be safe).
    tn_act = jnp.where(active, tn, jnp.inf)
    lo = jnp.min(tn_act, axis=1)                     # (tiles,)
    hi = jnp.max(jnp.where(active, tn, -jnp.inf), axis=1)
    lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
    hi = jnp.where(jnp.isfinite(hi), hi, 0.0)
    step = jnp.maximum((hi - lo) / (_BUCKETS - 1), 1e-30)
    bucket = jnp.clip(
        ((tn - lo[:, None]) / step[:, None]).astype(jnp.int32),
        0, _BUCKETS - 1,
    )
    edge = lo[:, None] + bucket.astype(jnp.float32) * step[:, None]
    bucket = jnp.where((edge > tn) & (bucket > 0), bucket - 1, bucket)
    bucket = jnp.where(active, bucket, 0)

    iota = jnp.broadcast_to(
        jnp.arange(cpad, dtype=jnp.int32)[None, :], (tiles, cpad)
    )
    keys = (
        jnp.where(active, 0, jnp.int32(1) << 30)
        | (bucket << _BUCKET_SHIFT)
        | (bits << _BITS_SHIFT)
        | iota
    )
    # NOT sorted here: XLA's comparator sort measured 24 ms/bounce for
    # (64, 896) i32; the DMA kernel counting-sorts the active keys by
    # distance bin on its scalar core instead (~us per tile).
    lostep = jnp.stack([lo, step], axis=1)           # (tiles, 2)
    return count, keys, lostep, t_exit, c_best.reshape(b)


_EARLY_BLOCK = 8   # clusters between early-out refreshes (amortizes the
                   # cross-lane row-max reductions to ~2 ops / 8 clusters)
_SORT_BINS = 256   # counting-sort distance bins (the bucket bits above
                   # _BIN_SUB_BITS; only active keys — bit 30 clear —
                   # enter the histogram); the early-out bound uses the
                   # BIN lower edge, which every later schedule entry
                   # is >= of
_BIN_SUB_BITS = 2  # bucket bits below the bin granularity


def _kernel_culled_dma(count_ref, key_ref, lostep_ref, tri_hbm,
                       ox, oy, oz, dx, dy, dz, texit, tmin_ref,
                       t_out, id_out, stats_out,
                       sched, hist, scratch, sem):
    n_active = count_ref[0, 0, 0]
    t_min = tmin_ref[0]
    lo = lostep_ref[0, 0, 0]
    step = lostep_ref[0, 0, 1]
    cpad = key_ref.shape[2]
    bin_shift = _BUCKET_SHIFT + _BIN_SUB_BITS

    # Counting sort of the active cluster keys by distance bin, on the
    # scalar core into SMEM scratch — the vector units never stall on
    # it and it replaces a 24 ms XLA sort.
    def zero(i, carry):
        hist[i] = 0
        return carry

    jax.lax.fori_loop(0, _SORT_BINS, zero, 0)

    def cnt(i, carry):
        k = key_ref[0, 0, i]

        @pl.when(k < (1 << 30))
        def _():
            b = (k >> bin_shift) & (_SORT_BINS - 1)
            hist[b] = hist[b] + 1

        return carry

    jax.lax.fori_loop(0, cpad, cnt, 0)

    def pfx(i, acc):
        n = hist[i]
        hist[i] = acc
        return acc + n

    jax.lax.fori_loop(0, _SORT_BINS, pfx, 0)

    def place(i, carry):
        k = key_ref[0, 0, i]

        @pl.when(k < (1 << 30))
        def _():
            b = (k >> bin_shift) & (_SORT_BINS - 1)
            p = hist[b]
            sched[p] = k
            hist[b] = p + 1

        return carry

    jax.lax.fori_loop(0, cpad, place, 0)

    def get_dma(slot, k):
        cid = sched[k] & (_MAX_CLUSTERS - 1)
        return pltpu.make_async_copy(
            tri_hbm.at[:, pl.ds(cid * TRI_CHUNK, TRI_CHUNK)],
            scratch.at[slot],
            sem.at[slot],
        )

    @pl.when(n_active > 0)
    def _():
        get_dma(0, 0).start()

    row_weights = jnp.float32(2) ** jax.lax.broadcasted_iota(
        jnp.int32, (DMA_ROWS, 1), 0
    ).astype(jnp.float32)                         # (8, 1): 1, 2, ... 128

    def sched_rbits(k):
        return (sched[k] >> _BITS_SHIFT) & ((1 << DMA_ROWS) - 1)

    def body(k, carry):
        # started: whether cluster k's DMA was actually issued — once
        # every row a cluster touches has closed (open_bits is
        # monotone-shrinking), its 8KB stream AND the ~1us wait are
        # skipped, not just the row compute. The skip decision at issue
        # time uses an older (superset) open_bits, so a skipped cluster
        # provably has eff == 0 when its turn comes.
        t_cur, id_cur, open_bits, started = carry
        slot = jax.lax.rem(k, 2)

        nxt = jnp.minimum(k + 1, cpad - 1)
        start_next = (k + 1 < n_active) & (
            (sched_rbits(nxt) & open_bits) != 0
        )

        @pl.when(start_next)
        def _():
            get_dma(jax.lax.rem(k + 1, 2), nxt).start()

        @pl.when(started != 0)
        def _():
            get_dma(slot, k).wait()
        key = sched[k]
        cid = key & (_MAX_CLUSTERS - 1)
        rbits = jnp.where(
            started != 0, (key >> _BITS_SHIFT) & ((1 << DMA_ROWS) - 1), 0
        )

        # Front-to-back early-out, refreshed every _EARLY_BLOCK clusters:
        # the schedule is sorted by (quantized) tile-min ray entry
        # distance, so `bound` lower-bounds every hit in clusters k.. .
        # A row whose rays ALL hold hits closer than that is finished;
        # its bit in open_bits clears (rays without hits carry t = inf
        # and keep their row open). Bits refresh with ONE row-max vector
        # reduce + ONE weighted full-sum instead of per-cluster scalar
        # reductions.
        def refresh(_):
            # BIN lower edge, not the exact bucket edge: the schedule is
            # only bin-ordered, so this is the largest bound that lower-
            # bounds every remaining entry
            bucket = (key >> _BUCKET_SHIFT) & (
                (_BUCKETS - 1) ^ ((1 << _BIN_SUB_BITS) - 1)
            )
            bound = lo + bucket.astype(jnp.float32) * step
            # a ray's remaining interest is its best hit so far OR its
            # scene-AABB exit, whichever is closer — miss rays (t=inf)
            # therefore stop holding their row open once the schedule
            # passes their exit point
            row_max = jnp.max(
                jnp.minimum(t_cur, texit[...]), axis=1, keepdims=True
            )                                                 # (8, 1)
            open_f = jnp.where(row_max >= bound, row_weights, 0.0)
            return jnp.sum(open_f).astype(jnp.int32)

        open_bits = jax.lax.cond(
            jax.lax.rem(k, _EARLY_BLOCK) == 0,
            refresh, lambda ob: ob, open_bits,
        )
        eff = rbits & open_bits

        def cluster_compute(carry):
            t_cur, id_cur = carry
            blk = jnp.transpose(scratch[slot])    # (16,128) -> (128,16)

            def col(kk):
                return blk[:, kk][:, None]        # (128, 1)

            def one_row(r, carry, conditioned):
                def row_compute(carry):
                    t_cur, id_cur = carry
                    rox, roy, roz = (
                        ox[r:r+1, :], oy[r:r+1, :], oz[r:r+1, :]
                    )
                    rdx, rdy, rdz = (
                        dx[r:r+1, :], dy[r:r+1, :], dz[r:r+1, :]
                    )
                    os_ = (
                        col(6) * rox + col(7) * roy + col(8) * roz
                        - col(11)
                    )
                    ds_ = col(6) * rdx + col(7) * rdy + col(8) * rdz
                    t = -os_ / ds_
                    u = (
                        col(0) * rox + col(1) * roy + col(2) * roz
                        - col(9)
                    ) + t * (col(0) * rdx + col(1) * rdy + col(2) * rdz)
                    v = (
                        col(3) * rox + col(4) * roy + col(5) * roz
                        - col(10)
                    ) + t * (col(3) * rdx + col(4) * rdy + col(5) * rdz)
                    ok = (
                        (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                        & (t > 1e-8) & (t >= t_min)
                    )
                    tt = jnp.where(ok, t, jnp.inf)
                    tmin_c = jnp.min(tt, axis=0, keepdims=True)
                    ids = (
                        jax.lax.broadcasted_iota(jnp.int32, tt.shape, 0)
                        + cid * TRI_CHUNK
                    )
                    idc = jnp.min(
                        jnp.where(tt == tmin_c, ids, _BIG_ID),
                        axis=0, keepdims=True,
                    )
                    # In-kernel row update without scatter (unsupported
                    # in Mosaic): static row mask + where. Tie-break on
                    # the lower reordered id so the result is invariant
                    # to the (t-sorted) cluster visit order.
                    row_t = t_cur[r:r+1, :]
                    row_id = id_cur[r:r+1, :]
                    better = (tmin_c < row_t) | (
                        (tmin_c == row_t) & (idc < row_id)
                    )                                 # (1, 128)
                    rowmask = (
                        jax.lax.broadcasted_iota(
                            jnp.int32, (DMA_ROWS, RAY_TILE), 0
                        )
                        == r
                    )
                    upd = rowmask & better            # (DMA_ROWS, 128)
                    return (
                        jnp.where(upd, tmin_c, t_cur),
                        jnp.where(upd, idc, id_cur),
                    )

                if not conditioned:
                    return row_compute(carry)
                # Per-row cull: skip rows whose pre-pass bit is clear
                # or that converged in front of this cluster.
                return jax.lax.cond(
                    ((eff >> r) & 1) > 0, row_compute, lambda c: c,
                    carry,
                )

            def all_rows(carry):
                # fast path: every row live — no per-row branches
                for r in range(DMA_ROWS):
                    carry = one_row(r, carry, conditioned=False)
                return carry

            def some_rows(carry):
                for r in range(DMA_ROWS):
                    carry = one_row(r, carry, conditioned=True)
                return carry

            full_mask = jnp.int32((1 << DMA_ROWS) - 1)
            return jax.lax.cond(
                eff == full_mask, all_rows, some_rows,
                (t_cur, id_cur),
            )

        t_cur, id_cur = jax.lax.cond(
            eff > 0, cluster_compute, lambda c: c, (t_cur, id_cur)
        )
        return k + 1, t_cur, id_cur, open_bits, start_next.astype(
            jnp.int32
        )

    t0 = jnp.full((DMA_ROWS, RAY_TILE), jnp.inf)
    i0 = jnp.full((DMA_ROWS, RAY_TILE), -1, jnp.int32)

    # while (not fori): when every row has closed, STOP — no more DMA
    # waits, no more schedule walking. On coherent primary tiles this
    # terminates after a small front-to-back prefix of the schedule.
    def cond(carry):
        k, _, _, open_bits, _ = carry
        return (k < n_active) & (open_bits != 0)

    k_fin, t_fin, id_fin, _, fin_started = jax.lax.while_loop(
        cond, lambda c: body(c[0], c[1:]),
        (jnp.int32(0), t0, i0, jnp.int32((1 << DMA_ROWS) - 1),
         (n_active > 0).astype(jnp.int32)),
    )
    # a prefetch for cluster k_fin may still be in flight on early exit;
    # retire it before the kernel ends (only if it was actually issued)
    @pl.when((k_fin > 0) & (k_fin < n_active) & (fin_started != 0))
    def _():
        get_dma(jax.lax.rem(k_fin, 2), k_fin).wait()

    stats_out[0, 0, 0] = k_fin
    t_out[...] = t_fin
    id_out[...] = jnp.maximum(id_fin, 0)


@partial(jax.jit, static_argnames=("return_stats", "sort_rays"))
def pallas_closest_tuv_dma(tri_pack, cluster_min, cluster_max, o, d,
                           t_min=1e-4, return_stats=False,
                           sort_rays=False):
    """(t, reordered tri idx) closest hit; triangles stream from HBM.
    Works for arbitrary scene sizes and batch sizes. With
    return_stats=True also returns (visited, scheduled) cluster counts
    per ray tile (early-out diagnostics).

    sort_rays=True re-orders the batch by (direction octant, nearest
    touched cluster) before tiling. Incoherent bounce batches otherwise
    pay the kernel's 128-ray-row granularity: a row's cluster UNION was
    measured 12x its per-ray mean (45.2 vs 3.6 on the 101k-tri scene),
    and the per-tile schedule the kernel walks SERIALLY is the 8-row
    union of that. Key order matters and is measured, not guessed:
    direction-MAJOR ordering cut the bounce kernel 21.6 -> 14.2 ms
    while cluster-major was net-slower (23.7 ms) despite similar union
    stats — the front-to-back early-out only fires when a row's rays
    agree on travel direction. Per-ray results are order-invariant
    (deterministic tie-breaks), so outputs are un-permuted and bitwise
    identical to sort_rays=False; only (o, d) are permuted and only
    (t, id) travel back — the prior integrator-level sort permuted all
    13 wavefront state arrays and lost its kernel savings to gather
    traffic.

    Known caveat (exact cross-cluster ties): within a cluster the winner
    at bitwise-equal t is the min reordered id, which is order-invariant;
    ACROSS clusters the winner follows the serial schedule order, whose
    distance-bin quantization (per-tile lo/step) depends on the tile's
    ray composition. A ray hitting two triangles in DIFFERENT clusters at
    bitwise-equal t (e.g. a shared edge of coplanar prims split across
    clusters) can therefore report either id depending on sort_rays.
    t itself is always identical; only the reported id can differ, and
    only on exact-tie geometry."""
    (o, d), b0 = _pad_rays(o, d)
    b = o.shape[0]
    rows = b // RAY_TILE
    tiles = b // RAYS_PER_TILE

    if sort_rays:
        c_probe = _prepass_probe(
            cluster_min, cluster_max, o, d, t_min
        )
        octant = (
            (d[:, 0] > 0).astype(jnp.int32)
            + 2 * (d[:, 1] > 0).astype(jnp.int32)
            + 4 * (d[:, 2] > 0).astype(jnp.int32)
        )
        touches = c_probe < jnp.float32(2**30)
        key = jnp.where(
            touches,
            (octant << _ID_BITS) | c_probe.astype(jnp.int32),
            jnp.int32(0x7FFFFFFF),
        )
        perm = jnp.argsort(key)
        # inverse permutation via scatter, NOT a second 3.8 ms argsort
        inv = jnp.zeros_like(perm).at[perm].set(
            jnp.arange(b, dtype=perm.dtype)
        )
        o, d = o[perm], d[perm]

    count, keys, lostep, t_exit, _ = _cluster_list(
        cluster_min, cluster_max, o, d, t_min
    )

    ray_spec = pl.BlockSpec(
        (DMA_ROWS, RAY_TILE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    t, idx, stats = _pallas_call(
        _kernel_culled_dma,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, keys.shape[1]), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # tri_pack in HBM
        ]
        + [ray_spec] * 7
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[
            ray_spec,
            ray_spec,
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, RAY_TILE), jnp.float32),
            jax.ShapeDtypeStruct((rows, RAY_TILE), jnp.int32),
            # clusters actually visited before every row closed
            jax.ShapeDtypeStruct((tiles, 1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((keys.shape[1],), jnp.int32),
            pltpu.SMEM((_SORT_BINS,), jnp.int32),
            pltpu.VMEM((2, 16, TRI_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(
        count.reshape(tiles, 1, 1),
        keys[:, None, :],
        lostep[:, None, :],
        tri_pack,
        *_ray_comps(o, d, rows),
        t_exit.reshape(rows, RAY_TILE),
        jnp.full((1,), t_min, jnp.float32),
    )
    t, idx = t.reshape(b), idx.reshape(b)
    if sort_rays:
        t, idx = t[inv], idx[inv]
    if return_stats:
        return t[:b0], idx[:b0], stats.reshape(tiles), count
    return t[:b0], idx[:b0]
