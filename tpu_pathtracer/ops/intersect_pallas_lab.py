"""Flag-disabled kernel experiments (measured washes, kept testable).

The SUPERCLUSTER walk (round 4): one schedule entry = _SC consecutive
clusters = one contiguous (16, _SC*128) triangle DMA, members popping
from an active bitmap. Measured a WASH end-to-end on the 2.1M scene
(docs/RESULTS.md "Supercluster walk") so production keeps the per-
cluster schedule; the kernels stay compiled-out behind
intersect_pallas._SC_MIN_CLUSTERS (tests force it on by monkeypatching
that threshold — see tests/test_pallas_kernels.py::TestSupercluster).

Moved here from intersect_pallas.py (round-5 VERDICT item 9) verbatim
apart from routing the _SKIP_* probe flags through the hot module; no
behavior change.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import intersect_pallas as ip
from .intersect_pallas import (
    GROUP,
    GROUPS_PER_TILE,
    RAYS_PER_TILE,
    RAY_TILE,
    TRI_CHUNK,
    _BIG_ID,
    _DMA_RING,
    _GMAX_CLUSTERS,
    _SC,
    _log2_onehot,
    _sched_stream,
)

def _kernel_grouped_dma_sc(count_ref, lostep_ref, tmin_ref,
                           sched_hbm, comp_hbm, tri_hbm,
                           out_ref,
                           scratch, sem, tcand, icand,
                           smem_ring, smem_sem,
                           comp_ring, comp_sem, bcast):
    """Supercluster walk: one schedule entry = _SC consecutive clusters
    = one contiguous (16, _SC*128) tri DMA. Active members pop from a
    per-entry bitmap (schedule row 33) and reuse the per-cluster pair
    machinery on a 128-lane slice of the fetched pack. Amortizes the
    per-visit overhead (DMA management + schedule reads — 55% of the
    2m walk, benchmarks/walk_cost_probe.py) over 8 clusters."""
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

    if not ip._SKIP_EXPAND:
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
    t_cut = jnp.maximum(jnp.float32(1.000000082740371e-08), t_min)
    cpad = sched_hbm.shape[2]

    def get_dma(slot, k):
        scid = sched_at(k) & (_GMAX_CLUSTERS - 1)
        return pltpu.make_async_copy(
            tri_hbm.at[:, pl.ds(scid * (_SC * TRI_CHUNK),
                                _SC * TRI_CHUNK)],
            scratch.at[slot],
            sem.at[slot],
        )

    def prime(k, carry):
        @pl.when(k < n_active)
        def _():
            get_dma(jax.lax.rem(k, _DMA_RING), k).start()

        return carry

    jax.lax.fori_loop(0, _DMA_RING - 1, prime, 0)

    if not ip._SKIP_FILLS:
        tcand[...] = jnp.full(
            (GROUP, GROUPS_PER_TILE * TRI_CHUNK), jnp.inf
        )
        icand[...] = jnp.full(
            (GROUP, GROUPS_PER_TILE * TRI_CHUNK), _BIG_ID, jnp.int32
        )

    lane_iota = jax.lax.broadcasted_iota(
        jnp.int32, (GROUP, RAY_TILE), 1
    )
    tri_iota = jax.lax.broadcasted_iota(
        jnp.int32, (GROUP, TRI_CHUNK), 1
    )

    def body(k, carry):
        advance(k, n_active)
        slot = jax.lax.rem(k, _DMA_RING)
        ahead = jnp.minimum(k + _DMA_RING - 1, cpad - 1)

        @pl.when(k + _DMA_RING - 1 < n_active)
        def _():
            get_dma(jax.lax.rem(ahead, _DMA_RING), ahead).start()

        get_dma(slot, k).wait()

        scid = sched_at(k) & (_GMAX_CLUSTERS - 1)

        def mem_body(mm):
            mb = mm & (-mm)
            m = _log2_onehot(mb)
            trb = scratch[slot, :, pl.ds(m * TRI_CHUNK, TRI_CHUNK)]
            (r0, r1, r2, r3, r4, r5, r6, r7, r8, r9, r10, r11) = [
                trb[kk:kk + 1, :] for kk in range(12)
            ]
            ids_lane = tri_iota + (scid * _SC + m) * TRI_CHUNK

            def process_group(g):
                s0 = g * GROUP

                def ext(c):
                    return bcast[
                        pl.ds(c * RAYS_PER_TILE + s0, GROUP), :
                    ]

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

            for w in range(4):
                def bit_body(gm):
                    lb1 = gm & (-gm)
                    gm1 = gm & (gm - 1)
                    lb2 = gm1 & (-gm1)
                    gm2 = gm1 & (gm1 - 1)
                    g1 = w * 32 + _log2_onehot(lb1)
                    g2 = jnp.where(lb2 != 0,
                                   w * 32 + _log2_onehot(lb2), g1)
                    process_group(g1)
                    process_group(g2)
                    return gm2

                jax.lax.while_loop(
                    lambda gm: gm != 0, bit_body,
                    mask_at(m * 4 + w, k),
                )
            return mm & (mm - 1)

        jax.lax.while_loop(lambda mm: mm != 0, mem_body,
                           mask_at(_SC * 4, k))
        return carry

    if not ip._SKIP_WALK:
        jax.lax.fori_loop(0, n_active, body, 0)

    tacc = jnp.full((GROUP, RAY_TILE), jnp.inf)
    iacc = jnp.zeros((GROUP, RAY_TILE), jnp.int32)
    for g in range(GROUPS_PER_TILE):
        tg = tcand[:, g * TRI_CHUNK:(g + 1) * TRI_CHUNK]
        ig = icand[:, g * TRI_CHUNK:(g + 1) * TRI_CHUNK]
        tw = jnp.min(tg, axis=1, keepdims=True)
        iw = jnp.min(
            jnp.where(tg == tw, ig, _BIG_ID), axis=1, keepdims=True
        )
        sel = lane_iota == g
        tacc = jnp.where(sel, tw, tacc)
        iacc = jnp.where(sel, iw, iacc)
    out_ref[0:GROUP, :] = tacc
    out_ref[GROUP:2 * GROUP, :] = jax.lax.bitcast_convert_type(
        jnp.where(jnp.isfinite(tacc), iacc, 0), jnp.float32
    )


def _kernel_grouped_anyhit_dma_sc(count_ref, sched_hbm, comp_hbm,
                                  tri_hbm, out_ref,
                                  scratch, sem, hcand,
                                  smem_ring, smem_sem,
                                  comp_ring, comp_sem, bcast):
    """Supercluster any-hit walk (see _kernel_grouped_dma_sc)."""
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
    cpad = sched_hbm.shape[2]

    def get_dma(slot, k):
        scid = sched_at(k) & (_GMAX_CLUSTERS - 1)
        return pltpu.make_async_copy(
            tri_hbm.at[:, pl.ds(scid * (_SC * TRI_CHUNK),
                                _SC * TRI_CHUNK)],
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

    def body(k, carry):
        advance(k, n_active)
        slot = jax.lax.rem(k, _DMA_RING)
        ahead = jnp.minimum(k + _DMA_RING - 1, cpad - 1)

        @pl.when(k + _DMA_RING - 1 < n_active)
        def _():
            get_dma(jax.lax.rem(ahead, _DMA_RING), ahead).start()

        get_dma(slot, k).wait()

        def mem_body(mm):
            mb = mm & (-mm)
            m = _log2_onehot(mb)
            trb = scratch[slot, :, pl.ds(m * TRI_CHUNK, TRI_CHUNK)]
            (r0, r1, r2, r3, r4, r5, r6, r7, r8, r9, r10, r11) = [
                trb[kk:kk + 1, :] for kk in range(12)
            ]
            prim_row = trb[12:13, :]

            def process_group(g):
                s0 = g * GROUP

                def ext(c):
                    return bcast[
                        pl.ds(c * RAYS_PER_TILE + s0, GROUP), :
                    ]

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
                def bit_body(gm):
                    lb1 = gm & (-gm)
                    gm1 = gm & (gm - 1)
                    lb2 = gm1 & (-gm1)
                    gm2 = gm1 & (gm1 - 1)
                    g1 = w * 32 + _log2_onehot(lb1)
                    g2 = jnp.where(lb2 != 0,
                                   w * 32 + _log2_onehot(lb2), g1)
                    process_group(g1)
                    process_group(g2)
                    return gm2

                jax.lax.while_loop(
                    lambda gm: gm != 0, bit_body,
                    mask_at(m * 4 + w, k),
                )
            return mm & (mm - 1)

        jax.lax.while_loop(lambda mm: mm != 0, mem_body,
                           mask_at(_SC * 4, k))
        return carry

    jax.lax.fori_loop(0, n_active, body, jnp.int32(-1))

    acc = jnp.zeros((GROUP, RAY_TILE), jnp.float32)
    for g in range(GROUPS_PER_TILE):
        hg = hcand[:, g * TRI_CHUNK:(g + 1) * TRI_CHUNK]
        hw = jnp.max(hg, axis=1, keepdims=True)
        acc = jnp.where(lane_iota == g, hw, acc)
    out_ref[...] = acc
