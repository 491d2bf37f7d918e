"""Attr-row gather microbench: why does (B,)->(B,16) cost 0.44-0.56 ms?

The per-bounce shading fetch at 2M-triangle scale
(CulledScene.closest_hit, fusion.168 in trace_profile stress2m) is a
(16384,) -> (16384, 16) row gather from a 2,100,224-row f32 table —
0.56 ms/call on device, ~500x its 1 MB of useful traffic. The round-2
measurement (CLAUDE.md) says small-table row gathers cost ~0.1 ms at
B=64k REGARDLESS of width, so the suspect is the big table's memory
layout: XLA lays the (tpad, 16) table out column-major ({0,1} in the
trace), so each logical row is 16 strided 4-byte touches 8.4 MB apart
— 262k scattered words instead of 16k contiguous 64-byte lines.

Variants measured here (all bit-identical outputs):
  flat     jnp.take(table, ids, axis=0)              — today's form
  tiled8   table pre-tiled (tpad/8, 16, 8); fetch the (16, 8) brick
           holding the row (one contiguous 512 B slice per id), then
           select the row with an in-register one-hot blend over 8
  tiled128 same with (tpad/128, 16, 128) cluster bricks (8 KB per id)
           — upper bound on the brick-size tradeoff
  sorted   flat gather with per-128-lane-row pre-sorted ids (bounds
           how much id coherence alone buys the flat form)

Timing: pipelined (issue N, block once), fresh-process dispatch rules
(CLAUDE.md tunnel notes) — run standalone, one scene size per line.

CAVEAT (round-5 lesson, sched_sort_probe): through the axon tunnel,
async-mode block_until_ready can return before execution finishes, so
these wall numbers are only trustworthy as RATIOS between variants of
the same shape class, and only after an in-program device trace
confirms the winner. That confirmation exists: trace_profile stress2m
measured the production fetch at 0.56 (flat row gather) -> 0.35
((N,16,8) brick) -> 0.20 ms/call ((N,128) brick, shipped).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2100224)
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    rows, b = args.rows, args.batch
    rng = np.random.default_rng(0)
    table_np = rng.standard_normal((rows, 16), np.float32)
    ids_np = rng.integers(0, rows, size=(b,), dtype=np.int32)

    table = jnp.asarray(table_np)
    t8 = jnp.asarray(
        np.ascontiguousarray(table_np.reshape(rows // 8, 8, 16)
                             .transpose(0, 2, 1))
    )                                               # (rows/8, 16, 8)
    t128 = jnp.asarray(
        np.ascontiguousarray(table_np.reshape(rows // 128, 128, 16)
                             .transpose(0, 2, 1))
    )                                               # (rows/128, 16, 128)
    ids = jnp.asarray(ids_np)
    ids_sorted = jnp.asarray(
        np.sort(ids_np.reshape(-1, 128), axis=1).reshape(-1)
    )

    @jax.jit
    def flat(tb, ix):
        return jnp.take(tb, ix, axis=0)

    @jax.jit
    def tiled8(tb, ix):
        brick = jnp.take(tb, ix >> 3, axis=0)       # (B, 16, 8)
        oh = (ix[:, None] & 7) == jnp.arange(8)[None, :]
        return jnp.sum(brick * oh[:, None, :].astype(jnp.float32),
                       axis=-1)

    @jax.jit
    def tiled128(tb, ix):
        brick = jnp.take(tb, ix >> 7, axis=0)       # (B, 16, 128)
        oh = (ix[:, None] & 127) == jnp.arange(128)[None, :]
        return jnp.sum(brick * oh[:, None, :].astype(jnp.float32),
                       axis=-1)

    def bench(fn, tb, ix):
        # NO device->host fetch before or during timing: the first d2h
        # permanently flips the axon tunnel to sync mode (~0.5 ms per
        # dispatch even pipelined — CLAUDE.md); correctness asserts run
        # AFTER all timed windows.
        r = fn(tb, ix)
        r.block_until_ready()               # compile + warm
        t0 = time.perf_counter()
        outs = [fn(tb, ix) for _ in range(args.iters)]
        outs[-1].block_until_ready()
        return (time.perf_counter() - t0) / args.iters * 1e3

    res = {
        "rows": rows, "batch": b, "iters": args.iters,
        "flat_ms": round(bench(flat, table, ids), 4),
        "tiled8_ms": round(bench(tiled8, t8, ids), 4),
        "tiled128_ms": round(bench(tiled128, t128, ids), 4),
        "flat_sorted_ms": round(bench(flat, table, ids_sorted), 4),
    }

    ref = np.asarray(flat(table, ids))
    np.testing.assert_array_equal(np.asarray(tiled8(t8, ids)), ref)
    np.testing.assert_array_equal(np.asarray(tiled128(t128, ids)), ref)
    with open(os.path.join(HERE, "attr_gather_probe_result.json"),
              "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
