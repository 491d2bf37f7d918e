"""Schedule-sort microbench: operand-count and length scaling.

The per-bounce schedule build at 2M-triangle scale sorts
(keys, 4 group-mask words) — five (16, cpad) i32 operands, minor-dim —
at 0.44 ms/call (sort.99 in trace_profile stress2m, cpad=16512).
This probe measures how that cost scales with value-operand count and
entry count, to bound what restructuring could save:

  - fewer operands (if masks could ride differently)
  - supercluster-granular entries (cpad/8 entries, 33 operands --
    the sc design round 4 measured as a wash e2e)

Timing: pipelined wall in a fresh process (no d2h before the timed
windows — CLAUDE.md tunnel rules).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    tiles = 16

    def mk(n, k):
        key = jnp.asarray(
            rng.integers(0, 1 << 30, size=(tiles, n), dtype=np.int32)
        )
        vals = [
            jnp.asarray(
                rng.integers(-(1 << 31), 1 << 31, size=(tiles, n),
                             dtype=np.int64).astype(np.int32)
            )
            for _ in range(k)
        ]
        return (key, *vals)

    def bench(ops):
        f = jax.jit(lambda *xs: jax.lax.sort(
            xs, dimension=-1, num_keys=1, is_stable=False
        ))
        r = f(*ops)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        outs = [f(*ops) for _ in range(50)]
        jax.block_until_ready(outs[-1])
        return (time.perf_counter() - t0) / 50 * 1e3

    res = {}
    for n in (16512, 17408):
        for k in (0, 1, 2, 4, 8):
            res[f"n{n}_v{k}_ms"] = round(bench(mk(n, k)), 4)
    # supercluster-granular: 1/8 the entries, 33 rows (32 mask + key)
    res["n2176_v32_ms"] = round(bench(mk(2176, 32)), 4)

    # Device-trace truth (the wall numbers above are UNRELIABLE: the
    # axon tunnel's block_until_ready returns early — the b9ee9de
    # failure mode — so pipelined walls of small programs read as
    # dispatch floor; traced v4 measured 0.458 ms, 15x the wall, and
    # exactly the in-program sort.99 cost). Trace the scaling that
    # matters: operand count at the production length + the
    # supercluster-granular alternative.
    from tpu_pathtracer.utils.kernel_profile import kernel_profile_traced

    def traced(n, k):
        ops = mk(n, k)
        f = jax.jit(lambda *xs: jax.lax.sort(
            xs, dimension=-1, num_keys=1, is_stable=False
        ))
        prof = kernel_profile_traced(f, *ops)
        return round(prof["device_total"] * 1e3, 4)

    for k in (0, 1, 2, 4):
        res[f"traced_n17408_v{k}_ms"] = traced(17408, k)
    res["traced_n2176_v32_ms"] = traced(2176, 32)
    res["traced_n2176_v8_ms"] = traced(2176, 8)
    with open(os.path.join(HERE, "sched_sort_probe_result.json"),
              "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
