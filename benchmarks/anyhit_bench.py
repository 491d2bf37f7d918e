"""FF-visibility any-hit backends on TPU: brute vs VMEM vs grouped culled.

Generates form-factor-shaped segment batches (surface-point pairs with
source/target exclusion) on a subdivided Cornell box and times each
backend pipelined (n calls issued back-to-back, one sync — the axon
tunnel's per-sync tax would otherwise dominate). Also cross-checks the
grouped kernel against the brute oracle on-device.

Usage: python benchmarks/anyhit_bench.py [--sub 5] [--batch 65536]
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
    ap.add_argument("--sub", type=int, default=5)
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--passes", type=int, default=8)
    ap.add_argument("--skip-vmem", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_pathtracer.ops.intersect import occluded
    from tpu_pathtracer.ops.intersect_pallas import (
        CulledScene,
        pack_prim_ids,
        pack_triangles,
        pallas_occluded,
    )
    from tpu_pathtracer.render.radiosity import sample_uniform_on_prims
    from tpu_pathtracer.scene.builtin import cornell_box
    from tpu_pathtracer.scene.mesh import subdivide

    geom = subdivide(cornell_box("quads"), args.sub).build()
    n_prims, n_tris = geom.num_prims, geom.num_tris
    print(f"sub-{args.sub}: {n_prims} prims, {n_tris} tris")

    b = args.batch
    key = jax.random.key(23)
    ki, kj, ku = jax.random.split(key, 3)
    pi_idx = jax.random.randint(ki, (b,), 0, n_prims)
    pj_idx = jax.random.randint(kj, (b,), 0, n_prims)
    u = jax.random.uniform(ku, (4, b))
    p_i = sample_uniform_on_prims(geom, pi_idx, u[0], u[1])
    p_j = sample_uniform_on_prims(geom, pj_idx, u[2], u[3])
    seg = p_j - p_i
    r = jnp.linalg.norm(seg, axis=-1)
    sd = seg / jnp.maximum(r, 1e-20)[:, None]
    o = p_i + geom.normal[pi_idx] * 1e-4
    maxd = r - 2e-4
    args_dev = [jax.device_put(x) for x in (o, sd, maxd, pi_idx, pj_idx)]
    jax.block_until_ready(args_dev)

    cs = CulledScene(geom)
    result = {"sub": args.sub, "prims": n_prims, "tris": n_tris,
              "batch": b}

    # correctness first (also warms both compiles)
    got = cs.occluded(*args_dev)
    ref = occluded(geom, *args_dev)
    mism = int(jnp.sum(got != ref))
    result["grouped_vs_brute_mismatches"] = mism
    print("grouped vs brute mismatches:", mism,
          "| blocked frac:", float(jnp.mean(ref.astype(jnp.float32))))

    def timed(fn, label):
        fn()  # warm
        jax.block_until_ready(fn())
        t0 = time.time()
        outs = [fn() for _ in range(args.passes)]
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / args.passes
        mrps = b / dt / 1e6
        result[label + "_ms"] = round(dt * 1e3, 3)
        result[label + "_mrays_s"] = round(mrps, 2)
        print(f"{label:16s} {dt * 1e3:8.2f} ms  {mrps:8.2f} Mrays/s")
        return mrps

    timed(lambda: cs.occluded(*args_dev), "grouped")
    timed(lambda: occluded(geom, *args_dev), "brute")
    if not args.skip_vmem:
        packs = (pack_triangles(geom), pack_prim_ids(geom))
        timed(lambda: pallas_occluded(packs[0], packs[1], *args_dev),
              "vmem")

    with open(os.path.join(HERE, "anyhit_bench_result.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
