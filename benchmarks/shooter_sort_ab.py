"""A/B: spatially-sorted vs power-ordered shooter batches (shooting solver).

`_shoot_step` takes the top-k unshot-power primitives as the shooter
batch. top_k returns them in DESCENDING POWER order — spatially
scattered. The flattened visibility batch is (receiver, shooter)-major,
so each 8-segment group of the grouped culled any-hit kernel shares one
receiver and spans 8 consecutive shooter-list entries: with scattered
shooters every group's direction frustum covers chords through the
whole scene, and the prepass hands the walk a near-union cluster
schedule. Sorting the batch by prim id (= subdivision order = spatially
adjacent patches) tightens each group's frustum at zero cost — the same
coherence lever as the renderer's 4x2 pixel-block lane swizzle, applied
to FF segments.

Measures s/step at sub-6 scale (65,536 prims, k=128, mc_samples=4 — the
configuration whose 8.13 ms/shot is recorded in docs/RESULTS.md), both
orders, each warmed with a 1-step solve before the timed window so
compiles never land inside a wall (the guided_sub6 trap).

Usage: python benchmarks/shooter_sort_ab.py [--sub 6] [--steps 8]
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
    ap.add_argument("--sub", type=int, default=6)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--samples", type=int, default=4)
    args = ap.parse_args()

    import jax

    from tpu_pathtracer.ops.intersect_pallas import CulledScene
    from tpu_pathtracer.render.radiosity import solve_radiosity_shooting
    from tpu_pathtracer.scene.builtin import cornell_box
    from tpu_pathtracer.scene.mesh import subdivide

    geom = subdivide(cornell_box("quads"), args.sub).build()
    cs = CulledScene(geom)
    print(f"sub-{args.sub}: {geom.num_prims} prims, {geom.num_tris} tris")

    def run(sort, steps):
        sol = solve_radiosity_shooting(
            geom, jax.random.key(12345), steps=steps,
            shooters_per_step=args.k, mc_samples=args.samples,
            occlusion_packs=cs, check_every=0, ambient=False,
            sort_shooters=sort,
        )
        jax.block_until_ready(sol.radiosity)
        return sol

    result = {"sub": args.sub, "k": args.k, "mc_samples": args.samples,
              "steps": args.steps}
    for sort in (False, True):
        run(sort, 1)                       # compile + warm
        t0 = time.time()
        sol = run(sort, args.steps)
        wall = time.time() - t0
        tag = "sorted" if sort else "power_order"
        result[f"s_per_step_{tag}"] = round(wall / args.steps, 3)
        result[f"ms_per_shot_{tag}"] = round(
            wall / args.steps / args.k * 1e3, 2
        )
        result[f"radiosity_mean_{tag}"] = float(sol.radiosity.mean())
        print(f"{tag}: {wall / args.steps:.3f} s/step "
              f"({wall / args.steps / args.k * 1e3:.2f} ms/shot)")

    result["speedup"] = round(
        result["s_per_step_power_order"] / result["s_per_step_sorted"], 3
    )
    with open(os.path.join(HERE, "shooter_sort_ab_result.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
