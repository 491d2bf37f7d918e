"""Decompose the grouped walk kernel's cost ON THE REAL BENCH WORKLOAD.

The synthetic probes (visit_probe.py, grouped_probe.py) time coherent
camera rays and fully random rays; the bench config (stress100k,
balance_lanes=4, spp 8) runs MIXED batches whose shape neither probe
reproduces. This probe runs the actual renderer pass and, inside the
same traced program, issues two extra walk-kernel calls per iteration
on the very same batches:

  zero_mask  — same schedule, all group masks zeroed: every cluster
               visit happens (DMA, sched reads, word loops) but no
               (group, cluster) pair is processed  -> visit overhead
  zero_sched — empty schedule: per-tile fixed floor  -> tile floor

The real walk time minus zero_mask is pure pair work; zero_mask minus
zero_sched is per-visit overhead. The probe results are tied into the
output with lax.optimization_barrier so XLA cannot DCE them, and the
glue/prepass (identical operands) CSE into one copy.

Usage: python benchmarks/walk_cost_probe.py [--spp 8] [--balance 4]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--spp", type=int, default=8)
    p.add_argument("--balance", type=int, default=4)
    p.add_argument("--scene", default="stress100k",
                   choices=["stress100k", "2m"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import tpu_pathtracer.ops.intersect_pallas as ip
    from tpu_pathtracer.render.camera import CameraController
    from tpu_pathtracer.render.renderer import (
        ProgressiveRenderer,
        RenderSettings,
    )
    from tpu_pathtracer.scene.pbrt_loader import parse_pbrt
    from tpu_pathtracer.utils.kernel_profile import kernel_profile_traced

    if args.scene == "2m":
        scene = parse_pbrt("/tmp/tpt_stress2m/stress2m.pbrt",
                           max_triangles=1 << 31)
    else:
        scene = parse_pbrt(
            os.path.join(HERE, "..", "scenes/stress100k.pbrt"))
    geom = scene.prims.build()
    eye, tgt, up = scene.camera_lookat
    cam = CameraController(
        lookfrom=np.array(eye, np.float32),
        lookat=np.array(tgt, np.float32),
        vup=np.array(up, np.float32),
        vfov=scene.camera_fov or 40.0, aspect=1.0,
    ).build()

    orig = ip.CulledScene._part_tuv

    def probed(self, part, o, d, t_min, camera_mask):
        t, ridx = orig(self, part, o, d, t_min, camera_mask)
        tri_pack, cmin, cmax, _ = part
        tm, _ = ip.pallas_closest_tuv_dma_grouped(
            tri_pack, cmin, cmax, o, d, t_min, zero_mask=True)
        ts, _ = ip.pallas_closest_tuv_dma_grouped(
            tri_pack, cmin, cmax, o, d, t_min, zero_sched=True)
        # tie the probe values into the result with always-false selects
        # the compiler cannot prove false (t >= t_min > 0 always), so
        # neither probe call is DCE'd and t stays bit-identical
        t = jnp.where(tm < -1.0, tm, t)
        t = jnp.where(ts < -2.0, ts, t)
        return t, ridx

    ip.CulledScene._part_tuv = probed
    try:
        r = ProgressiveRenderer(
            geom, cam,
            RenderSettings(width=256, height=256, max_depth=4,
                           spp_per_pass=args.spp, ray_chunk=1 << 16,
                           balance_lanes=args.balance),
            culled=ip.CulledScene(geom),
        )

        def step():
            r.step(block=False)
            return r.film.accum

        prof = kernel_profile_traced(step)
    finally:
        ip.CulledScene._part_tuv = orig

    walks = [op for op in prof["top_ops"]
             if op["name"].startswith("pallas_closest_tuv_dma_grouped")]
    # the prepass sub-call shares a name prefix; identify walk calls by
    # count (one per iteration) and rank by total time: real >= zero_mask
    # >= zero_sched, prepass sits wherever CSE left it
    walks.sort(key=lambda o: -o["ms"])
    for op in walks:
        print(f"{op['name']:44s} {op['ms']:8.2f} ms  x{op['count']}")
    out = {
        "scene": args.scene,
        "spp": args.spp, "balance": args.balance,
        "device_total_ms": prof["device_total"] * 1e3,
        "ops": [{k: op[k] for k in ("name", "ms", "count")}
                for op in walks],
    }
    path = os.path.join(HERE, "walk_cost_probe_result.json")
    data = {}
    if os.path.exists(path):
        try:
            data = json.load(open(path))
        except Exception:
            data = {}
    if "ops" in data:          # pre-round-4 flat format
        data = {"stress100k": data}
    data[args.scene] = out
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps({k: out[k] for k in ("spp", "balance",
                                          "device_total_ms")}))


if __name__ == "__main__":
    main()
