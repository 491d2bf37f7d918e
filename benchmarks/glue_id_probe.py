"""Identify the non-kernel device ops in the production culled pass.

The round-4 walk_cost_probe showed stress100k's device budget split
across six ops all named pallas_closest_tuv_dma_grouped.NN — the walk
(40.8 ms), the prepass (15.4), and a TRIO of equal ~12.9 ms ops plus a
4.2 ms one whose identity the bare names hide. This probe traces the
UNMODIFIED renderer pass and prints each top op's HLO long name (the
jax op_name metadata path), so the glue actually worth attacking is
named instead of guessed.

Usage: python benchmarks/glue_id_probe.py [--scene stress100k|2m]
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
    p.add_argument("--scene", default="stress100k",
                   choices=["stress100k", "2m"])
    p.add_argument("--spp", type=int, default=8)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import numpy as np

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
    import tpu_pathtracer.ops.intersect_pallas as ip
    s = RenderSettings(width=256, height=256, max_depth=4,
                       spp_per_pass=args.spp, ray_chunk=1 << 16,
                       balance_lanes=4)
    r = ProgressiveRenderer(geom, cam, s, culled=ip.CulledScene(geom))
    r.step()  # compile + warm

    def one_pass():
        r.step()
        return r.film.accum

    prof = kernel_profile_traced(one_pass)
    rows = []
    for op in prof["top_ops"]:
        per_call = op["ms"] / max(op["count"], 1)
        rows.append({
            "name": op["name"],
            "ms": op["ms"],
            "count": op["count"],
            "ms_per_call": round(per_call, 4),
            "long_name": op["long_name"],
        })
        print(f'{op["ms"]:9.3f} ms x{op["count"]:4d} '
              f'({per_call:7.4f}/call) {op["name"]}')
        print(f'           {op["long_name"][:150]}')
    out = {
        "scene": args.scene,
        "device_total_ms": round(prof["device_total"] * 1e3, 2),
        "percent": {k: round(v, 2) for k, v in prof["percent"].items()},
        "ops": rows,
    }
    path = args.out or os.path.join(
        HERE, f"glue_id_probe_{args.scene}_result.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("device_total_ms", out["device_total_ms"], "->", path)


if __name__ == "__main__":
    main()
