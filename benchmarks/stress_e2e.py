"""Quick end-to-end stress100k throughput check (BASELINE config #4).

Usage: python benchmarks/stress_e2e.py [--sort] [--spp N] [--res N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sort", action="store_true")
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=16,
                    help="log2 ray chunk (17 ok, 18 hangs the compiler)")
    ap.add_argument("--balance", type=int, default=0,
                    help="K pixels per lane, cost-balanced (0=off)")
    ap.add_argument("--tilesync", action="store_true",
                    help="tile-synchronized queue advance")
    ap.add_argument("--regroup", action="store_true",
                    help="within-tile (octant, nearest-cluster) regroup")
    args = ap.parse_args()

    from tpu_pathtracer.ops.intersect_pallas import CulledScene
    from tpu_pathtracer.render.camera import CameraController
    from tpu_pathtracer.render.renderer import (
        ProgressiveRenderer,
        RenderSettings,
    )
    from tpu_pathtracer.scene.pbrt_loader import parse_pbrt

    scene = parse_pbrt("scenes/stress100k.pbrt")
    geom = scene.prims.build()
    eye, tgt, up = scene.camera_lookat
    cam = CameraController(
        lookfrom=np.array(eye, np.float32),
        lookat=np.array(tgt, np.float32),
        vup=np.array(up, np.float32),
        vfov=scene.camera_fov or 40.0,
        aspect=1.0,
    ).build()
    s = RenderSettings(
        width=args.res, height=args.res, max_depth=args.depth,
        spp_per_pass=args.spp, ray_chunk=1 << args.chunk, wavefront=True,
        sort_rays=args.sort, balance_lanes=args.balance,
        balance_tile_sync=args.tilesync,
    )
    r = ProgressiveRenderer(geom, cam, s,
                        culled=CulledScene(geom, regroup=args.regroup))

    import time

    r.step()
    r.reset_stats()
    t0 = time.time()
    passes = 0
    while passes < 3 or (time.time() - t0 < 6.0 and passes < 12):
        r.step(block=False)
        passes += 1
    r.sync()
    print(f"stress100k sort={args.sort} balance={args.balance} "
          f"regroup={args.regroup} "
          f"tilesync={args.tilesync}: "
          f"{r.mrays_per_sec:.2f} Mrays/s ({passes} passes)")


if __name__ == "__main__":
    main()
