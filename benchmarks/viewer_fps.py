"""Interactive-loop frame cadence (the reference Profiler window's FPS
metric, ui_windows.h:365-366): one progressive pass per frame through
the viewer's own loop shape (App/ProgressiveRenderer), timed pipelined
(the axon tunnel's ~25 ms per-sync tax would otherwise measure RTT, not
render time — CLAUDE.md). Round-3 recorded 181.8 fps on cbox_quads
512^2 spp-1; this script also measures the 101k-triangle stress scene
(--scene stress100k) through the culled backend — interactivity at the
scale the reference's own BVH targets.

Usage: python benchmarks/viewer_fps.py [--scene cbox|stress100k]
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="stress100k")
    ap.add_argument("--frames", type=int, default=24)
    args = ap.parse_args()

    import numpy as np

    from tpu_pathtracer.render.camera import CameraController
    from tpu_pathtracer.render.renderer import (
        ProgressiveRenderer,
        RenderSettings,
    )

    if args.scene == "cbox":
        from tpu_pathtracer.scene.builtin import cornell_box

        geom = cornell_box("quads").build()
        cam = CameraController.default().build()
        s = RenderSettings(width=512, height=512, max_depth=5,
                           spp_per_pass=1, ray_chunk=1 << 16,
                           wavefront=True)
        r = ProgressiveRenderer(geom, cam, s)
    else:
        from tpu_pathtracer.ops.intersect_pallas import CulledScene
        from tpu_pathtracer.scene.pbrt_loader import parse_pbrt

        scene = parse_pbrt(os.path.join(HERE, "..", "scenes",
                                        "stress100k.pbrt"))
        geom = scene.prims.build()
        eye, tgt, up = scene.camera_lookat
        cam = CameraController(
            lookfrom=np.array(eye, np.float32),
            lookat=np.array(tgt, np.float32),
            vup=np.array(up, np.float32),
            vfov=scene.camera_fov or 40.0,
            aspect=1.0,
        ).build()
        s = RenderSettings(width=256, height=256, max_depth=4,
                           spp_per_pass=1, ray_chunk=1 << 16,
                           wavefront=True)
        r = ProgressiveRenderer(geom, cam, s,
                                culled=CulledScene(geom))

    r.step()            # compile + warmup
    r.sync()
    t0 = time.time()
    for _ in range(args.frames):
        r.step(block=False)
    r.sync()
    wall = time.time() - t0
    ms = wall / args.frames * 1e3
    result = {
        "scene": args.scene,
        "frames": args.frames,
        "ms_per_frame": round(ms, 2),
        "fps": round(1e3 / ms, 1),
        "settings": f"{s.width}^2 spp-1 depth-{s.max_depth}",
    }
    with open(os.path.join(HERE, f"viewer_fps_{args.scene}.json"),
              "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
