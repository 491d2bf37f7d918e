"""A/B: cluster-coherence ray sort in the culled DMA backend.

Renders the 101k-tri stress scene (BASELINE config #4) with
CulledScene(sort_rays=False) vs True and reports end-to-end Mrays/s.
The sort re-orders each intersection batch by nearest-touched-cluster
id + direction octant INSIDE pallas_closest_tuv_dma (only o/d permute
in, only t/id permute out), unlike the rejected integrator-level sort
that permuted all 13 wavefront state arrays.

Usage: python benchmarks/stress_sort_ab.py [--spp 8] [--size 256]
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
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--depth", type=int, default=4)
    args = ap.parse_args()

    import numpy as np

    from tpu_pathtracer.ops.intersect_pallas import CulledScene
    from tpu_pathtracer.render.camera import CameraController
    from tpu_pathtracer.render.renderer import (
        ProgressiveRenderer,
        RenderSettings,
    )
    from tpu_pathtracer.scene.pbrt_loader import parse_pbrt

    scene = parse_pbrt(os.path.join(HERE, "..", "scenes/stress100k.pbrt"))
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
        width=args.size, height=args.size, max_depth=args.depth,
        spp_per_pass=args.spp, ray_chunk=1 << 16, wavefront=True,
    )

    def bench(backend_sort, integ_sort):
        si = s if not integ_sort else RenderSettings(
            width=args.size, height=args.size, max_depth=args.depth,
            spp_per_pass=args.spp, ray_chunk=1 << 16, wavefront=True,
            sort_rays=True,
        )
        r = ProgressiveRenderer(
            geom, cam, si, culled=CulledScene(geom, sort_rays=backend_sort)
        )
        r.step()
        r.reset_stats()
        t0 = time.time()
        n = 0
        while n < 3 or (time.time() - t0 < 4.0 and n < 8):
            r.step(block=False)
            n += 1
        r.sync()
        return r.mrays_per_sec, np.asarray(r.film.accum)

    base, img0 = bench(False, False)
    sort, img1 = bench(True, False)
    integ, img2 = bench(False, True)
    out = {
        "stress_mrays_nosort": round(base, 3),
        "stress_mrays_backend_sorted": round(sort, 3),
        "stress_mrays_integrator_sorted": round(integ, 3),
        "film_bitwise_equal": bool((img0 == img1).all()),
        "film_bitwise_equal_integ": bool((img0 == img2).all()),
    }
    with open(os.path.join(HERE, "stress_sort_ab_result.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
