"""Benchmark: wavefront path-tracing throughput on the Cornell box.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.json north star): >100 Mrays/sec/chip on v5e,
cbox 1024x1024. vs_baseline = value / 100.
"""

import json
import sys
import time


def main():
    import jax

    from tpu_pathtracer.render.camera import CameraController
    from tpu_pathtracer.render.renderer import (
        ProgressiveRenderer,
        RenderSettings,
    )
    from tpu_pathtracer.scene.builtin import cornell_box

    width = height = 1024
    depth = 5
    geom = cornell_box("quads").build()
    cam = CameraController.default().build()
    from tpu_pathtracer.ops.intersect_pallas import (
        pack_attributes,
        pack_triangles,
    )

    settings = RenderSettings(
        width=width,
        height=height,
        max_depth=depth,
        spp_per_pass=16,
        ray_chunk=1 << 16,
        wavefront=True,
    )
    r = ProgressiveRenderer(
        geom, cam, settings,
        tri_pack=pack_triangles(geom),
        attr_pack=pack_attributes(geom),
    )

    # Warmup (compile + first pass)
    r.step()
    r.total_rays = 0
    r.render_seconds = 0.0

    # Timed: at least 3 passes or 10 seconds, whichever first
    t0 = time.time()
    passes = 0
    while passes < 3 or (time.time() - t0 < 10.0 and passes < 16):
        r.step()
        passes += 1

    mrays = r.mrays_per_sec
    print(
        json.dumps(
            {
                "metric": "pathtrace_throughput_cbox1024",
                "value": round(mrays, 2),
                "unit": "Mrays/sec/chip",
                "vs_baseline": round(mrays / 100.0, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
