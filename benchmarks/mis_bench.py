"""Quick guided-MIS vs BSDF throughput check on the cbox (config #1).

Usage: python benchmarks/mis_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    import jax

    from tpu_pathtracer.core.constants import SAMPLING_MIS
    from tpu_pathtracer.core.math_utils import luminance
    from tpu_pathtracer.ops.guiding import build_cdfs
    from tpu_pathtracer.ops.intersect_pallas import (
        pack_attributes,
        pack_triangles,
    )
    from tpu_pathtracer.render.camera import CameraController
    from tpu_pathtracer.render.radiosity import solve_radiosity
    from tpu_pathtracer.render.renderer import (
        ProgressiveRenderer,
        RenderSettings,
    )
    from tpu_pathtracer.scene.builtin import cornell_box

    geom = cornell_box("quads").build()
    cam = CameraController.default().build()
    packs = dict(tri_pack=pack_triangles(geom),
                 attr_pack=pack_attributes(geom))

    sol = solve_radiosity(geom, jax.random.key(12345),
                          num_iterations=10, mc_samples=64)
    cdfs = build_cdfs(luminance(sol.rad_grid))

    def bench(mode_kw):
        s = RenderSettings(width=1024, height=1024, max_depth=5,
                           spp_per_pass=16, ray_chunk=1 << 16,
                           wavefront=True, **mode_kw)
        r = ProgressiveRenderer(
            geom, cam, s,
            cdfs=cdfs if mode_kw else None,
            mis_bsdf_fraction=0.5, **packs,
        )
        r.step()
        r.reset_stats()
        t0 = time.time()
        n = 0
        while n < 3 or (time.time() - t0 < 6.0 and n < 16):
            r.step(block=False)
            n += 1
        r.sync()
        return r.mrays_per_sec

    bsdf = bench({})
    mis = bench({"sampling_mode": SAMPLING_MIS})
    print(f"bsdf {bsdf:.1f} Mrays/s | mis {mis:.1f} Mrays/s | "
          f"ratio {bsdf / mis:.2f}x")


if __name__ == "__main__":
    main()
