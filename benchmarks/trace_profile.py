"""In-situ phase breakdown of the REAL fused wavefront step on TPU.

Captures a jax.profiler device trace of one render pass (the actual
program the benchmark runs, fusions and all) and buckets XLA-op time
into intersection / rng / grid-sampling / shading phases — the
reference's in-kernel clock64 cycle accounting (integrator.h:286-368)
done the XLA way. Writes benchmarks/trace_profile_result.json.

Usage: python benchmarks/trace_profile.py [--scene cbox|stress] [--mis]
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
    p.add_argument("--scene", default="cbox",
                   choices=["cbox", "stress", "sub6"])
    p.add_argument("--mis", action="store_true")
    p.add_argument("--balance", type=int, default=0,
                   help="K pixels per lane, cost-balanced (stress only)")
    p.add_argument("--spp", type=int, default=0,
                   help="override spp_per_pass")
    args = p.parse_args()

    import jax
    import numpy as np

    from tpu_pathtracer.render.camera import CameraController
    from tpu_pathtracer.render.renderer import (
        ProgressiveRenderer,
        RenderSettings,
    )
    from tpu_pathtracer.utils.kernel_profile import (
        format_profile,
        kernel_profile_traced,
    )

    if args.scene == "cbox":
        from tpu_pathtracer.ops.intersect_pallas import (
            pack_attributes,
            pack_triangles,
        )
        from tpu_pathtracer.scene.builtin import cornell_box

        geom = cornell_box("quads").build()
        cam = CameraController.default().build()
        kw = dict(tri_pack=pack_triangles(geom),
                  attr_pack=pack_attributes(geom))
        settings_kw = dict(width=512, height=512, max_depth=5,
                           spp_per_pass=4, ray_chunk=1 << 16)
    elif args.scene == "sub6":
        # the guided-at-scale configuration (benchmarks/guided_sub6.py):
        # 65,536 prims / 131,072 tris, grouped culled backend
        from tpu_pathtracer.ops.intersect_pallas import CulledScene
        from tpu_pathtracer.scene.builtin import cornell_box
        from tpu_pathtracer.scene.mesh import subdivide

        geom = subdivide(cornell_box("quads"), 6).build()
        cam = CameraController.default().build()
        kw = dict(culled=CulledScene(geom))
        settings_kw = dict(width=256, height=256, max_depth=5,
                           spp_per_pass=4, ray_chunk=1 << 16)
    else:
        from tpu_pathtracer.ops.intersect_pallas import CulledScene
        from tpu_pathtracer.scene.pbrt_loader import parse_pbrt

        scene = parse_pbrt(os.path.join(HERE, "..",
                                        "scenes/stress100k.pbrt"))
        geom = scene.prims.build()
        eye, tgt, up = scene.camera_lookat
        cam = CameraController(
            lookfrom=np.array(eye, np.float32),
            lookat=np.array(tgt, np.float32),
            vup=np.array(up, np.float32),
            vfov=scene.camera_fov or 40.0, aspect=1.0,
        ).build()
        kw = dict(culled=CulledScene(geom))
        settings_kw = dict(width=256, height=256, max_depth=4,
                           spp_per_pass=2, ray_chunk=1 << 16,
                           balance_lanes=args.balance)

    cdfs = None
    if args.mis:
        from tpu_pathtracer.core.constants import SAMPLING_MIS
        from tpu_pathtracer.core.math_utils import luminance
        from tpu_pathtracer.ops.guiding import build_cdfs

        if args.scene == "sub6":
            # matrix-free scale: shooting solve, grid luminance cached
            # on disk so repeat traces skip the ~3 min solve
            import jax.numpy as jnp

            from tpu_pathtracer.render.radiosity import (
                solve_radiosity_shooting,
            )

            cache = "/tmp/tpt_sub6_gridlum.npy"
            if os.path.exists(cache):
                lum = jnp.asarray(np.load(cache))
            else:
                sol = solve_radiosity_shooting(
                    geom, jax.random.key(12345), steps=128,
                    shooters_per_step=128, mc_samples=4,
                    occlusion_packs=kw["culled"],
                )
                lum = luminance(sol.rad_grid)
                np.save(cache, np.asarray(lum))
            cdfs = build_cdfs(lum)
        else:
            from tpu_pathtracer.render.radiosity import solve_radiosity

            sol = solve_radiosity(geom, jax.random.key(12345),
                                  num_iterations=10, mc_samples=64)
            cdfs = build_cdfs(luminance(sol.rad_grid))
        settings_kw["sampling_mode"] = SAMPLING_MIS
    if args.spp:
        settings_kw["spp_per_pass"] = args.spp

    r = ProgressiveRenderer(geom, cam, RenderSettings(**settings_kw),
                            cdfs=cdfs, **kw)

    def step():
        r.step(block=False)
        return r.film.accum

    prof = kernel_profile_traced(step)
    print(format_profile(prof))
    print(f"device total: {prof['device_total']*1e3:.2f} ms over "
          f"{prof['ops']} device ops")

    key = f"{args.scene}{'_mis' if args.mis else ''}" + (
        f"_bal{args.balance}" if args.balance else ""
    ) + (f"_spp{args.spp}" if args.spp else "")
    path = os.path.join(HERE, "trace_profile_result.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data[key] = prof
    with open(path, "w") as f:
        json.dump(data, f, indent=2)


if __name__ == "__main__":
    main()
