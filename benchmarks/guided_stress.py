"""Radiosity-guided path tracing on the 101k-triangle PBRT scene.

Every prior guiding measurement used the Cornell box (the reference's
only radiosity workflow); this runs the WHOLE thesis pipeline on the
BASELINE config-#4 stress scene: matrix-free shooting solve over
101,708 logical primitives (the N^2 gather matrix would be 41 GB) ->
CDF build -> guided-MIS wavefront render through the grouped culled
intersector, scored as equal-spp RMSE vs cosine sampling against a
high-spp ground truth. Cross-scene evidence for the reference's
research thesis (grid.h:141-188, integrator.h:112-166) at a scale its
own solver cannot represent.

Usage: python benchmarks/guided_stress.py [--steps 24] [--spp 64]
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
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--samples", type=int, default=2)
    ap.add_argument("--grid-refresh", type=int, default=128)
    ap.add_argument("--grid-refresh-samples", type=int, default=16)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--gt-spp", type=int, default=1024)
    ap.add_argument("--res", type=int, default=256)
    args = ap.parse_args()

    import jax
    import numpy as np

    from tpu_pathtracer.core.constants import SAMPLING_MIS
    from tpu_pathtracer.core.math_utils import luminance
    from tpu_pathtracer.ops.guiding import build_cdfs
    from tpu_pathtracer.ops.intersect_pallas import CulledScene
    from tpu_pathtracer.render.camera import CameraController
    from tpu_pathtracer.render.radiosity import solve_radiosity_shooting
    from tpu_pathtracer.render.renderer import (
        ProgressiveRenderer,
        RenderSettings,
    )
    from tpu_pathtracer.scene.pbrt_loader import parse_pbrt

    scene = parse_pbrt(os.path.join(HERE, "..", "scenes",
                                    "stress100k.pbrt"))
    geom = scene.prims.build()
    cs = CulledScene(geom)
    print(f"stress100k: {geom.num_prims} prims, {geom.num_tris} tris")

    t0 = time.time()
    sol = solve_radiosity_shooting(
        geom, jax.random.key(12345), steps=args.steps,
        shooters_per_step=args.k, mc_samples=args.samples,
        occlusion_packs=cs, rel_tol=1e-3,
        grid_refresh=args.grid_refresh,
        grid_refresh_samples=args.grid_refresh_samples,
    )
    jax.block_until_ready(sol.radiosity)
    solve_s = time.time() - t0
    print(f"shooting solve ({args.steps} steps x top-{args.k}): "
          f"{solve_s:.1f} s")

    t0 = time.time()
    cdfs = build_cdfs(luminance(sol.rad_grid))
    jax.block_until_ready(cdfs.prim_table)
    print(f"CDF build over {geom.num_prims} grids: {time.time()-t0:.2f} s")

    eye, tgt, up = scene.camera_lookat
    cam = CameraController(
        lookfrom=np.array(eye, np.float32),
        lookat=np.array(tgt, np.float32),
        vup=np.array(up, np.float32),
        vfov=scene.camera_fov or 40.0,
        aspect=1.0,
    ).build()

    def render(mode_kwargs, spp, seed):
        s = RenderSettings(
            width=args.res, height=args.res, max_depth=5,
            spp_per_pass=16, ray_chunk=1 << 16, wavefront=True,
            balance_lanes=4,
            **mode_kwargs,
        )
        r = ProgressiveRenderer(geom, cam, s, culled=cs, seed=seed,
                                **({"cdfs": cdfs,
                                    "mis_bsdf_fraction": 0.5}
                                   if mode_kwargs else {}))
        r.step()            # compile outside the wall (guided_sub6 trap)
        r.reset_stats()
        n_passes = max(0, (spp - s.spp_per_pass) // s.spp_per_pass)
        t0 = time.time()
        for _ in range(n_passes):
            r.step(block=False)
        r.sync()
        wall = time.time() - t0
        rate = r.total_rays / 1e6 / max(wall, 1e-9)
        return np.asarray(r.film.mean_radiance()), wall, rate

    gt, gt_wall, _ = render({}, args.gt_spp, seed=999)
    print(f"ground truth {args.gt_spp} spp: {gt_wall:.1f} s")

    def rel_rmse(img):
        return float(np.sqrt(np.mean((img - gt) ** 2))
                     / max(np.sqrt(np.mean(gt ** 2)), 1e-9))

    bsdf, bsdf_wall, bsdf_rate = render({}, args.spp, seed=7)
    mis, mis_wall, mis_rate = render(
        {"sampling_mode": SAMPLING_MIS}, args.spp, seed=7)
    e_b, e_m = rel_rmse(bsdf), rel_rmse(mis)
    result = {
        "prims": int(geom.num_prims),
        "tris": int(geom.num_tris),
        "solve_seconds": round(solve_s, 1),
        "grid_refresh": args.grid_refresh,
        "spp": args.spp,
        "rmse_bsdf": round(e_b, 5),
        "rmse_guided_mis": round(e_m, 5),
        "rmse_ratio": round(e_b / max(e_m, 1e-9), 3),
        "sample_efficiency": round((e_b / max(e_m, 1e-9)) ** 2, 2),
        "mrays_bsdf": round(bsdf_rate, 1),
        "mrays_mis": round(mis_rate, 1),
        "wall_bsdf_s": round(bsdf_wall, 2),
        "wall_mis_s": round(mis_wall, 2),
    }
    with open(os.path.join(HERE, "guided_stress_result.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
