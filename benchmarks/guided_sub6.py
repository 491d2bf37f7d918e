"""Radiosity-guided path tracing at sub-6 (65,536 prims / 131,072 tris).

The reference's research thesis is importance-sampling bounce directions
from per-primitive radiosity grids (grid.h:141-188, integrator.h:112-166)
— but its workflow caps at subdivision 4 (ui_windows.h:213) and its N^2
radiosity solver cannot even represent sub-6 (17 GB matrix,
application_state.h:705-715). This benchmark runs the WHOLE thesis
pipeline two subdivisions past that wall: matrix-free shooting solve ->
CDF build (65,536 x 256 grids) -> one-sample-MIS guided wavefront render
through the grouped culled intersector, and scores equal-spp RMSE vs
cosine (BSDF) sampling against a high-spp ground truth.

Usage: python benchmarks/guided_sub6.py [--steps 128] [--spp 64]
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
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--samples", type=int, default=4)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--gt-spp", type=int, default=2048)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--brute", action="store_true",
                    help="skip the culled backend (CPU smoke test)")
    args = ap.parse_args()

    if args.brute:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

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
    from tpu_pathtracer.scene.builtin import cornell_box
    from tpu_pathtracer.scene.mesh import subdivide

    geom = subdivide(cornell_box("quads"), args.sub).build()
    cs = None if args.brute else CulledScene(geom)
    print(f"sub-{args.sub}: {geom.num_prims} prims, {geom.num_tris} tris")

    t0 = time.time()
    sol = solve_radiosity_shooting(
        geom, jax.random.key(12345), steps=args.steps,
        shooters_per_step=args.k, mc_samples=args.samples,
        occlusion_packs=cs, rel_tol=1e-3,
    )
    jax.block_until_ready(sol.radiosity)
    solve_s = time.time() - t0
    print(f"shooting solve: {solve_s:.1f} s")

    t0 = time.time()
    cdfs = build_cdfs(luminance(sol.rad_grid))
    jax.block_until_ready(cdfs.prim_table)
    print(f"CDF build over {geom.num_prims} grids: {time.time()-t0:.2f} s")

    cam = CameraController.default().build()

    def render(mode_kwargs, spp, seed):
        s = RenderSettings(
            width=args.res, height=args.res, max_depth=5,
            spp_per_pass=16, ray_chunk=1 << 16, wavefront=True,
            **mode_kwargs,
        )
        r = ProgressiveRenderer(geom, cam, s, culled=cs, seed=seed,
                                **({"cdfs": cdfs,
                                    "mis_bsdf_fraction": 0.5}
                                   if mode_kwargs else {}))
        # warmup pass: exclude program compile from the wall clock (the
        # BSDF and MIS programs compile separately; an included compile
        # once inflated the MIS wall 3.5x). The warmup's spp stay in the
        # film, so both modes accumulate the same total.
        r.step()
        r.reset_stats()
        n_passes = max(0, (spp - s.spp_per_pass) // s.spp_per_pass)
        t0 = time.time()
        for _ in range(n_passes):
            r.step(block=False)
        r.sync()
        wall = time.time() - t0
        # rate from the measured wall (render_seconds only counts
        # dispatch time for pipelined steps)
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
    with open(os.path.join(HERE, "guided_sub6_result.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
