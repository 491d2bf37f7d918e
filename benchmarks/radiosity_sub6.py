"""Sub-6 radiosity via matrix-free shooting: 65,536 prims / 131,072 tris.

The gather solver's (N, N) form-factor matrix would be 17 GB here — the
reference's architecture (N^2 floats + N^2 curand states up front,
application_state.h:705-715) cannot represent this scene at all, and its
UI caps at subdivision 4 (ui_windows.h:213). Shooting never forms the
matrix: per step it estimates only the (N, k) block of the top-k unshot
emitters with the standard MC estimator and the grouped culled any-hit
visibility backend. O(N k) memory; the whole solve is bounded by rays.

Usage: python benchmarks/radiosity_sub6.py [--steps 192] [--k 128]
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
    ap.add_argument("--steps", type=int, default=192)
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--samples", type=int, default=4)
    ap.add_argument("--rel-tol", type=float, default=1e-3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_pathtracer.ops.intersect_pallas import CulledScene
    from tpu_pathtracer.render.camera import CameraController
    from tpu_pathtracer.render.radiosity import solve_radiosity_shooting
    from tpu_pathtracer.render.renderer import (
        RenderSettings,
        render_radiosity_view,
    )
    from tpu_pathtracer.scene.builtin import cornell_box
    from tpu_pathtracer.scene.mesh import subdivide
    from tpu_pathtracer.utils.png import write_png_bottom_up

    geom = subdivide(cornell_box("quads"), args.sub).build()
    n = geom.num_prims
    print(f"sub-{args.sub}: {n} prims, {geom.num_tris} tris; gather "
          f"matrix would be {n * n * 4 / 1e9:.1f} GB — shooting is "
          f"O(N*k) = {n * args.k * 4 / 1e6:.0f} MB/step")

    cs = CulledScene(geom)
    t0 = time.time()
    sol = solve_radiosity_shooting(
        geom, jax.random.key(12345),
        steps=args.steps, shooters_per_step=args.k,
        mc_samples=args.samples, occlusion_packs=cs,
        rel_tol=args.rel_tol,
    )
    jax.block_until_ready(sol.radiosity)
    solve_s = time.time() - t0
    unshot_rem = float(jnp.abs(sol.unshot).sum())
    total = float(jnp.abs(sol.radiosity).sum())
    print(f"solve: {solve_s:.1f} s; residual unshot {unshot_rem:.3g} "
          f"of total {total:.3g}")

    cam = CameraController.default().build()
    s = RenderSettings(width=512, height=512, max_depth=1, spp_per_pass=1,
                       ray_chunk=16384)
    img = render_radiosity_view(geom, sol.radiosity, cam,
                                jax.random.key(0), s, culled=cs)
    out = os.path.join(HERE, "..", "outputs",
                       f"cbox_sub{args.sub}_shooting.png")
    write_png_bottom_up(out, img)
    print(f"wrote {out}")

    from tpu_pathtracer.render.radiosity import ambient_correction

    amb = float(jnp.abs(ambient_correction(geom, sol.unshot)).sum())
    result = {
        "prims": int(n),
        "tris": int(geom.num_tris),
        "shooters_per_step": args.k,
        "mc_samples": args.samples,
        "solve_seconds": round(solve_s, 1),
        "unshot_residual_frac": unshot_rem / max(total, 1e-9),
        "ambient_completion_frac": amb / max(total, 1e-9),
        "radiosity_mean": float(np.asarray(sol.radiosity).mean()),
    }
    with open(os.path.join(HERE, f"radiosity_sub{args.sub}_result"
                                 ".json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
