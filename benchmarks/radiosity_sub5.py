"""Sub-5 radiosity solve (16384 prims / 32768 tris): the scale demo.

The reference's workflow caps at subdivision 4 (ui_windows.h:213). Our
solver streams the N^2 form-factor sweep in bounded row groups (each
device program well under the environment watchdog) and never holds
more than (rows_per_call, N) intermediates, so sub-5 completes on one
chip. Writes a render + timing JSON.

Usage: python benchmarks/radiosity_sub5.py [--samples 4] [--iters 8]
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
    ap.add_argument("--samples", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--sub", type=int, default=5)
    ap.add_argument("--vmem", action="store_true",
                    help="use the VMEM any-hit backend (round-2 path) "
                         "instead of the grouped culled kernel")
    ap.add_argument("--fresh", action="store_true",
                    help="ignore the cached solution")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu_pathtracer.ops.intersect_pallas import (
        CulledScene,
        pack_prim_ids,
        pack_triangles,
    )
    from tpu_pathtracer.render.camera import CameraController
    from tpu_pathtracer.render.radiosity import solve_radiosity
    from tpu_pathtracer.render.renderer import (
        RenderSettings,
        render_radiosity_view,
    )
    from tpu_pathtracer.scene.builtin import cornell_box
    from tpu_pathtracer.scene.mesh import subdivide
    from tpu_pathtracer.utils.png import write_png_bottom_up

    geom = subdivide(cornell_box("quads"), args.sub).build()
    n = geom.num_prims
    print(f"sub-{args.sub}: {n} prims, {geom.num_tris} tris, "
          f"{n * n / 1e6:.1f}M FF pairs x {args.samples} samples")

    import numpy as np

    cache = os.path.join(HERE, f"radiosity_sub{args.sub}_solution.npz")
    if os.path.exists(cache) and not args.fresh:
        data = np.load(cache)
        radiosity, solve_s = data["radiosity"], float(data["solve_s"])
        print(f"loaded cached solution ({cache})")
    else:
        if args.vmem:
            packs = (pack_triangles(geom), pack_prim_ids(geom))
        else:
            packs = CulledScene(geom)   # grouped culled any-hit
        t0 = time.time()
        sol = solve_radiosity(
            geom, jax.random.key(12345),
            num_iterations=args.iters,
            mc_samples=args.samples,
            occlusion_packs=packs,
        )
        jax.block_until_ready(sol.radiosity)
        solve_s = time.time() - t0
        print(f"solve: {solve_s:.1f} s")
        radiosity = np.asarray(sol.radiosity)
        np.savez(cache, radiosity=radiosity, solve_s=solve_s)

    cam = CameraController.default().build()
    # small ray chunk: the brute primary-hit query materializes a
    # (chunk, T, 3) intermediate; 64k x 32768 tris would be 24 GB
    s = RenderSettings(width=512, height=512, max_depth=1, spp_per_pass=1,
                       ray_chunk=2048)
    img = render_radiosity_view(geom, jnp.asarray(radiosity), cam,
                                jax.random.key(0), s)
    out = os.path.join(HERE, "..", "outputs",
                       f"cbox_sub{args.sub}_step{args.iters}.png")
    write_png_bottom_up(out, img)
    print(f"wrote {out}")

    result = {
        "prims": int(n),
        "mc_samples": args.samples,
        "iterations": args.iters,
        "visibility_backend": "vmem" if args.vmem else "culled_grouped",
        "solve_seconds": round(solve_s, 1),
        "total_radiosity_mean": float(np.asarray(radiosity).mean()),
    }
    with open(os.path.join(HERE, "radiosity_sub5_result.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
