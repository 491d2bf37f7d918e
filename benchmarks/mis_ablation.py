"""Measure the UPPER BOUND of the guided-MIS theta-table fold.

Round-2 VERDICT item 3: folding the theta_table fetch + CDF inversion
into the hit kernel was modeled a wash but never measured. A full
in-kernel implementation needs 8 extra per-theta-row contractions per
chunk (the theta row index depends on the sampling uniform, so the hit
kernel cannot one-hot it with the winner-triangle mask alone); before
building that, this ablation measures the MOST the fold could ever
recover: it replaces both per-lane theta_table row fetches with a
constant row-0 broadcast (same shapes and downstream math, garbage
values) and times the MIS render. If ablated == real, the fetch is
free and the fold is a measured dead end.

Usage: python benchmarks/mis_ablation.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    import jax
    import jax.numpy as jnp

    import tpu_pathtracer.ops.guiding as G
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

    def bench():
        s = RenderSettings(width=1024, height=1024, max_depth=5,
                           spp_per_pass=16, ray_chunk=1 << 16,
                           wavefront=True, sampling_mode=SAMPLING_MIS)
        r = ProgressiveRenderer(geom, cam, s, cdfs=cdfs,
                                mis_bsdf_fraction=0.5, **packs)
        r.step()
        r.reset_stats()
        t0 = time.time()
        n = 0
        while n < 3 or (time.time() - t0 < 4.0 and n < 10):
            r.step(block=False)
            n += 1
        r.sync()
        return r.mrays_per_sec

    print("solved; benching real...", flush=True)
    real = bench()
    print("real", round(real, 1), flush=True)

    orig = G._fetch_rows

    def ablated(table, idx):
        if table.ndim == 2 and table.shape[1] == 32:
            # theta_table fetch -> constant row broadcast (free)
            return jnp.broadcast_to(
                table[0:1], (idx.shape[0], table.shape[1])
            )
        return orig(table, idx)

    G._fetch_rows = ablated
    print("benching ablated...", flush=True)
    try:
        abl = bench()
    finally:
        G._fetch_rows = orig

    print(f"mis real {real:.1f} Mrays/s | theta-fetch ablated "
          f"{abl:.1f} | fold upper bound {abl / real:.3f}x")


if __name__ == "__main__":
    main()
