"""Headline-MFU plateau analysis (VERDICT round-2 item 6).

Question: is the small-scene VMEM kernel latency/issue-bound (so ~5%
FLOP-utilization is structural), or is there schedulable headroom?
Method: time the wavefront render at padded triangle counts (the
kernel's per-chunk block is (Tpad, 128)) and at several ROWS_PER_STEP
values, then look at Mrays/s * Tpad — for an issue-bound kernel the
per-ray cost is ~linear in Tpad with a fixed floor, so throughput
should scale ~1/Tpad once Tpad dominates the floor, and the implied
tests/s plateaus at the VPU issue rate.

Usage: python benchmarks/mfu_plateau.py
Writes benchmarks/mfu_plateau_result.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    import jax
    import jax.numpy as jnp

    import tpu_pathtracer.ops.intersect_pallas as ip
    from tpu_pathtracer.render.camera import CameraController
    from tpu_pathtracer.scene.builtin import cornell_box
    from tpu_pathtracer.scene.mesh import subdivide

    cam = CameraController.default().build()
    n = 1 << 16
    u = jax.random.uniform(jax.random.key(0), (2, n))
    o, d = cam.get_rays(u[0], u[1])

    def time_kernel(tri_pack, iters=30):
        f = jax.jit(lambda o, d: ip.pallas_closest_tuv(tri_pack, o, d))
        r = f(o, d)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        outs = [f(o, d) for _ in range(iters)]
        jax.block_until_ready(outs)
        return (time.perf_counter() - t0) / iters * 1e3

    results = {"rays": n, "by_tpad": []}
    # sweep Tpad by subdividing the cbox (tri counts 40, 160, 640, 2560)
    # plus the raw quads scene (32 tris padded to 32/40)
    for sub in (0, 1, 2, 3):
        prims = cornell_box("quads")
        if sub:
            prims = subdivide(prims, sub)
        geom = prims.build()
        tp = ip.pack_triangles(geom)
        tpad = tp.shape[0]
        ms = time_kernel(tp)
        tests_per_s = n * tpad / (ms * 1e-3)
        results["by_tpad"].append({
            "tris": geom.num_tris, "tpad": tpad,
            "ms_per_call": round(ms, 3),
            "mrays_s": round(n / ms / 1e3, 1),
            "g_tests_s": round(tests_per_s / 1e9, 1),
            "vpu_flop_util_at_40flops": round(
                tests_per_s * 40 / 7.7e12, 4),
        })
        print(results["by_tpad"][-1])

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "mfu_plateau_result.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
