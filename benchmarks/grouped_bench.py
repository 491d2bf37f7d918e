"""Grouped (8-ray) culled kernel vs row-granular kernel on stress100k.

Times both kernels on coherent (camera) and incoherent (random bounce-
like) 64k-ray batches, pipelined (see CLAUDE.md sync-mode rules).

Usage: python benchmarks/grouped_bench.py [--n 65536]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import tpu_pathtracer.ops.intersect_pallas as ip
    import tpu_pathtracer.ops.intersect_pallas_legacy as ipl
    from tpu_pathtracer.render.camera import CameraController
    from tpu_pathtracer.scene.pbrt_loader import parse_pbrt

    scene = parse_pbrt("scenes/stress100k.pbrt")
    geom = scene.prims.build()
    print(f"tris {geom.num_tris}")
    cs = ip.CulledScene(geom)

    eye, tgt, up = scene.camera_lookat
    cam = CameraController(
        lookfrom=np.array(eye, np.float32),
        lookat=np.array(tgt, np.float32),
        vup=np.array(up, np.float32),
        vfov=scene.camera_fov or 40.0, aspect=1.0,
    ).build()
    n = args.n
    side = int(np.sqrt(n))
    u = (jnp.arange(n) % side + 0.5) / side
    v = (jnp.arange(n) // side + 0.5) / side
    o_c, d_c = cam.get_rays(u, v)

    # bounce-like: random origins near the geometry, random directions
    lo = jnp.asarray(np.asarray(cs.cluster_min).min(0))
    hi = jnp.asarray(np.asarray(cs.cluster_max).max(0))
    ko, kd = jax.random.split(jax.random.key(3))
    o_i = jax.random.uniform(ko, (n, 3)) * (hi - lo) + lo
    d_i = jax.random.normal(kd, (n, 3))
    d_i = d_i / jnp.linalg.norm(d_i, axis=-1, keepdims=True)

    def timeit(fn, *a, iters=8):
        r = fn(*a)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        outs = [fn(*a) for _ in range(iters)]
        jax.block_until_ready(outs)
        return (time.perf_counter() - t0) / iters * 1e3, r

    for tag, (o, d) in (("coherent", (o_c, d_c)),
                        ("incoherent", (o_i, d_i))):
        ms_row, r_row = timeit(
            ipl.pallas_closest_tuv_dma,
            cs.tri_pack, cs.cluster_min, cs.cluster_max, o, d)
        ms_grp, r_grp = timeit(
            ip.pallas_closest_tuv_dma_grouped,
            cs.tri_pack, cs.cluster_min, cs.cluster_max, o, d)
        t0, t1 = np.asarray(r_row[0]), np.asarray(r_grp[0])
        m = np.isfinite(t0)
        agree = np.isfinite(t1).sum() == m.sum() and np.allclose(
            t0[m], t1[m & np.isfinite(t1)][:m.sum()]
            if (np.isfinite(t1) != m).any() else t1[m],
            rtol=1e-5, atol=1e-6)
        print(f"{tag}: row {ms_row:.2f} ms  grouped {ms_grp:.2f} ms  "
              f"speedup {ms_row/ms_grp:.2f}x  hits {m.sum()} "
              f"agree={agree}")


if __name__ == "__main__":
    main()
