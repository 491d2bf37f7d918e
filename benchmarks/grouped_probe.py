"""Cost breakdown for the grouped kernel: prepass/glue vs kernel, and
pair-count statistics to calibrate per-(group, cluster) cost.

Usage: python benchmarks/grouped_probe.py
"""

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
    from tpu_pathtracer.scene.pbrt_loader import parse_pbrt

    scene = parse_pbrt("scenes/stress100k.pbrt")
    geom = scene.prims.build()
    cs = ip.CulledScene(geom)
    eye, tgt, up = scene.camera_lookat
    cam = CameraController(
        lookfrom=np.array(eye, np.float32),
        lookat=np.array(tgt, np.float32),
        vup=np.array(up, np.float32),
        vfov=scene.camera_fov or 40.0, aspect=1.0,
    ).build()
    n = 65536
    side = 256
    u = (jnp.arange(n) % side + 0.5) / side
    v = (jnp.arange(n) // side + 0.5) / side
    o_c, d_c = cam.get_rays(u, v)
    lo = jnp.asarray(np.asarray(cs.cluster_min).min(0))
    hi = jnp.asarray(np.asarray(cs.cluster_max).max(0))
    ko, kd = jax.random.split(jax.random.key(3))
    o_i = jax.random.uniform(ko, (n, 3)) * (hi - lo) + lo
    d_i = jax.random.normal(kd, (n, 3))
    d_i = d_i / jnp.linalg.norm(d_i, axis=-1, keepdims=True)

    tiles = n // ip.RAYS_PER_TILE

    glue = jax.jit(
        lambda o, d: ip._cluster_list_groups(
            cs.cluster_min, cs.cluster_max,
            [x for x in _tcomps(ip, o, d, tiles)], 1e-4, n)
    )

    def timeit(fn, *a, iters=8):
        r = fn(*a)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        outs = [fn(*a) for _ in range(iters)]
        jax.block_until_ready(outs)
        return (time.perf_counter() - t0) / iters * 1e3, r

    for tag, (o, d) in (("coherent", (o_c, d_c)),
                        ("incoherent", (o_i, d_i))):
        ms_glue, (count, keys, gmask, _lostep, _texit) = timeit(glue, o, d)
        ms_full, _ = timeit(
            ip.pallas_closest_tuv_dma_grouped,
            cs.tri_pack, cs.cluster_min, cs.cluster_max, o, d)
        cnt = np.asarray(count)
        gm = np.asarray(gmask).view(np.uint32)
        k = np.asarray(keys)
        active = (k & (1 << 30)) == 0
        bits = np.zeros(gm.shape[:2], np.int64)
        for w in range(4):
            # gmask is (tiles, 4, cpad) in SCHEDULE order (round 4)
            bits += np.vectorize(
                lambda v: bin(v).count("1")
            )(gm[:, w, :]).astype(np.int64)
        pairs = int(bits[active].sum())
        print(f"{tag}: glue+prepass {ms_glue:.2f} ms, full "
              f"{ms_full:.2f} ms -> kernel ~{ms_full-ms_glue:.2f} ms; "
              f"sched clusters {cnt.sum()} (mean {cnt.mean():.1f}/tile), "
              f"pairs {pairs} -> {1e3*(ms_full-ms_glue)/max(pairs,1):.2f}"
              f" us/pair")


def _tcomps(ip, o, d, tiles):
    def tcomp(x):
        return (
            x.reshape(tiles, ip.GROUPS_PER_TILE, ip.GROUP)
            .transpose(0, 2, 1)
            .reshape(tiles * ip.GROUP, ip.RAY_TILE)
        )

    return [tcomp(o[:, 0]), tcomp(o[:, 1]), tcomp(o[:, 2]),
            tcomp(d[:, 0]), tcomp(d[:, 1]), tcomp(d[:, 2])]


if __name__ == "__main__":
    main()
