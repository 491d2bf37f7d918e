"""Per-visit overhead + megacore probe for the grouped culled kernel.

With median-split clusters the pair count halved but the kernel only
sped up ~15% — suspicion: per-(tile, cluster) VISIT overhead (DMA
wait, row loads, walk setup, in-kernel sort) now dominates. Probes,
all timed with the in-program device trace (wall timing of these
programs through the axon tunnel is a dispatch artifact):

  real          : production kernel
  zero_mask     : same schedule, all group masks zeroed -> every visit
                  happens, zero pairs processed (pure visit overhead)
  parallel      : tile grid dimension marked parallel (megacore split)

Usage: python benchmarks/visit_probe.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    import jax
    import jax.numpy as jnp

    import tpu_pathtracer.ops.intersect_pallas as ip
    from tpu_pathtracer.render.camera import CameraController
    from tpu_pathtracer.scene.pbrt_loader import parse_pbrt
    from tpu_pathtracer.utils.kernel_profile import kernel_profile_traced

    print("device:", jax.devices()[0].device_kind, flush=True)
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

    variants = {
        "real": dict(),
        "zero_mask": dict(zero_mask=True),
        "zero_sched": dict(zero_sched=True),
    }
    ref = {}
    for tag, (o, d) in (("coherent", (o_c, d_c)),
                        ("incoherent", (o_i, d_i))):
        for name, kw in variants.items():
            fn = lambda oo, dd: ip.pallas_closest_tuv_dma_grouped(
                cs.tri_pack, cs.cluster_min, cs.cluster_max, oo, dd,
                **kw)
            try:
                prof = kernel_profile_traced(fn, o, d)
                kern = sum(
                    top["ms"] for top in prof["top_ops"]
                    if "grouped" in top["name"]
                )
                print(f"{tag}/{name}: device {prof['device_total']*1e3:.2f}"
                      f" ms (grouped kernels {kern:.2f} ms)", flush=True)
                if name == "real":
                    ref[tag] = fn(o, d)
                elif name == "parallel":
                    r = fn(o, d)
                    same = all(
                        bool(jnp.all(a == b))
                        for a, b in zip(ref[tag], r))
                    print(f"  parallel bitwise == real: {same}",
                          flush=True)
            except Exception as e:  # noqa: BLE001 - probe reports and goes on
                print(f"{tag}/{name}: FAILED {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
