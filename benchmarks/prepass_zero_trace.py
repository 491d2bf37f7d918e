"""Device-trace attribution of the gated prepass (advisor r4 item 2).

The worklist rewrite cut the loop machinery to zero iterations in
'zero' mode, yet zero_ms stayed ~1.7 ms — so the floor is NOT the
fori machinery. This probe traces the zero-mode and real-mode
programs and prints the per-op device breakdown (top_ops), separating
bulk-init stores / gate compute / schedule glue / writeback / reduce.

Usage: python benchmarks/prepass_zero_trace.py [--tag 2m]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="2m")
    ap.add_argument("--rays", type=int, default=16384)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import tpu_pathtracer.ops.intersect_pallas as ip
    from tpu_pathtracer.render.camera import CameraController
    from tpu_pathtracer.scene.pbrt_loader import parse_pbrt
    from tpu_pathtracer.utils.kernel_profile import kernel_profile_traced

    pbrt = f"/tmp/tpt_stress{args.tag}/stress{args.tag}.pbrt"
    if not os.path.exists(pbrt):
        sys.path.insert(0, os.path.join(HERE, "..", "scenes"))
        from generate_stress import generate
        n_tess = {"1m": 709, "2m": 1025}.get(args.tag, 1025)
        pbrt = generate(f"/tmp/tpt_stress{args.tag}", tag=args.tag,
                        n=n_tess)
    scene = parse_pbrt(pbrt, max_triangles=1 << 31)
    geom = scene.prims.build()
    cs = ip.CulledScene(geom)
    cmin, cmax = cs.cluster_min, cs.cluster_max
    c = cmin.shape[0]
    print(f"{geom.num_tris} tris, {c} clusters", flush=True)

    eye, tgt, up = scene.camera_lookat
    cam = CameraController(
        lookfrom=np.array(eye, np.float32),
        lookat=np.array(tgt, np.float32),
        vup=np.array(up, np.float32),
        vfov=scene.camera_fov or 40.0, aspect=1.0,
    ).build()
    n = args.rays
    side = 128
    u = (np.arange(n) % side + 0.5) / side
    v = (np.arange(n) // side + 0.5) / side
    o_c, d_c = cam.get_rays(u, v)
    o_c, d_c = np.asarray(o_c), np.asarray(d_c)
    lo, hi = np.asarray(cmin).min(0), np.asarray(cmax).max(0)
    rs = np.random.RandomState(3)
    o_i = (rs.rand(n, 3) * (hi - lo) + lo).astype(np.float32)
    d_i = rs.randn(n, 3).astype(np.float32)
    d_i /= np.linalg.norm(d_i, axis=-1, keepdims=True)
    o = np.concatenate([o_c[: n // 2], o_i[: n // 2]])
    d = np.concatenate([d_c[: n // 2], d_i[: n // 2]])

    tiles = n // ip.RAYS_PER_TILE

    def tcomp(x):
        return jnp.asarray(
            x.reshape(tiles, ip.GROUPS_PER_TILE, ip.GROUP)
            .transpose(0, 2, 1)
            .reshape(tiles * ip.GROUP, ip.RAY_TILE)
        )

    comps = [tcomp(o[:, 0]), tcomp(o[:, 1]), tcomp(o[:, 2]),
             tcomp(d[:, 0]), tcomp(d[:, 1]), tcomp(d[:, 2])]

    def mk(override):
        @jax.jit
        def f(*cc):
            ghit, tn, texit, _, _ = ip._prepass_groups(
                cmin, cmax, list(cc), 1e-4, n,
                _gate_override=override
            )
            return (ghit.sum(), texit.sum(),
                    jnp.where(jnp.isfinite(tn), tn, 0.0).sum())
        return f

    out = {}
    for name, override in [("zero", "zero"), ("real", None)]:
        prof = kernel_profile_traced(mk(override), *comps)
        print(f"\n=== {name} mode: device {prof['device_total']*1e3:.3f}"
              f" ms, {prof['ops']} ops ===", flush=True)
        for op in prof["top_ops"][:12]:
            print(f"  {op['ms']:>8.3f} ms x{op['count']:<3} {op['name']}")
        out[name] = {
            "device_ms": round(prof["device_total"] * 1e3, 3),
            "top_ops": prof["top_ops"][:12],
        }

    with open(os.path.join(HERE, "prepass_zero_trace_result.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
