"""Decompose the gated prepass cost on the 2.1M-tri single pack.

Times _prepass_groups on real camera and synthetic bounce batches in
three modes (pipelined, one sync):

  gated  — production (mini-prepass block gate)
  empty  — gate forced all-zero: every (tile, block) step launches and
           immediately skips -> pure Mosaic step floor
  dense  — gate forced all-one: full slab arithmetic everywhere

dense - empty = compute; gated vs the two bounds gives the effective
gate on-fraction; empty alone says whether the 129-block grid's step
floor is worth restructuring (j-loop inside the kernel).

Usage: python benchmarks/prepass_gate_probe.py [--tag 2m]
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
    ap.add_argument("--tag", default="2m")
    ap.add_argument("--n", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import tpu_pathtracer.ops.intersect_pallas as ip
    from tpu_pathtracer.render.camera import CameraController
    from tpu_pathtracer.scene.pbrt_loader import parse_pbrt

    pbrt = f"/tmp/tpt_stress{args.tag}/stress{args.tag}.pbrt"
    if not os.path.exists(pbrt):
        sys.path.insert(0, os.path.join(HERE, "..", "scenes"))
        from generate_stress import generate
        n_tess = args.n or {"1m": 709, "2m": 1025}.get(args.tag, 1025)
        pbrt = generate(f"/tmp/tpt_stress{args.tag}", tag=args.tag,
                        n=n_tess)
    scene = parse_pbrt(pbrt, max_triangles=1 << 31)
    geom = scene.prims.build()
    cs = ip.CulledScene(geom)
    c = int(cs.cluster_min.shape[0])
    print(f"{geom.num_tris} tris, {c} clusters", flush=True)

    eye, tgt, up = scene.camera_lookat
    cam = CameraController(
        lookfrom=np.array(eye, np.float32),
        lookat=np.array(tgt, np.float32),
        vup=np.array(up, np.float32),
        vfov=scene.camera_fov or 40.0, aspect=1.0,
    ).build()
    n = 16384              # the bench call width (balance_lanes=4)
    side = 128
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

    def tcomp(x):
        return (
            x.reshape(tiles, ip.GROUPS_PER_TILE, ip.GROUP)
            .transpose(0, 2, 1)
            .reshape(tiles * ip.GROUP, ip.RAY_TILE)
        )

    def comps_of(o, d):
        return [tcomp(o[:, 0]), tcomp(o[:, 1]), tcomp(o[:, 2]),
                tcomp(d[:, 0]), tcomp(d[:, 1]), tcomp(d[:, 2])]

    def run(mode):
        if mode == "dense":
            return jax.jit(lambda cm, cx, *cps: ip._prepass_groups(
                cm, cx, list(cps), 1e-4, n, _force_dense=True)[:3])
        if mode == "gated":
            return jax.jit(lambda cm, cx, *cps: ip._prepass_groups(
                cm, cx, list(cps), 1e-4, n)[:3])
        # empty: translate all cluster boxes far away so no ray hits —
        # the gate then skips everything (per-step floor) and the
        # outputs are all-empty.
        off = jnp.float32(1e7)
        return jax.jit(lambda cm, cx, *cps: ip._prepass_groups(
            cm + off, cx + off, list(cps), 1e-4, n)[:3])

    results = {}
    for tag_r, (o, d) in (("camera", (o_c, d_c)),
                          ("bounce", (o_i, d_i))):
        cps = comps_of(o, d)
        fns = {m: run(m) for m in ("gated", "empty", "dense")}
        for fn in fns.values():          # compile + warm all first
            jax.block_until_ready(fn(cs.cluster_min, cs.cluster_max,
                                     *cps))
        best = {m: float("inf") for m in fns}
        for _ in range(4):               # interleaved rounds, min wins
            for m, fn in fns.items():
                iters = 20
                t0 = time.perf_counter()
                for _ in range(iters):
                    outs = fn(cs.cluster_min, cs.cluster_max, *cps)
                jax.block_until_ready(outs)
                best[m] = min(best[m],
                              (time.perf_counter() - t0) / iters * 1e3)
        for m in ("gated", "empty", "dense"):
            results[f"{tag_r}_{m}_ms"] = round(best[m], 3)
            print(f"{tag_r:7s} {m:6s} {best[m]:8.3f} ms", flush=True)
        # gate on-fraction for the real gate
        nblk = ((c + 127) // 128 * 128) // ip.TRI_CHUNK
        gate = ip._block_gate(cs.cluster_min, cs.cluster_max, cps,
                              1e-4, tiles, c,
                              (c + 127) // 128 * 128)
        results[f"{tag_r}_gate_frac"] = round(float(gate.mean()), 4)
        print(f"{tag_r:7s} gate on-fraction "
              f"{results[f'{tag_r}_gate_frac']}", flush=True)

    path = os.path.join(HERE, "prepass_gate_probe_result.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
