"""Where does the fused gated prepass's time live at HBM scale?

The quarter gate cut the in-block slab work ~2x on bounce batches
(subgate_probe.py) yet the prepass only dropped 1.42 -> ~1.2 ms/call
on the 2.1M scene — so the kernel must be dominated by per-(tile,
block) MACHINERY, not slab arithmetic. This probe separates the two by
timing, pipelined through the tunnel in one process:

  zero  — every gate word forced 0: pure fori-loop + branch + OFF-block
          store floor (no slab work at all)
  real  — the production gated prepass (gate words computed)
  one   — every quarter forced on: dense fused cost
  gate  — the gate-word computation alone (_quarter_gate)

real - zero ~= ON-quarter compute; zero = the floor a scheduled
(worklist) prepass would attack; one - zero = full slab compute.

Usage: python benchmarks/prepass_floor_probe.py [--tag 2m] [--mix]
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
    ap.add_argument("--rays", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=30)
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
    cmin, cmax = cs.cluster_min, cs.cluster_max
    c = cmin.shape[0]
    print(f"{geom.num_tris} tris, {c} clusters", flush=True)

    # mixed batch: half camera, half uniform bounce (subgate_probe's
    # convention; its measured gate fractions bracket the real mix)
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
            # keep all three outputs alive (tn holds inf for OFF
            # clusters — mask before reducing)
            return (ghit.sum(), texit.sum(),
                    jnp.where(jnp.isfinite(tn), tn, 0.0).sum())
        return f

    def mk_gate():
        @jax.jit
        def f(*cc):
            g = ip._quarter_gate(cmin, cmax, list(cc), 1e-4, n, c,
                                 (c + 127) // 128 * 128)
            return g.sum()
        return f

    out = {"clusters": int(c), "rays": n, "qgran": ip._QGRAN}
    progs = [("zero", mk("zero")), ("real", mk(None)),
             ("one", mk("one")), ("gate", mk_gate())]
    for name, f in progs:
        r = f(*comps)
        jax.block_until_ready(r)          # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = f(*comps)
        jax.block_until_ready(r)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        out[f"{name}_ms"] = round(ms, 3)
        print(f"{name:5s} {ms:8.3f} ms/call", flush=True)

    with open(os.path.join(HERE, "prepass_floor_probe_result.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
