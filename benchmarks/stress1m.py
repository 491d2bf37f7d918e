"""Million-triangle scene through the grouped culled intersector.

The reference's BVH path is nominally bounded only by its 2M-triangle
PBRT proxy guard (pbrt_loader.h:205-272); this benchmark demonstrates
the same scale class on TPU: a procedurally displaced sphere at ~1.004M
triangles (10x the config-#4 stress scene), streamed from HBM by the
8-ray-group cluster-culled kernel — nothing in the kernel is
VMEM-bounded by triangle count. Reports host build times (clustering,
packs), first-pass compile-excluded render rate, and writes a frame.

The 19 MB PLY is generated on demand into /tmp (not committed).
With --tag 2m (--n 1025, ~2.1M triangles) the scene renders as ONE
pack since the 21-bit cluster ids + chunked schedule streaming
(round 4); --ab-parts forces the partitioned path for comparison.
The reference refuses >2M-triangle PBRT scenes entirely and draws a
bounding-box proxy (pbrt_loader.h:205-272); here the same class of
scene renders for real. --n picks a different tessellation — used to
demonstrate the compile-cache shape bucketing (a nearby scene size
lands in the same cluster bucket and skips the remote compile).

Usage: python benchmarks/stress1m.py [--spp 8] [--res 256] [--tag 2m]
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
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--tag", default="1m")
    ap.add_argument("--n", type=int, default=0,
                    help="sphere tessellation (default: 709 for 1m, "
                         "1025 for 2m)")
    ap.add_argument("--ab-parts", action="store_true",
                    help="ALSO time a 3-way partitioned CulledScene in "
                         "the same process (controls for environment "
                         "drift between runs)")
    ap.add_argument("--ab-balance", action="store_true",
                    help="ALSO time balance_lanes=2 and =1 in the same "
                         "process: wider calls amortize the per-call "
                         "fixed costs (schedule sort, attr gather, "
                         "glue) that grow with cluster count")
    args = ap.parse_args()
    n_tess = args.n or {"1m": 709, "2m": 1025}.get(args.tag, 709)

    sys.path.insert(0, os.path.join(HERE, "..", "scenes"))
    from generate_stress import generate

    import numpy as np

    work = f"/tmp/tpt_stress{args.tag}"
    os.makedirs(work, exist_ok=True)
    pbrt = os.path.join(work, f"stress{args.tag}.pbrt")
    if not os.path.exists(pbrt):
        pbrt = generate(work, tag=args.tag, n=n_tess)

    from tpu_pathtracer.ops.intersect_pallas import CulledScene
    from tpu_pathtracer.render.camera import CameraController
    from tpu_pathtracer.render.renderer import (
        ProgressiveRenderer,
        RenderSettings,
    )
    from tpu_pathtracer.scene.pbrt_loader import parse_pbrt
    from tpu_pathtracer.utils.png import write_png_bottom_up

    t0 = time.time()
    # Lift the reference-parity 2M proxy guard (pbrt_loader.h:205):
    # the partitioned CulledScene is built to render past it for real.
    scene = parse_pbrt(pbrt, max_triangles=1 << 31)
    geom = scene.prims.build()
    parse_s = time.time() - t0
    print(f"parsed {geom.num_tris} tris in {parse_s:.1f} s")

    t0 = time.time()
    cs = CulledScene(geom)
    build_s = time.time() - t0
    n_clusters = sum(int(p[1].shape[0]) for p in cs.parts)
    print(f"CulledScene (median-split clusters + packs): {build_s:.1f} s,"
          f" {n_clusters} clusters in {len(cs.parts)} part(s)")

    eye, tgt, up = scene.camera_lookat
    cam = CameraController(
        lookfrom=np.array(eye, np.float32),
        lookat=np.array(tgt, np.float32),
        vup=np.array(up, np.float32),
        vfov=scene.camera_fov or 40.0,
        aspect=1.0,
    ).build()
    s = RenderSettings(
        width=args.res, height=args.res, max_depth=args.depth,
        spp_per_pass=args.spp, ray_chunk=1 << 16, wavefront=True,
        balance_lanes=4,
    )
    r = ProgressiveRenderer(geom, cam, s, culled=cs)
    t0 = time.time()
    r.step()   # compile + warmup
    compile_s = time.time() - t0
    r.reset_stats()
    t0 = time.time()
    passes = 0
    while passes < 3 or (time.time() - t0 < 8.0 and passes < 12):
        r.step(block=False)
        passes += 1
    r.sync()
    rate = r.mrays_per_sec
    print(f"compile+warmup {compile_s:.1f} s; {passes} passes -> "
          f"{rate:.2f} Mrays/s")

    img = r.film.to_srgb()
    out = os.path.join(HERE, "..", "outputs", f"stress{args.tag}.png")
    write_png_bottom_up(out, np.asarray(img))
    print(f"wrote {out}")

    result = {
        "tris": int(geom.num_tris),
        "clusters": n_clusters,
        "parts": len(cs.parts),
        "parse_s": round(parse_s, 1),
        "culled_build_s": round(build_s, 1),
        "compile_s": round(compile_s, 1),
        "mrays_per_sec": round(rate, 2),
        "settings": f"{args.res}^2@{args.spp}spp depth{args.depth}",
    }

    if args.ab_parts:
        # same-process A/B: a forced 3-part scene vs the single pack,
        # immune to tunnel/compile-service drift between runs
        cap = (geom.num_tris // 3 // 128 + 1) * 128
        cs_p = CulledScene(geom, max_tris_per_part=cap)
        r_p = ProgressiveRenderer(geom, cam, s, culled=cs_p)
        r_p.step()
        r_p.reset_stats()
        t0 = time.time()
        passes = 0
        while passes < 3 or (time.time() - t0 < 8.0 and passes < 12):
            r_p.step(block=False)
            passes += 1
        r_p.sync()
        result["mrays_per_sec_3part"] = round(r_p.mrays_per_sec, 2)
        print(f"A/B 3-part ({len(cs_p.parts)} parts): "
              f"{result['mrays_per_sec_3part']} Mrays/s "
              f"vs single-pack {result['mrays_per_sec']}")
    if args.ab_balance:
        import dataclasses as _dc

        for k in (2, 1):
            s_k = _dc.replace(s, balance_lanes=k)
            r_k = ProgressiveRenderer(geom, cam, s_k, culled=cs)
            r_k.step()
            r_k.reset_stats()
            t0 = time.time()
            passes = 0
            while passes < 3 or (time.time() - t0 < 8.0 and passes < 12):
                r_k.step(block=False)
                passes += 1
            r_k.sync()
            result[f"mrays_per_sec_k{k}"] = round(r_k.mrays_per_sec, 2)
            print(f"A/B balance_lanes={k}: "
                  f"{result[f'mrays_per_sec_k{k}']} Mrays/s "
                  f"vs K=4 {result['mrays_per_sec']}")

    with open(os.path.join(HERE, f"stress{args.tag}_result.json"),
              "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
