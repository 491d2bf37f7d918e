"""Equal-spp RMSE evaluation: guided sampling vs BSDF sampling.

The BASELINE accuracy metric is "<=1% RMSE vs the reference at equal spp at
convergence". The CUDA reference cannot execute in this environment, so
ground truth is this renderer's own converged accumulation (all estimators
here are unbiased for the same integral and statistically validated against
closed forms in tests/; at 1024+ spp the converged image is the common
fixed point). This harness:

  1. renders (or loads) a high-spp ground truth;
  2. renders each sampling mode at a low spp budget;
  3. reports per-mode RMSE relative to ground truth — demonstrating the
     radiosity-guided variance reduction that is the reference's research
     contribution.

Run: python benchmarks/eval_rmse.py [--res 256] [--gt-spp 4096]
     [--test-spp 64] [--out eval_rmse.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def render_mode(mode: str, spp: int, res: int, seed: int,
                subdivision: int = 1, mis_fraction: float = 0.5):
    from tpu_pathtracer.app import App
    from tpu_pathtracer.utils.config import Config

    cfg = Config(
        scene="cbox_quads", width=res, height=res, spp=spp, max_depth=5,
        sampling_mode=mode, subdivision=subdivision,
        radiosity_iterations=10, mis_bsdf_fraction=mis_fraction,
        mc_samples=64, ray_chunk=1 << 16,
        spp_per_pass=min(32, spp), seed=seed,
    )
    app = App(cfg)
    r = app.renderer()
    r.render(spp)
    return np.asarray(r.film.mean_radiance())


def rel_rmse(img: np.ndarray, gt: np.ndarray) -> float:
    err = np.sqrt(np.mean((img - gt) ** 2))
    scale = max(float(np.sqrt(np.mean(gt**2))), 1e-9)
    return float(err / scale)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--gt-spp", type=int, default=4096)
    p.add_argument("--test-spp", type=int, default=64)
    p.add_argument("--subdivision", type=int, default=1)
    p.add_argument("--mis-fraction", type=float, default=0.5)
    p.add_argument("--out", type=str, default="")
    args = p.parse_args(argv)

    gt_path = os.path.join(
        os.path.dirname(__file__),
        f"gt_cbox_{args.res}_{args.gt_spp}.npy",
    )
    if os.path.exists(gt_path):
        gt = np.load(gt_path)
        print(f"loaded ground truth {gt_path}")
    else:
        print(f"rendering ground truth ({args.gt_spp} spp)...")
        gt = render_mode("bsdf", args.gt_spp, args.res, seed=999)
        np.save(gt_path, gt)

    results = {}
    for mode in ("bsdf", "radiosity", "mis"):
        img = render_mode(mode, args.test_spp, args.res, seed=7,
                          subdivision=args.subdivision,
                          mis_fraction=args.mis_fraction)
        r = rel_rmse(img, gt)
        results[mode] = r
        print(f"{mode:<10} @ {args.test_spp} spp: rel RMSE {r:.4f}")

    if results["mis"] < results["bsdf"]:
        gain = results["bsdf"] / results["mis"]
        print(f"guided MIS reduces RMSE {gain:.2f}x vs BSDF at equal spp")
    out = {
        "resolution": args.res,
        "gt_spp": args.gt_spp,
        "test_spp": args.test_spp,
        "rel_rmse": results,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
