"""Refit the orbit camera for the reference's PT render (cbox_pt_23.png).

The reference app orbits its camera by hand (updateCameraOrbit,
sensor.h:56-67); each published PNG may sit at a different (yaw, pitch,
radius, fov). Round 2 fitted the radiosity-sweep pose from
cbox_sub2_step5.png; the PT capture need not share it — the full-frame
PT residual shows the spatially-structured signature of a small pose
difference (benchmarks/eval_vs_reference_result.json pt/downsampled_*).

Method (same features as round 2): the projected bounding boxes of the
light quad (brightest pixels) and of the room's visible silhouette
(non-black region), matched by Nelder-Mead over (yaw, pitch, R, fov)
using a low-res primary-hit id map per candidate.

Usage: python benchmarks/fit_pt_camera.py [--png cbox_pt_23.png]
Prints the fitted pose; pass to eval via env or edit.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from eval_vs_reference import W, H, build_geom, load_ref_png  # noqa: E402

LOW_W, LOW_H = 271, 256  # ~W/4 x H/4


def ref_features(png):
    img = load_ref_png(png).astype(np.float64)
    bright = img.min(-1) > 235
    nz = img.max(-1) > 4
    feats = []
    for m in (bright, nz):
        ys, xs = np.where(m)
        feats += [xs.min(), xs.max(), ys.min(), ys.max()]
    return np.array(feats, np.float64)


def make_camera(yaw, pitch, r, fov):
    from tpu_pathtracer.render.camera import CameraController

    yr, pr = np.radians(yaw), np.radians(pitch)
    look_at = np.array([0.0, 2.5, 0.0])
    origin = look_at + r * np.array(
        [np.cos(pr) * np.cos(yr), np.sin(pr), np.cos(pr) * np.sin(yr)])
    return CameraController(
        lookfrom=origin.astype(np.float32),
        lookat=look_at.astype(np.float32),
        vup=np.array([0, 1, 0], np.float32),
        vfov=float(fov), aspect=W / H,
    ).build()


def model_features(geom, light_ids, params):
    import jax
    import jax.numpy as jnp

    from tpu_pathtracer.render.integrator import trace_primary

    cam = make_camera(*params)
    lane = jnp.arange(LOW_W * LOW_H, dtype=jnp.int32)
    x = (lane % LOW_W).astype(jnp.float32)
    y = (lane // LOW_W).astype(jnp.float32)
    u = (x + 0.5) / LOW_W
    v = (y + 0.5) / LOW_H
    o, d = cam.get_rays(u, v)
    hit = trace_primary(geom, o, d)
    ids = np.asarray(jnp.where(hit.valid, hit.prim, -1)).reshape(
        LOW_H, LOW_W)[::-1]
    feats = []
    scale_x, scale_y = W / LOW_W, H / LOW_H
    for m in (np.isin(ids, light_ids), ids >= 0):
        ys, xs = np.where(m)
        if len(xs) == 0:
            return None
        feats += [xs.min() * scale_x, (xs.max() + 1) * scale_x - 1,
                  ys.min() * scale_y, (ys.max() + 1) * scale_y - 1]
    return np.array(feats, np.float64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--png", default="cbox_pt_23.png")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    geom = build_geom(0)
    em = np.asarray(geom.emission).max(-1)
    light_ids = np.where(em > 0)[0]
    target = ref_features(args.png)

    def loss(p):
        f = model_features(geom, light_ids, p)
        if f is None:
            return 1e9
        return float(((f - target) ** 2).mean())

    from scipy.optimize import minimize

    best = None
    for x0 in ([87.8, -3.8, 8.36, 40.5], [90.0, 0.0, 8.5, 40.0]):
        r = minimize(loss, np.array(x0), method="Nelder-Mead",
                     options={"maxiter": 300, "xatol": 1e-3,
                              "fatol": 1e-2})
        if best is None or r.fun < best.fun:
            best = r
    yaw, pitch, rad, fov = best.x
    print(f"fit: yaw={yaw:.3f} pitch={pitch:.3f} R={rad:.4f} "
          f"fov={fov:.3f}  rms_px={np.sqrt(best.fun):.2f}")
    f = model_features(geom, light_ids, best.x)
    print("feat model:", np.round(f, 1))
    print("feat ref:  ", target)


if __name__ == "__main__":
    main()
