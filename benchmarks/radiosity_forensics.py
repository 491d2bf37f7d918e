"""Root-cause the radiosity sweep residual (VERDICT round-2, weak #3).

The reference's sweep PNGs (cbox_sub{N}_step{M}.png) are flat-shaded
per primitive: every interior pixel of prim i displays
sqrt(min(Le_i + B_i, 1)) (render_radiosity, integrator.h:460-504).
So we can invert the display transform and read the reference's actual
per-primitive B vector off its PNG — no camera-noise, no MC-noise, no
edge-mask arguments — and compare it against candidate solves:

  * mc64    — our solver, reference defaults (MC FF, 64 samples/pair)
  * mc64b   — same, independent RNG stream (noise yardstick)
  * analytic— our solver, point-to-point centroid FF kernel
             (calculate_form_factors_kernel, form_factors.h:354-404)

plus knob variants (no adaptive sampling, no FF clamp, per-sample
estimator) when --variants is set.

Per-prim extraction: render a primary-hit prim-id map at the reference
camera, erode it so only pixels >=2px inside a prim survive, take the
median reference color over each prim's pixels, invert gamma. Channels
at the u8 clamp (>=253) are excluded (the min(...,1) display clamp).

Usage:
  python benchmarks/radiosity_forensics.py --sub 0 [--cpu] [--variants]
Writes benchmarks/radiosity_forensics_result.json (accumulates by sub).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from eval_vs_reference import (  # noqa: E402
    W, H, build_geom, camera, load_ref_png,
)

HERE = os.path.dirname(os.path.abspath(__file__))
RESULT = os.path.join(HERE, "radiosity_forensics_result.json")


def prim_id_map(geom) -> np.ndarray:
    """(H, W) int32 primary-hit prim id at pixel centers, -1 on miss;
    row 0 = top (matching the reference PNG orientation)."""
    import jax
    import jax.numpy as jnp

    from tpu_pathtracer.render.integrator import trace_primary

    cam = camera()
    ids = np.full((H * W,), -1, np.int32)
    chunk = 1 << 16

    @jax.jit
    def run(lane):
        x = (lane % W).astype(jnp.float32)
        y = (lane // W).astype(jnp.float32)
        u = (x + 0.5) / W
        v = (y + 0.5) / H
        o, d = cam.get_rays(u, v)
        hit = trace_primary(geom, o, d)
        return jnp.where(hit.valid, hit.prim, -1)

    for s in range(0, H * W, chunk):
        lane = jnp.arange(s, min(s + chunk, H * W), dtype=jnp.int32)
        pad = chunk - lane.shape[0]
        if pad:
            lane = jnp.concatenate([lane, jnp.zeros((pad,), jnp.int32)])
        out = np.asarray(run(lane))
        ids[s:s + chunk - pad] = out[:chunk - pad]
    return ids.reshape(H, W)[::-1]  # flip to row0=top


def erode(mask: np.ndarray, it: int = 2) -> np.ndarray:
    m = mask.copy()
    for _ in range(it):
        e = m.copy()
        e[1:, :] &= m[:-1, :]
        e[:-1, :] &= m[1:, :]
        e[:, 1:] &= m[:, :-1]
        e[:, :-1] &= m[:, 1:]
        m = e
    return m


def extract_ref_b(ref_u8: np.ndarray, ids: np.ndarray, n: int,
                  emission: np.ndarray):
    """Per-prim displayed value from the PNG, gamma-inverted, Le removed.

    Returns (b_ref (N,3), ok (N,3) bool, npix (N,))."""
    b = np.full((n, 3), np.nan, np.float64)
    ok = np.zeros((n, 3), bool)
    npx = np.zeros((n,), np.int64)
    for i in range(n):
        m = erode(ids == i, 2)
        npx[i] = int(m.sum())
        if npx[i] < 25:
            continue
        med = np.median(ref_u8[m].astype(np.float64), axis=0)
        val = (med / 255.99) ** 2          # = min(Le + B, 1)
        ok[i] = med < 253.0                # clamp excluded
        b[i] = val - emission[i]
    return b, ok, npx


def summarize(tag, b_ours, b_ref, ok):
    sel = ok & np.isfinite(b_ref)
    d = (np.asarray(b_ours, np.float64) - b_ref)[sel]
    r = b_ref[sel]
    rel = float(np.sqrt((d ** 2).mean()) / max(np.sqrt((r ** 2).mean()),
                                               1e-12))
    return {
        "rel_rmse_B": round(rel, 5),
        "mean_signed": round(float(d.mean()), 6),
        "max_abs": round(float(np.abs(d).max()), 6),
        "channels": int(sel.sum()),
    }


def per_sample_ff(geom, key, n_samples, packs):
    """Unbiased double-area MC form factors (experiment):
    F_ij = A_j/pi * mean_s[vis * ci * cj / d^2], clamp [0,1], no
    adaptive sample counts. Same sampling/visibility machinery as
    mc_form_factors, different combiner."""
    import jax
    import jax.numpy as jnp

    from tpu_pathtracer.core.math_utils import PI, dot
    from tpu_pathtracer.render.radiosity import (
        _occluded_dispatch,
        _pair_culling,
        sample_uniform_on_prims,
    )

    n = geom.num_prims
    rc = min(16, n)

    @jax.jit
    def do_rows(rows):
        dn_c, dist_c, cos_i_c, cos_j_c, facing = _pair_culling(geom, rows)
        ni = geom.normal[rows][:, None, :]
        nj = geom.normal[None, :, :]
        rows_b = jnp.broadcast_to(rows[:, None], dist_c.shape)
        cols_b = jnp.broadcast_to(
            jnp.arange(n)[None, :], dist_c.shape)

        def one_sample(acc, s):
            skey = jax.random.fold_in(jax.random.fold_in(key, rows[0]), s)
            u = jax.random.uniform(skey, (4,) + dist_c.shape)
            p_i = sample_uniform_on_prims(geom, rows_b, u[0], u[1])
            p_j = sample_uniform_on_prims(geom, cols_b, u[2], u[3])
            seg = p_j - p_i
            r = jnp.linalg.norm(seg, axis=-1)
            sd = seg / jnp.maximum(r, 1e-20)[..., None]
            ct_i = dot(ni, sd)
            ct_j = -dot(nj, sd)
            active = (r >= 1e-6) & (ct_i > 0.0) & (ct_j > 0.0) & facing
            flat = lambda x: x.reshape(-1, *x.shape[2:])
            blocked = _occluded_dispatch(
                geom, flat(p_i + ni * 1e-4 * jnp.ones_like(sd)),
                flat(sd), flat(r - 2e-4), flat(rows_b), flat(cols_b),
                packs,
            ).reshape(r.shape)
            ok = active & ~blocked
            est = jnp.where(
                ok, ct_i * ct_j / jnp.maximum(r * r, 1e-12), 0.0)
            return acc + est, None

        acc, _ = jax.lax.scan(
            one_sample, jnp.zeros(dist_c.shape, jnp.float32),
            jnp.arange(n_samples))
        ff = acc / n_samples * geom.area[None, :] / PI
        return jnp.clip(ff, 0.0, 1.0)

    import numpy as _np
    npad = ((n + rc - 1) // rc) * rc
    row_ids = _np.where(_np.arange(npad) < n, _np.arange(npad), 0)
    parts = [do_rows(jnp.asarray(row_ids[s:s + rc], jnp.int32))
             for s in range(0, npad, rc)]
    return jnp.concatenate(parts)[:n]


def _displays(emission):
    import numpy as _np

    def sqrt_leb(b):
        c = _np.minimum(b + emission, 1.0)
        return 255.99 * _np.sqrt(_np.maximum(c, 0.0))

    def rh22_b(b):
        c = _np.maximum(b, 0.0)
        return 255.99 * (c / (1.0 + c)) ** (1 / 2.2)

    def rh20_b(b):
        c = _np.maximum(b, 0.0)
        return 255.99 * _np.sqrt(c / (1.0 + c))

    def rh22_leb(b):
        c = _np.maximum(b + emission, 0.0)
        return 255.99 * (c / (1.0 + c)) ** (1 / 2.2)

    return {"sqrt_LeB": sqrt_leb, "rh22_B": rh22_b,
            "rh20_B": rh20_b, "rh22_LeB": rh22_leb}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sub", type=int, default=0)
    ap.add_argument("--step", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--variants", action="store_true")
    ap.add_argument("--mc-samples", type=int, default=64)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    from tpu_pathtracer.ops.intersect_pallas import (
        pack_prim_ids,
        pack_triangles,
    )
    from tpu_pathtracer.render.radiosity import (
        analytic_form_factors,
        mc_form_factors,
        radiosity_step,
        solve_radiosity,
    )

    geom = build_geom(args.sub)
    n = geom.num_prims
    emission = np.asarray(geom.emission, np.float64)
    ids = prim_id_map(geom)
    ref = load_ref_png(f"cbox_sub{args.sub}_step{args.step}.png")
    b_ref, ok, npx = extract_ref_b(ref, ids, n, emission)

    packs = None
    if not args.cpu:
        packs = (pack_triangles(geom), pack_prim_ids(geom))

    def solve_from_ff(ff, steps):
        rad = geom.emission
        unshot = geom.emission
        for _ in range(steps):
            rad, unshot = radiosity_step(geom, ff, rad, unshot)
        return np.asarray(rad)

    out = {"n_prims": n, "extracted_prims": int((npx >= 25).sum())}

    candidates = {}
    sol = solve_radiosity(geom, jax.random.key(12345),
                          num_iterations=args.step,
                          mc_samples=args.mc_samples,
                          occlusion_packs=packs)
    candidates["mc64"] = np.asarray(sol.radiosity)
    sol_b = solve_radiosity(geom, jax.random.key(99991),
                            num_iterations=args.step,
                            mc_samples=args.mc_samples,
                            occlusion_packs=packs)
    candidates["mc64b"] = np.asarray(sol_b.radiosity)
    ff_an = analytic_form_factors(geom, occlusion_packs=packs)
    candidates["analytic"] = solve_from_ff(ff_an, args.step)

    if args.variants:
        # iteration-count neighbours: is "stepM" really M iterations?
        ff_mc = sol.form_factors
        candidates["mc64_iters+1"] = solve_from_ff(ff_mc, args.step + 1)
        candidates["mc64_iters-1"] = solve_from_ff(
            ff_mc, max(args.step - 1, 0)
        )
        candidates["analytic_iters+1"] = solve_from_ff(
            ff_an, args.step + 1
        )
        # per-sample (unbiased double-area) estimator:
        # F = A_j/pi * mean_s[vis * ci * cj / d^2], clamped [0,1].
        # The current reference kernel uses ratio-of-averages
        # (form_factors.h:339-347), but its published PNGs may predate
        # it — for ADJACENT large patches the per-sample integrand is
        # ~1/d^2 singular and the clamp bites, making everything
        # brighter at low subdivision.
        ff_ps = per_sample_ff(geom, jax.random.key(12345),
                              args.mc_samples, packs)
        candidates["per_sample"] = solve_from_ff(ff_ps, args.step)
        candidates["per_sample_i10"] = solve_from_ff(ff_ps, 10)

    for tag, b in candidates.items():
        out[tag] = summarize(tag, b, b_ref, ok)
    # noise yardstick between our own two MC streams
    sel = ok & np.isfinite(b_ref)
    d = (candidates["mc64"].astype(np.float64)
         - candidates["mc64b"].astype(np.float64))[sel]
    r = b_ref[sel]
    out["mc_self_noise"] = round(
        float(np.sqrt((d ** 2).mean())
              / max(np.sqrt((r ** 2).mean()), 1e-12)), 5)

    if n <= 64:
        tab = []
        for i in range(n):
            if npx[i] < 25:
                continue
            tab.append({
                "prim": i,
                "ref_B": [round(float(x), 4) for x in b_ref[i]],
                "mc64_B": [round(float(x), 4)
                           for x in candidates["mc64"][i]],
                "analytic_B": [round(float(x), 4)
                               for x in candidates["analytic"][i]],
                "clamped": [bool(not x) for x in ok[i]],
            })
        out["per_prim"] = tab

    data = {}
    if os.path.exists(RESULT):
        with open(RESULT) as f:
            data = json.load(f)
    data[f"sub{args.sub}_step{args.step}"] = out
    with open(RESULT, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "per_prim"},
                     indent=1))


if __name__ == "__main__":
    main()
