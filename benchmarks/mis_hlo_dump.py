"""Dump the compiled HLO of the guided-MIS wavefront pass and print the
bodies of named ops (the ones the trace profiler flags as hot).

The round-3 trace (trace_profile_result.json, cbox_mis) shows the MIS
pass spending ~48% of device time in ops classified dma/copy and two big
fusions (fusion.157 8.7 ms, fusion.161 4.5 ms over 80 calls) dwarfing the
intersect kernel (5.2 ms). This script re-lowers the SAME program
(cbox_quads, 512^2, spp-4, ray_chunk 64k, SAMPLING_MIS) and prints those
fusion bodies so the cost can be attributed to source-level operations.

Usage: python benchmarks/mis_hlo_dump.py [--ops fusion.157,fusion.161]
       [--summary]   (per-op category sizes over the whole module)

NOTE: fusion numbers are assigned per compile — the --ops default
reflects ONE specific XLA build and must be re-read from a fresh trace
(trace_profile.py) after any XLA upgrade or program change. When a named
op is absent the script now lists the largest fusions instead of
silently printing NOT FOUND.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ops", type=str,
                   default="fusion.157,fusion.161,copy.46,"
                           "broadcast_add_fusion.8,bitcast_select_fusion.3,"
                           "cosine_multiply_fusion.5")
    p.add_argument("--out", type=str, default="/tmp/mis_pass_hlo.txt")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tpu_pathtracer.core.constants import SAMPLING_MIS
    from tpu_pathtracer.core.math_utils import luminance
    from tpu_pathtracer.ops.guiding import build_cdfs
    from tpu_pathtracer.ops.intersect_pallas import (
        pack_attributes,
        pack_triangles,
    )
    from tpu_pathtracer.render.camera import CameraController
    from tpu_pathtracer.render.film import Film
    from tpu_pathtracer.render.radiosity import solve_radiosity
    from tpu_pathtracer.render.renderer import RenderSettings, render_pass
    from tpu_pathtracer.scene.builtin import cornell_box

    geom = cornell_box("quads").build()
    cam = CameraController.default().build()
    sol = solve_radiosity(geom, jax.random.key(12345),
                          num_iterations=10, mc_samples=64)
    cdfs = build_cdfs(luminance(sol.rad_grid))
    s = RenderSettings(width=512, height=512, max_depth=5,
                       spp_per_pass=4, ray_chunk=1 << 16,
                       sampling_mode=SAMPLING_MIS)
    film = Film.create(s.width, s.height)
    lowered = render_pass.lower(
        geom, cdfs, cam, film, jax.random.key(0),
        jnp.float32(0.5), s,
        tri_pack=pack_triangles(geom), attr_pack=pack_attributes(geom),
    )
    txt = lowered.compile().as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {args.out}")

    missing = []
    for name in args.ops.split(","):
        name = name.strip()
        # fused computation body: %fused_computation.N or the call site
        m = re.search(
            rf"^\s*%?{re.escape(name)} = .*$", txt, re.MULTILINE
        )
        if not m:
            print(f"\n=== {name}: NOT FOUND ===")
            missing.append(name)
            continue
        line = m.group(0)
        print(f"\n=== {name} (call site) ===\n{line[:600]}")
        cm = re.search(r"calls=%?([\w.\-]+)", line)
        if cm:
            body = cm.group(1)
            # Bodies are brace-delimited; the closing brace of a
            # computation sits alone at column 0 (inner instruction
            # lines are indented), so anchor it as ^} followed only by
            # optional spaces/comments to end-of-line — a '}' embedded
            # at the start of a wrapped operand line cannot match.
            bm = re.search(
                rf"^%?{re.escape(body)} [^\n]*\{{(.*?)^\}} *(?://.*)?$",
                txt, re.MULTILINE | re.DOTALL,
            )
            if bm:
                lines = bm.group(1).strip("\n").split("\n")
                print(f"--- body {body}: {len(lines)} instrs ---")
                for ln in lines[:80]:
                    print(ln[:200])
                if len(lines) > 80:
                    print(f"... (+{len(lines) - 80} more)")
    if missing:
        # Fusion numbering changed since the default --ops was recorded:
        # fall back to the biggest fusions in THIS compile so the run
        # still attributes cost somewhere useful.
        sizes = {}
        for bm in re.finditer(
            r"^%?(\w*fused_computation[\w.\-]*) [^\n]*\{(.*?)^\} *$",
            txt, re.MULTILINE | re.DOTALL,
        ):
            sizes[bm.group(1)] = bm.group(2).count("\n")
        top = sorted(sizes.items(), key=lambda kv: -kv[1])[:10]
        print(f"\n{len(missing)} requested op(s) absent in this compile "
              "(fusion numbers are per-build). Largest fusion bodies "
              "here:")
        for n, sz in top:
            print(f"  {n}: {sz} instrs")
    return 0


if __name__ == "__main__":
    sys.exit(main(argv=None))
