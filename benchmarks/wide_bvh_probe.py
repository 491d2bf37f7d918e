"""Wide-BVH (BVH8) traversal economics on TPU: the measured close-out.

VERDICT r4 #2 names a Pallas BVH8 traversal as the structural
alternative to the cluster schedule for stress100k ("per-ray test
count ~10x below any cluster schedule"). This probe quantifies that
design on the real scene and ray sets WITHOUT building the kernel,
because its viability is decided by arithmetic the host can measure:

1. Build the production binary BVH (ops.bvh.build_bvh, LEAF_SIZE=4),
   collapse it to BVH8 (repeatedly expand the largest-area inner
   child until 8 children per supernode).
2. Trace the cluster-quality ray sets (coherent camera / incoherent
   bounce-shaped) through BVH8 per ray with ordered near-first
   descent and closest-hit early-out; count node visits + leaf tri
   tests. This is the floor any TPU kernel of this design pays.
3. The TPU formulation must fill 128 VPU lanes: 8 children x 16 rays
   per visit. Rays therefore traverse in 16-ray GROUPS, and a group
   visits the UNION of its members' node sets (divergence inflation —
   measured here, not assumed). Groups at different tree nodes cannot
   share vector work, so group chains execute SERIALLY on the one
   tensor core, exactly like the grouped walk's schedule entries.
4. Convert to milliseconds with the production-calibrated clock
   (58 cycles/pair at the measured walk rate — RESULTS round 2/4) and
   compare against the measured cluster walk + prepass on the same
   batch shape.

Cost model per BVH8 group visit: ~35 VPU cycles (6 mul + 6 fma + 6
min/max + compares on the (8 children x 16 rays) = 128-lane slab,
plus t-sort bookkeeping on the scalar core, optimistically fully
overlapped); per leaf visit: one 58-cycle 128-lane triangle op
(16 rays x up to 8 tris — leaves hold <= 4-8 after collapse). DMA,
stack spills, and per-visit node fetches are costed at ZERO — the
probe is an upper bound on the design's speed.

Usage: python benchmarks/wide_bvh_probe.py [--rays 4096]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

HERE = os.path.dirname(os.path.abspath(__file__))

VISIT_CYCLES = 35     # slab of 8 children vs 16 rays (128 lanes)
LEAF_CYCLES = 58      # one 128-lane Moller op (16 rays x 8 tris)
CLOCK_HZ = 0.96e9     # calibrated: 58 cyc/pair at measured walk rate


def collapse_bvh8(nmin, nmax, left, right, count):
    """Binary -> BVH8 by expanding the largest-surface-area inner
    child until each supernode has 8 children (or all leaves).
    Returns (children: list[list[int]] binary node ids per supernode,
    super_of: binary root ids of each supernode's children)."""

    def area(i):
        e = np.maximum(nmax[i] - nmin[i], 0)
        return 2 * (e[0] * e[1] + e[1] * e[2] + e[0] * e[2])

    supers = []          # each entry: list of binary node ids (children)
    work = [0]
    super_id = {}        # binary root id -> supernode index
    while work:
        root = work.pop()
        if count[root] > 0:       # leaf root: trivial supernode
            super_id[root] = len(supers)
            supers.append([root])
            continue
        ch = [left[root], right[root]]
        while len(ch) < 8:
            inner = [c for c in ch if count[c] == 0]
            if not inner:
                break
            big = max(inner, key=area)
            ch.remove(big)
            ch += [left[big], right[big]]
        super_id[root] = len(supers)
        supers.append(ch)
        for c in ch:
            if count[c] == 0:
                work.append(c)
    return supers, super_id


def traverse(nmin, nmax, left, right, count, first_of, supers,
             super_id, tri_v0, tri_e1, tri_e2, tri_order,
             o, d, t_min=1e-4):
    """Per-ray BVH8 traversal with ordered descent + early-out.
    Returns (node_visits, leaf_ops, tri_tests, visit_sets)."""
    inv = 1.0 / np.where(np.abs(d) > 1e-8, d, 1e-8)
    nv = np.zeros(o.shape[0], np.int64)
    lv = np.zeros(o.shape[0], np.int64)
    tt = np.zeros(o.shape[0], np.int64)
    vsets = []
    for r in range(o.shape[0]):
        orr, ir = o[r], inv[r]
        t_best = np.inf
        stack = [0]          # supernode indices
        visited = set()
        while stack:
            s = stack.pop()
            visited.add(s)
            nv[r] += 1
            ch = supers[s]
            cmin = nmin[ch]
            cmax = nmax[ch]
            t1 = (cmin - orr) * ir
            t2 = (cmax - orr) * ir
            tn = np.maximum(np.minimum(t1, t2).max(-1), t_min)
            tf = np.maximum(t1, t2).min(-1)
            hit = (tf >= tn) & (tn < t_best)
            order = np.argsort(-tn)          # far first (pop near)
            for k in order:
                if not hit[k]:
                    continue
                c = ch[k]
                if count[c] > 0:             # leaf: test triangles
                    lv[r] += 1
                    ids = tri_order[first_of[c]:first_of[c] + count[c]]
                    tt[r] += len(ids)
                    for ti in ids:
                        v0, e1, e2 = tri_v0[ti], tri_e1[ti], tri_e2[ti]
                        p = np.cross(d[r], e2)
                        det = e1 @ p
                        if abs(det) < 1e-12:
                            continue
                        f = 1.0 / det
                        tv = orr - v0
                        u = f * (tv @ p)
                        if u < 0 or u > 1:
                            continue
                        q = np.cross(tv, e1)
                        v = f * (d[r] @ q)
                        if v < 0 or u + v > 1:
                            continue
                        th = f * (e2 @ q)
                        if t_min <= th < t_best:
                            t_best = th
                else:
                    stack.append(super_id[c])
        vsets.append(visited)
    return nv, lv, tt, vsets


def group_union(vsets, leafops, g):
    """Mean per-group union visit count + leaf ops at group size g
    (a group visits a node if ANY member does; leaf ops likewise
    bounded below by the max member — use union of leaf visits too)."""
    n = len(vsets)
    tot = 0
    for s in range(0, n, g):
        u = set()
        for r in range(s, min(s + g, n)):
            u |= vsets[r]
        tot += len(u)
    return tot / (n // g)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=4096)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from benchmarks.cluster_quality import group_pairs, leaf_bounds
    import tpu_pathtracer.ops.intersect_pallas as ip
    from tpu_pathtracer.ops.bvh import build_bvh
    from tpu_pathtracer.render.camera import CameraController
    from tpu_pathtracer.scene.pbrt_loader import parse_pbrt

    scene = parse_pbrt(os.path.join(HERE, "..", "scenes/stress100k.pbrt"))
    geom = scene.prims.build()
    bvh = build_bvh(geom)
    nmin = np.asarray(bvh.node_min)
    nmax = np.asarray(bvh.node_max)
    left = np.asarray(bvh.node_left)
    right = np.asarray(bvh.node_right)
    count = np.asarray(bvh.node_count)
    first_of = left                      # leaves: left = first offset
    tri_order = np.asarray(bvh.tri_order)
    v0 = np.asarray(geom.tri_v0)
    e1 = np.asarray(geom.tri_e1)
    e2 = np.asarray(geom.tri_e2)

    supers, super_id = collapse_bvh8(nmin, nmax, left, right, count)
    print(f"tris {v0.shape[0]}  binary nodes {len(count)}  "
          f"BVH8 supernodes {len(supers)}", flush=True)

    n = args.rays
    eye, tgt, up = scene.camera_lookat
    cam = CameraController(
        lookfrom=np.array(eye, np.float32),
        lookat=np.array(tgt, np.float32),
        vup=np.array(up, np.float32),
        vfov=scene.camera_fov or 40.0, aspect=1.0,
    ).build()
    side = int(np.sqrt(n))
    u = (np.arange(n) % side + 0.5) / side
    v = (np.arange(n) // side + 0.5) / side
    o_c, d_c = (np.asarray(x) for x in cam.get_rays(
        jnp.asarray(u), jnp.asarray(v)))

    tmin3 = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
    tmax3 = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
    rng = np.random.default_rng(3)
    lo, hi = tmin3.min(0), tmax3.max(0)
    o_i = (rng.random((n, 3)) * (hi - lo) + lo).astype(np.float32)
    d_i = rng.standard_normal((n, 3)).astype(np.float32)
    d_i /= np.linalg.norm(d_i, axis=-1, keepdims=True)

    order = ip.median_split_order(geom)
    cmin, cmax = leaf_bounds(tmin3, tmax3, order, ip.TRI_CHUNK)

    res = {"tris": int(v0.shape[0]), "bvh8_nodes": len(supers),
           "rays": n}
    for tag, o, d in (("coherent", o_c, d_c), ("incoherent", o_i, d_i)):
        nv, lv, tt, vsets = traverse(
            nmin, nmax, left, right, count, first_of, supers,
            super_id, v0, e1, e2, tri_order, o, d,
        )
        g16 = group_union(vsets, lv, 16)
        pairs8, _ = group_pairs(cmin, cmax, o, d, group=8)
        pairs1, _ = group_pairs(cmin, cmax, o, d, group=1)
        # serial upper-bound ms for a 16k-ray call of this batch shape
        groups_16k = 16384 // 16
        # leaf ops at group granularity >= per-ray mean (optimistic:
        # use per-ray mean — real unions only inflate it)
        ms = groups_16k * (g16 * VISIT_CYCLES
                           + lv.mean() * LEAF_CYCLES) / CLOCK_HZ * 1e3
        cl_pairs_16k = pairs8 / (n // 8) * (16384 // 8)
        cl_ms = cl_pairs_16k * 58 / CLOCK_HZ * 1e3
        res[tag] = {
            "bvh8_visits_per_ray": round(float(nv.mean()), 2),
            "bvh8_leafops_per_ray": round(float(lv.mean()), 2),
            "bvh8_tritests_per_ray": round(float(tt.mean()), 2),
            "bvh8_visits_per_16group_union": round(g16, 2),
            "cluster_pairs_per_8group": round(pairs8 / (n // 8), 2),
            "cluster_incidence_per_ray": round(pairs1 / n, 2),
            "cluster_tritests_per_ray": round(pairs1 / n * 128, 1),
            "bvh8_serial_ms_per_16k_call_LOWER_BOUND": round(ms, 3),
            "cluster_walk_ms_per_16k_call_measured_model":
                round(cl_ms, 3),
        }
        print(tag, json.dumps(res[tag], indent=1), flush=True)

    with open(os.path.join(HERE, "wide_bvh_probe_result.json"),
              "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: v for k, v in res.items()
                      if not isinstance(v, dict)}))


if __name__ == "__main__":
    main()
