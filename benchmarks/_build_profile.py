import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np

from tpu_pathtracer.scene.pbrt_loader import parse_pbrt
t0=time.time(); scene = parse_pbrt("/tmp/tpt_stress2m/stress2m.pbrt", max_triangles=1<<31)
print("parse", round(time.time()-t0,1), flush=True)
t0=time.time(); geom = scene.prims.build()
print("geom build", round(time.time()-t0,1), flush=True)

import tpu_pathtracer.ops.intersect_pallas as ip
t0=time.time(); order = ip.median_split_order(geom)
print("median_split_order", round(time.time()-t0,1), flush=True)

t0=time.time()
tri_pack, cmin, cmax = ip.pack_triangles_ordered(geom, order)
print("pack_triangles_ordered", round(time.time()-t0,1), flush=True)

t0=time.time()
prim = np.asarray(geom.tri_prim)[order]
tpad = tri_pack.shape[1]
at = np.zeros((tpad, 16), np.float32)
t = prim.shape[0]
at[:t, 0:3] = np.asarray(geom.normal)[prim]
at[:t, 3:6] = np.asarray(geom.albedo)[prim]
at[:t, 6:9] = np.asarray(geom.emission)[prim]
at[:t, 9] = np.asarray(geom.material)[prim]
at[:t, 10] = prim
print("attr host", round(time.time()-t0,1), flush=True)
import jax.numpy as jnp
t0=time.time(); a=jnp.asarray(at); a.block_until_ready()
print("attr upload", round(time.time()-t0,1), flush=True)
