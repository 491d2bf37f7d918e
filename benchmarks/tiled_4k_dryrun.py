"""BASELINE config #5 artifact: 8-way shard_map tiled render at 4K.

Runs the row-band TiledRenderer at 3840x2160 on an 8-device virtual CPU
mesh (the same code path the driver's dryrun_multichip certifies at
tiny shapes) — one real pass, full-resolution film sharding, gather,
and a band-vs-single-chip bitwise spot check on one 32-row band.
Writes benchmarks/tiled_4k_result.json.

Usage: python benchmarks/tiled_4k_dryrun.py
"""

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    from tpu_pathtracer.render.camera import CameraController
    from tpu_pathtracer.render.renderer import (
        ProgressiveRenderer,
        RenderSettings,
    )
    from tpu_pathtracer.parallel.sharding import TiledRenderer
    from tpu_pathtracer.scene.builtin import cornell_box

    assert len(jax.devices()) == 8, jax.devices()
    geom = cornell_box("quads").build()
    cam = CameraController.default().build()
    s = RenderSettings(
        width=3840, height=2160, max_depth=4, spp_per_pass=1,
        ray_chunk=1 << 16,
    )
    t0 = time.time()
    r = TiledRenderer(geom, cam, s, seed=2023, n_tiles=8)
    r.step()
    film = r.gather_film()
    img = np.asarray(film.mean_radiance())
    wall = time.time() - t0
    assert img.shape == (2160, 3840, 3)
    rays = int(r.total_rays)

    # bitwise spot check: single-chip render of rows [1024, 1056) must
    # equal the same rows of the tiled film
    s_band = RenderSettings(
        width=3840, height=32, max_depth=4, spp_per_pass=1,
        ray_chunk=1 << 16,
    )
    from tpu_pathtracer.render.renderer import render_pass
    from tpu_pathtracer.render.film import Film
    from tpu_pathtracer.core import rng
    import jax.numpy as jnp

    band = Film.create(3840, 32)
    band_film, _ = render_pass(
        geom, None, cam, band, rng.base_key(2023), jnp.float32(0.5),
        s_band, pixel_offset=jnp.int32(1024 * 3840),
        view_size=(3840, 2160),
    )
    band_img = np.asarray(band_film.accum)
    bitwise = bool(
        (band_img == np.asarray(film.accum)[1024:1056]).all()
    )

    out = {
        "resolution": "3840x2160",
        "devices": 8,
        "spp": 1,
        "rays": rays,
        "wall_seconds_cpu_virtual": round(wall, 1),
        "mean_radiance": float(img.mean()),
        "band_bitwise_vs_single_chip": bitwise,
    }
    with open(os.path.join(HERE, "tiled_4k_result.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    assert bitwise


if __name__ == "__main__":
    main()
