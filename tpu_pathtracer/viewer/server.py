"""Lightweight interactive viewer: a stdlib HTTP server around the App.

Headless stand-in for the reference's GLFW/ImGui frontend (SURVEY.md §7
"an optional lightweight viewer (saved-image refresh) stands in for
ImGui"): a browser page auto-refreshes the progressive render and exposes
the Controls-window knobs (orbit, zoom, sampling mode, MIS fraction, spp,
radiosity solve, PNG save) plus the Grid-heatmap and Profiler views
(ui_windows.h:73-553) as endpoints.

Run: python -m tpu_pathtracer.viewer.server [--scene cbox_quads ...]
Endpoints:
  GET /            control page (auto-refreshing frame)
  GET /frame.png   current accumulated frame
  GET /heatmap.png?prim=3   sampling-PDF heatmap for a primitive
  GET /profiler    stage-timing summary (text)
  GET /orbit?yaw=5&pitch=0&zoom=0
  GET /set?mode=mis&spp=64  (any Config field)
  GET /solve       run the radiosity solver
  GET /pick?u=0.5&v=0.5     primitive under the cursor
  GET /save?path=out.png
"""

from __future__ import annotations

import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..app import App
from ..utils.config import Config
from ..utils.logger import get_logger
from ..utils.png import write_png

log = get_logger("Viewer")

_PAGE = """<!doctype html>
<html><head><title>tpu_pathtracer</title>
<style>body{background:#111;color:#ddd;font-family:monospace}
img{image-rendering:pixelated;border:1px solid #444}</style></head>
<body>
<h3>tpu_pathtracer viewer</h3>
<img id="frame" src="/frame.png" width="512">
<div>
<button onclick="go('/orbit?yaw=-10')">&#8634; yaw-</button>
<button onclick="go('/orbit?yaw=10')">yaw+ &#8635;</button>
<button onclick="go('/orbit?pitch=10')">pitch+</button>
<button onclick="go('/orbit?pitch=-10')">pitch-</button>
<button onclick="go('/orbit?zoom=-0.5')">zoom in</button>
<button onclick="go('/orbit?zoom=0.5')">zoom out</button>
<button onclick="go('/solve')">solve radiosity</button>
</div>
<pre id="info"></pre>
<h4>profiler</h4>
<img id="prof" src="/profiler.svg">
<script>
function go(u){fetch(u).then(r=>r.text()).then(t=>
  document.getElementById('info').textContent=t)}
setInterval(()=>{document.getElementById('frame').src=
  '/frame.png?'+Date.now();
  document.getElementById('prof').src='/profiler.svg?'+Date.now()}, 1500)
</script></body></html>"""


class ViewerState:
    def __init__(self, config: Config):
        self.app = App(config)
        self.app.load_scene()
        self.lock = threading.Lock()
        self.running = True
        self.thread = threading.Thread(target=self._loop, daemon=True)

    def start(self):
        self.thread.start()

    def _loop(self):
        """Continuous progressive refinement (renderFrame equivalent),
        feeding the profiler's 120-frame FPS/stage history."""
        while self.running:
            with self.lock:
                prof = self.app.profiler
                prof.begin_frame()
                with prof.stage("Render"):
                    r = self.app.renderer()
                    r.step()
                prof.end_frame()

    def frame_png(self) -> bytes:
        from ..utils.png import png_bytes

        with self.lock:
            r = self.app.renderer()
            img = r.film.to_image()
        return png_bytes(img)

    def apply_settings(self, q: dict) -> set:
        """Apply /set query params to the Config.

        Geometry-affecting keys re-run load_scene() (which also
        invalidates solution/CDFs/renderer), matching the reference
        Controls window's scene/subdivision reload path
        (ui_windows.h:94-104, 213-224). Returns the changed key set.
        """
        geo_keys = {"scene", "subdivision", "convert_quads"}
        app = self.app
        with self.lock:
            changed = set()
            for k, v in q.items():
                if hasattr(app.config, k):
                    cur = getattr(app.config, k)
                    new = (
                        v not in ("0", "false", "False")
                        if isinstance(cur, bool)
                        else type(cur)(v)
                    )
                    if new != cur:
                        setattr(app.config, k, new)
                        changed.add(k)
            if changed & geo_keys:
                app.load_scene()
            elif changed:
                app._renderer = None
        return changed


def make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _send(self, body, ctype="text/plain"):
            if isinstance(body, str):
                body = body.encode()
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            url = urllib.parse.urlparse(self.path)
            q = dict(urllib.parse.parse_qsl(url.query))
            app = state.app
            try:
                if url.path == "/":
                    self._send(_PAGE, "text/html")
                elif url.path == "/frame.png":
                    self._send(state.frame_png(), "image/png")
                elif url.path == "/heatmap.png":
                    # ?src=radiosity|counts — GridVisualizationMode
                    # parity (RadiosityDistribution vs VisibilityCount,
                    # application_state.h:54-57); ?topk=K overlays the
                    # top-K cells only.
                    from .heatmap import grid_heatmap, top_k_overlay

                    prim = int(q.get("prim", 0))
                    src = q.get("src", "radiosity")
                    topk = int(q.get("topk", 0))
                    with state.lock:
                        if app.cdfs is None:
                            app.precompute_cdfs()
                        if src == "counts":
                            pdf = np.asarray(app.solution.grid_counts)
                        else:
                            pdf = np.asarray(app.cdfs.pdf)
                    from ..utils.png import png_bytes

                    img = (
                        top_k_overlay(pdf, prim, topk)
                        if topk > 0
                        else grid_heatmap(pdf, prim)
                    )
                    self._send(png_bytes(img), "image/png")
                elif url.path == "/profiler":
                    self._send(app.profiler.summary())
                elif url.path == "/profiler.svg":
                    from .profgraph import profiler_svg

                    self._send(profiler_svg(app.profiler),
                               "image/svg+xml")
                elif url.path == "/orbit":
                    with state.lock:
                        app.orbit(
                            float(q.get("yaw", 0)),
                            float(q.get("pitch", 0)),
                            float(q.get("zoom", 0)),
                        )
                    self._send("ok")
                elif url.path == "/set":
                    changed = state.apply_settings(q)
                    self._send(f"set {q} (changed: {sorted(changed)})")
                elif url.path == "/solve":
                    with state.lock:
                        app.run_solver()
                        app.precompute_cdfs()
                    self._send("radiosity solved")
                elif url.path == "/pick":
                    with state.lock:
                        idx = app.pick(
                            float(q.get("u", 0.5)), float(q.get("v", 0.5))
                        )
                    self._send(f"prim {idx}")
                elif url.path == "/save":
                    path = q.get("path", "out.png")
                    with state.lock:
                        r = app.renderer()
                        write_png(path, r.film.to_image())
                    self._send(f"saved {path}")
                else:
                    self.send_error(404)
            except Exception as e:  # noqa: BLE001
                self.send_error(500, str(e))

    return Handler


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(prog="tpu_pathtracer.viewer")
    Config.add_cli_args(p)
    p.add_argument("--port", type=int, default=8000)
    args = p.parse_args(argv)
    cfg = Config.from_cli_args(args)
    cfg.spp = 1 << 30  # progressive forever
    state = ViewerState(cfg)
    state.start()
    server = ThreadingHTTPServer(("0.0.0.0", args.port),
                                 make_handler(state))
    log.info("viewer at http://localhost:%d", args.port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        state.running = False


if __name__ == "__main__":
    main()
