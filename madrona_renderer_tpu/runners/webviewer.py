"""Windowed live viewer — browser window streaming rendered frames.

The reference's ``renderer_viewer`` is a GLFW/ImGui window blitting the
rgb tensor every frame (reference ``src/viewer.cpp:189-286``). The
TPU-native equivalent of "a window at interactive rates" is a browser
window: this module serves a single-page viewer over HTTP (stdlib only —
no GLFW/Vulkan dependency), streaming PNG frames of the selected
(world, view) while the sim steps, with the same controls as
``runners/viewer.py`` (which remains as the matplotlib fallback):

    ←/→ world    ↑/↓ view    space pause    d depth    q quit

CLI (reference argv contract ``src/args.cpp:9-50`` + ``--port``):

    python -m madrona_renderer_tpu.runners.webviewer \
        NUM_WORLDS rt|rast WINDOW_W WINDOW_H BATCH_W BATCH_H [--port 7788]

then open http://127.0.0.1:PORT/. The sim advances on each frame poll
(client-paced, like the reference's render loop); pausing freezes state
while the view keeps refreshing.
"""

from __future__ import annotations

import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

from ..manager import Manager
from .scenes import demo_config
from .viewer import Viewer, parse_viewer_args

_PAGE = """<!doctype html>
<html><head><title>madrona_renderer_tpu viewer</title><style>
  body { background: #101014; color: #d8d8e0; font: 14px monospace;
         display: flex; flex-direction: column; align-items: center; }
  img  { image-rendering: pixelated; border: 1px solid #333;
         width: %(win_w)dpx; height: %(win_h)dpx; margin-top: 12px; }
  #hud { margin-top: 8px; }
  kbd  { background: #222; padding: 1px 5px; border-radius: 3px; }
</style></head><body>
<h3>madrona_renderer_tpu viewer</h3>
<img id="frame" alt="frame">
<div id="hud"></div>
<div style="margin-top:6px">
  <kbd>&larr;/&rarr;</kbd> world &nbsp; <kbd>&uarr;/&darr;</kbd> view
  &nbsp; <kbd>space</kbd> pause &nbsp; <kbd>d</kbd> depth
  &nbsp; <kbd>q</kbd> quit<br>
  <kbd>f</kbd> fly &nbsp; <kbd>w/a/s/d</kbd> move &nbsp;
  <kbd>r/c</kbd> up/down &nbsp; <kbd>drag/arrows</kbd> look &nbsp;
  <kbd>+/-</kbd> speed
</div>
<script>
const img = document.getElementById('frame');
const hud = document.getElementById('hud');
let stop = false;
async function refresh() {
  if (stop) return;
  try {
    const r = await fetch('/frame.png?ts=' + Date.now());
    if (r.status === 410) { stop = true; hud.textContent = 'viewer quit'; return; }
    const blob = await r.blob();
    const url = URL.createObjectURL(blob);
    img.onload = () => URL.revokeObjectURL(url);
    img.src = url;
    const s = JSON.parse(r.headers.get('X-Viewer-State'));
    hud.textContent = `world ${s.world}/${s.num_worlds - 1}  ` +
      `view ${s.view}/${s.num_views - 1}` +
      (s.depth ? '  [depth]' : '') + (s.paused ? '  [paused]' : '') +
      (s.fly ? `  [fly ${s.fly_speed.toFixed(1)}]` : '');
  } catch (e) { /* server gone */ }
  setTimeout(refresh, 50);
}
const keymap = {ArrowLeft: 'left', ArrowRight: 'right', ArrowUp: 'up',
                ArrowDown: 'down', ' ': ' ', d: 'd', q: 'q', f: 'f',
                w: 'w', a: 'a', s: 's', r: 'r', c: 'c',
                '+': '+', '=': '=', '-': '-'};
document.addEventListener('keydown', (e) => {
  const k = keymap[e.key];
  if (k !== undefined) { e.preventDefault(); fetch('/key?k=' + encodeURIComponent(k)); }
});
// mouse-drag look (fly mode): drag on the frame rotates the camera
let dragging = false, lastX = 0, lastY = 0;
img.addEventListener('mousedown', (e) => {
  dragging = true; lastX = e.clientX; lastY = e.clientY; e.preventDefault();
});
document.addEventListener('mouseup', () => { dragging = false; });
// Coalesce drag deltas and flush one /key per animation frame: raw
// mousemove fires ~60+/s and each fetch is a request the single-threaded
// server must handle between renders — un-coalesced drags queue up and
// the camera lags/jumps.
let accX = 0, accY = 0, flushQueued = false;
function flushLook() {
  flushQueued = false;
  if (accX === 0 && accY === 0) return;
  const dx = accX, dy = accY; accX = 0; accY = 0;
  // +dx drag right -> yaw right (negative yaw), +dy drag down -> pitch down
  fetch('/key?k=' + encodeURIComponent(
    `look:${(-dx * 0.005).toFixed(4)}:${(-dy * 0.005).toFixed(4)}`));
}
document.addEventListener('mousemove', (e) => {
  if (!dragging) return;
  accX += e.clientX - lastX; accY += e.clientY - lastY;
  lastX = e.clientX; lastY = e.clientY;
  if (!flushQueued) { flushQueued = true; requestAnimationFrame(flushLook); }
});
refresh();
</script></body></html>
"""


class ViewerServer:
    """HTTP wrapper around runners.viewer.Viewer."""

    def __init__(self, viewer: Viewer, win_w: int = 512, win_h: int = 512):
        self.viewer = viewer
        self.win_w = win_w
        self.win_h = win_h
        self.lock = threading.Lock()
        self.alive = True

    def state(self) -> dict:
        v = self.viewer
        return {
            "world": v.world,
            "view": v.view,
            "paused": v.paused,
            "depth": v.show_depth,
            "fly": v.fly,
            "fly_speed": v.fly_speed,
            "num_worlds": v.mgr.cfg.num_worlds,
            "num_views": v.mgr.state.max_cameras,
        }

    def frame_png(self) -> bytes:
        from ..assets.png import encode_png

        with self.lock:
            self.viewer.tick()  # client-paced stepping (no-op when paused)
            img = self.viewer.current_image()
        if img.ndim == 2:
            import numpy as np

            img = np.stack([img] * 3 + [np.full_like(img, 255)], axis=-1)
        return encode_png(img)

    def key(self, k: str) -> bool:
        with self.lock:
            ok = self.viewer.handle_key(k)
        if not ok:
            self.alive = False
        return ok

    def make_handler(server_self):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code, body=b"", ctype="text/plain", extra=()):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                for k, v in extra:
                    self.send_header(k, v)
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                url = urlparse(self.path)
                if not server_self.alive and url.path != "/state":
                    self._send(410, b"viewer quit")
                    return
                if url.path == "/":
                    page = _PAGE % {
                        "win_w": server_self.win_w,
                        "win_h": server_self.win_h,
                    }
                    self._send(200, page.encode(), "text/html")
                elif url.path == "/frame.png":
                    png = server_self.frame_png()
                    self._send(
                        200, png, "image/png",
                        extra=[("X-Viewer-State", json.dumps(server_self.state()))],
                    )
                elif url.path == "/state":
                    self._send(
                        200, json.dumps(server_self.state()).encode(),
                        "application/json",
                    )
                elif url.path == "/key":
                    k = parse_qs(url.query).get("k", [""])[0]
                    server_self.key(k)
                    self._send(200, b"ok")
                else:
                    self._send(404, b"not found")

        return Handler


def serve(viewer: Viewer, port: int = 7788, win_w: int = 512, win_h: int = 512):
    """Create (but don't run) the HTTP server; returns (server, wrapper).
    Call ``server.serve_forever()`` (or handle_request in a loop)."""
    vs = ViewerServer(viewer, win_w, win_h)
    httpd = HTTPServer(("127.0.0.1", port), vs.make_handler())
    return httpd, vs


def main(argv=None) -> None:
    from ..utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    argv = argv if argv is not None else sys.argv
    port = 7788
    if "--port" in argv:
        i = argv.index("--port")
        port = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    num_worlds, mode, bw, bh, ssaa = parse_viewer_args(argv)
    win_w, win_h = int(argv[3]), int(argv[4])
    mgr = Manager(demo_config(num_worlds, mode, bw, bh, dynamic=True,
                              ssaa=ssaa))
    httpd, vs = serve(Viewer(mgr), port=port, win_w=win_w, win_h=win_h)
    print(f"viewer: http://127.0.0.1:{port}/  (q in the page to quit)")
    try:
        while vs.alive:
            httpd.handle_request()
    except KeyboardInterrupt:
        pass
    httpd.server_close()


if __name__ == "__main__":
    main()
