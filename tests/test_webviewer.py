"""Windowed live viewer (HTTP): serve, stream, control, quit."""

import json
import threading
import urllib.request

import numpy as np

from madrona_renderer_tpu.config import RenderMode
from madrona_renderer_tpu.manager import Manager
from madrona_renderer_tpu.runners.scenes import demo_config
from madrona_renderer_tpu.runners.viewer import Viewer
from madrona_renderer_tpu.runners.webviewer import serve


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=30) as r:
        return r.status, r.read(), dict(r.headers)


def test_webviewer_end_to_end():
    mgr = Manager(demo_config(3, RenderMode.Raytracer, 32, 32, dynamic=True))
    httpd, vs = serve(Viewer(mgr), port=0)  # ephemeral port
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        status, body, _ = _get(port, "/")
        assert status == 200 and b"madrona_renderer_tpu viewer" in body

        status, png, headers = _get(port, "/frame.png")
        assert status == 200 and png[:8] == b"\x89PNG\r\n\x1a\n"
        state = json.loads(headers["X-Viewer-State"])
        assert state["num_worlds"] == 3 and state["world"] == 0

        # The PNG really decodes to the current frame.
        from madrona_renderer_tpu.assets.png import decode_png

        img = decode_png(png)
        np.testing.assert_array_equal(
            img, np.asarray(mgr.frames.rgb[0, 0])
        )

        # Controls: world/view navigation, depth toggle, pause.
        _get(port, "/key?k=right")
        _get(port, "/key?k=d")
        _get(port, "/key?k=%20")
        status, body, _ = _get(port, "/state")
        state = json.loads(body)
        assert state == {
            "world": 1, "view": 0, "paused": True, "depth": True,
            "num_worlds": 3, "num_views": 1,
        }
        # Paused: two polls produce identical frames and no sim stepping.
        t0 = float(np.asarray(mgr.state.time)[0] if np.ndim(mgr.state.time) else mgr.state.time)
        _get(port, "/frame.png")
        _get(port, "/frame.png")
        t1 = float(np.asarray(mgr.state.time)[0] if np.ndim(mgr.state.time) else mgr.state.time)
        assert t0 == t1

        # Quit: frame endpoint reports 410.
        _get(port, "/key?k=q")
        assert not vs.alive
        try:
            status, _, _ = _get(port, "/frame.png")
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 410
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_webviewer_depth_frame():
    """Depth view streams as a grayscale-expanded PNG."""
    mgr = Manager(demo_config(1, RenderMode.Raytracer, 16, 16))
    httpd, vs = serve(Viewer(mgr), port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        _get(port, "/key?k=d")
        status, png, headers = _get(port, "/frame.png")
        assert status == 200
        state = json.loads(headers["X-Viewer-State"])
        assert state["depth"] is True
        from madrona_renderer_tpu.assets.png import decode_png
        from madrona_renderer_tpu.runners.dump import depth_to_gray_u8

        img = decode_png(png)
        expect = depth_to_gray_u8(np.asarray(mgr.frames.depth[0, 0]))
        np.testing.assert_array_equal(img, expect)
        np.testing.assert_array_equal(img[..., 0], img[..., 1])
    finally:
        httpd.shutdown()
        httpd.server_close()
