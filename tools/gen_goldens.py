"""Regenerate the committed golden images (tests/goldens/) from the jnp
reference renderer on CPU.

Run from the repo root:  python tools/gen_goldens.py

Goldens are semantics-defining: the jnp reference path (`*_ref.py`)
produces them, and both impls (jnp + Pallas interpret) must match in
tests/test_golden.py / test_golden_views.py. Covers the reference's
de-facto golden camera (scripts/test.py:51-56) in both render modes plus
two extra raytrace viewpoints (overhead, grazing) per docs/roadmap.md
("golden-image suite against more viewpoints and the raster path").
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

import madrona_renderer_tpu as m
from madrona_renderer_tpu.assets.png import write_png

from tests.fixtures import ensure_fixtures, smoke_scene

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "goldens")

def look_at_quat(eye, target, up=(0.0, 0.0, 1.0)):
    """Quaternion (w,x,y,z) orienting the camera local frame (+X right,
    +Y forward, +Z up) so local +Y points from eye toward target."""
    eye, target, up = (np.asarray(v, np.float64) for v in (eye, target, up))
    fwd = target - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    cup = np.cross(right, fwd)
    R = np.stack([right, fwd, cup], axis=1)  # columns: local X/Y/Z in world
    w = np.sqrt(max(0.0, 1.0 + R[0, 0] + R[1, 1] + R[2, 2])) / 2.0
    if w > 1e-6:
        q = [w, (R[2, 1] - R[1, 2]) / (4 * w), (R[0, 2] - R[2, 0]) / (4 * w),
             (R[1, 0] - R[0, 1]) / (4 * w)]
    else:  # w≈0: pick the dominant diagonal axis
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(0.0, 1.0 + R[i, i] - R[j, j] - R[k, k])) * 2.0
        xyz = [0.0, 0.0, 0.0]
        xyz[i] = s / 4.0
        xyz[j] = (R[j, i] + R[i, j]) / s
        xyz[k] = (R[k, i] + R[i, k]) / s
        q = [(R[k, j] - R[j, k]) / s, *xyz]
    return [float(v) for v in q]


# Extra viewpoints (camera local frame: +X right, +Y forward, +Z up).
# overhead: above the scene looking straight down;
# closeup: near the small cube from the -Y side so the ground triangle
# (which lies in the y<0 half-space after the instance rotation) is
# also in frame.
EXTRA_VIEWS = {
    "overhead": ([0.0, -10.0, 60.0],
                 look_at_quat([0.0, -10.0, 60.0], [0.0, -10.0, 0.0], up=(0.0, 1.0, 0.0))),
    "closeup": ([12.0, -14.0, 22.0], look_at_quat([12.0, -14.0, 22.0], [0.0, 0.0, 14.0])),
}


def render(mode, cam=None):
    kw = smoke_scene(ensure_fixtures())
    if cam is not None:
        kw["cameras"] = [m.ImportedCamera(position=cam[0], rotation=cam[1])]
    r = m.MadronaRenderer(
        gpu_id=0,
        num_worlds=4,
        render_mode=mode,
        batch_render_view_width=64,
        batch_render_view_height=64,
        impl="jnp",
        **kw,
    )
    seg = None
    if mode == m.RenderMode.Raytracer:  # segmask is rt-only (manager.py:369)
        seg = r.segmask_tensor().numpy()[0]
    return r.rgb_tensor().numpy()[0], r.depth_tensor().numpy()[0], seg


def save(stem, rgb, depth, seg):
    write_png(os.path.join(GOLDEN_DIR, f"{stem}_rgb_world0.png"), rgb)
    np.save(os.path.join(GOLDEN_DIR, f"{stem}_depth_world0.npy"), depth)
    if seg is not None:
        np.save(os.path.join(GOLDEN_DIR, f"{stem}_seg_world0.npy"), seg)
        cover = float((seg >= 0).mean())
        print(f"{stem}: seg coverage {100*cover:.1f}%  depth[min,max]=({depth.min():.2f},{depth.max():.2f})")
    else:
        print(f"{stem}: depth[min,max]=({depth.min():.2f},{depth.max():.2f})")


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    rgb, depth, seg = render(m.RenderMode.Rasterizer)
    save("raster_smoke", rgb, depth, seg)
    for name, cam in EXTRA_VIEWS.items():
        rgb, depth, seg = render(m.RenderMode.Raytracer, cam)
        save(f"view_{name}", rgb, depth, seg)


if __name__ == "__main__":
    main()
