"""Programmatically generated mesh/texture fixtures.

Equivalent in spirit to the reference's ``data/`` fixtures (8-vertex cube
with a textured MTL, a ground plane — see reference ``data/cube.obj``,
``data/plane.obj``), but synthesized by our own code so the repo carries no
copied assets. Written once into ``tests/_fixtures`` and reused.
"""

from __future__ import annotations

import os

import numpy as np

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "_fixtures")

CUBE_OBJ = """# generated fixture: unit cube centered at origin
mtllib cube.mtl
o cube
v -0.5 -0.5 -0.5
v 0.5 -0.5 -0.5
v -0.5 -0.5 0.5
v 0.5 -0.5 0.5
v -0.5 0.5 0.5
v 0.5 0.5 0.5
v -0.5 0.5 -0.5
v 0.5 0.5 -0.5
vt 0.0 0.0
vt 1.0 0.0
vt 0.0 1.0
vt 1.0 1.0
vn 0.0 -1.0 0.0
vn 0.0 0.0 1.0
vn 0.0 1.0 0.0
vn 0.0 0.0 -1.0
vn 1.0 0.0 0.0
vn -1.0 0.0 0.0
usemtl cube
s off
f 1/1/1 2/2/1 4/4/1
f 1/1/1 4/4/1 3/3/1
f 3/1/2 4/2/2 6/4/2
f 3/1/2 6/4/2 5/3/2
f 5/1/3 6/2/3 8/4/3
f 5/1/3 8/4/3 7/3/3
f 7/1/4 8/2/4 2/4/4
f 7/1/4 2/4/4 1/3/4
f 2/1/5 8/2/5 6/4/5
f 2/1/5 6/4/5 4/3/5
f 7/1/6 1/2/6 3/4/6
f 7/1/6 3/4/6 5/3/6
"""

CUBE_MTL = """newmtl cube
Ns 10.0
Kd 0.588 0.588 0.588
d 1.0
map_Kd cube.png
"""

PLANE_OBJ = """# generated fixture: big ground plane at z=0
o Plane
v -10000.0 -10000.0 0.0
v 10000.0 -10000.0 0.0
v -10000.0 10000.0 0.0
v 10000.0 10000.0 0.0
vn 0.0 0.0 1.0
vt 0.0 0.0
vt 1000.0 0.0
vt 0.0 1000.0
vt 1000.0 1000.0
f 2/2/1 3/3/1 1/1/1
f 2/2/1 4/4/1 3/3/1
"""

WALL_OBJ = """# generated fixture: 1x2x2.5 wall block on the ground
o Wall
v 1.0 1.0 2.5
v 1.0 1.0 0.0
v 1.0 -1.0 2.5
v 1.0 -1.0 0.0
v -1.0 1.0 2.5
v -1.0 1.0 0.0
v -1.0 -1.0 2.5
v -1.0 -1.0 0.0
f 1 5 7
f 1 7 3
f 4 3 7
f 4 7 8
f 8 7 5
f 8 5 6
f 6 2 4
f 6 4 8
f 2 1 3
f 2 3 4
f 6 5 1
f 6 1 2
"""


def make_checker_png(size: int = 32, tiles: int = 4) -> np.ndarray:
    """RGBA8 checkerboard texture."""
    y, x = np.mgrid[0:size, 0:size]
    cell = size // tiles
    checker = ((x // cell + y // cell) % 2).astype(np.uint8)
    img = np.zeros((size, size, 4), np.uint8)
    img[..., 0] = np.where(checker == 1, 255, 40)
    img[..., 1] = np.where(checker == 1, 200, 40)
    img[..., 2] = np.where(checker == 1, 50, 200)
    img[..., 3] = 255
    return img


def ensure_fixtures() -> str:
    from madrona_renderer_tpu.assets.png import write_png

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    paths = {
        "cube.obj": CUBE_OBJ,
        "cube.mtl": CUBE_MTL,
        "plane.obj": PLANE_OBJ,
        "wall_render.obj": WALL_OBJ,
    }
    for name, content in paths.items():
        p = os.path.join(FIXTURE_DIR, name)
        if not os.path.exists(p):
            with open(p, "w") as f:
                f.write(content)
    png_path = os.path.join(FIXTURE_DIR, "cube.png")
    if not os.path.exists(png_path):
        write_png(png_path, make_checker_png())
    return FIXTURE_DIR


# SYNTHETIC UASTC mode-layout table (see assets/uastc.py): exercises the
# decode machinery end-to-end in CI while the authoritative vendor table
# stays a loud runtime gate. Mode shapes are pinned by tests/test_uastc.py;
# every mode's bit budget is verified <= 128 at generation time.
_UASTC_LAYOUT_MODES = [
    # the encoder's pick — first single-subset single-plane CEM8,
    # endpoint range 19 (192 levels)
    dict(mode=0, code=1, code_len=4, kind="astc", cem=8, subsets=1, planes=1,
         endpoint_range=19, weight_range=8, hint_bits=0, pattern_bits=0,
         pattern_seeds=[]),
    # RGBA (CEM 12) single-subset
    dict(mode=1, code=3, code_len=5, kind="astc", cem=12, subsets=1, planes=1,
         endpoint_range=19, weight_range=5, hint_bits=0, pattern_bits=0,
         pattern_seeds=[]),
    # 2-subset with hint bits + 30-entry pattern seed table
    dict(mode=2, code=31, code_len=5, kind="astc", cem=8, subsets=2, planes=1,
         endpoint_range=16, weight_range=2, hint_bits=3, pattern_bits=5,
         pattern_seeds=[(i * 37 + 13) % 1024 for i in range(30)]),
    # hint-bit exerciser, coarse endpoints / fine weights
    dict(mode=5, code=7, code_len=5, kind="astc", cem=8, subsets=1, planes=1,
         endpoint_range=11, weight_range=11, hint_bits=2, pattern_bits=0,
         pattern_seeds=[]),
    # dual-plane (CCS)
    dict(mode=6, code=15, code_len=5, kind="astc", cem=8, subsets=1, planes=2,
         endpoint_range=18, weight_range=2, hint_bits=0, pattern_bits=0,
         pattern_seeds=[]),
    # solid color
    dict(mode=8, code=0, code_len=5, kind="solid"),
]


def ensure_uastc_layout() -> str:
    """Write the synthetic UASTC layout fixture (idempotent); return its path."""
    import json

    from madrona_renderer_tpu.assets import astc

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    path = os.path.join(FIXTURE_DIR, "uastc_layout_synthetic.json")
    if os.path.exists(path):
        return path
    for m in _UASTC_LAYOUT_MODES:
        if m["kind"] == "solid":
            continue
        n_ep = m["subsets"] * 2 * ((m["cem"] >> 2) + 1)
        bits = (m["code_len"] + m["hint_bits"] + m["pattern_bits"]
                + (2 if m["planes"] == 2 else 0)
                + astc.ise_sequence_bits(n_ep, astc._EP_RANGES[m["endpoint_range"]])
                + astc.ise_sequence_bits(16 * m["planes"],
                                         astc._WT_RANGES[m["weight_range"]]))
        assert bits <= 128, (m, bits)
    out = {
        "_comment": ("SYNTHETIC layout table for CI only — exercises the UASTC "
                     "decode machinery end-to-end. NOT the authoritative "
                     "basis_universal mode layout; real UASTC files need "
                     "MRT_UASTC_LAYOUT pointed at the vendor table "
                     "(schema: assets/uastc.py)."),
        "modes": _UASTC_LAYOUT_MODES,
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    return path


# The canonical smoke-test viewpoint of the reference
# (scripts/test.py:51-56) — the de-facto golden camera.
GOLDEN_CAMERA_POS = [-22.343935, -21.845375, 27.061676]
GOLDEN_CAMERA_ROT = [0.913407, -0.112268, 0.047731, -0.388336]


def smoke_scene(data_dir: str, num_worlds: int = 4):
    """Rebuild the reference smoke-test scene (scripts/test.py:11-130):
    a disk cube asset + a raw triangle mesh, 2 instances + 1 camera/world."""
    import madrona_renderer_tpu as m

    asset_paths = [m.ImportedAsset(path=os.path.join(data_dir, "cube.obj"), mat_id=0)]
    additional_mats = [
        m.AdditionalMaterial(color=[1, 1, 1, 1], texture_id=0, roughness=0.8, metalness=0.2)
    ]
    texture_paths = [os.path.join(data_dir, "cube.png")]
    instances = [
        m.ImportedInstance(
            position=[0.0, 0.0, 15.0],
            rotation=[0.707107, 0.707107, 0.0, 0.0],
            scale=[3.0, 3.0, 3.0],
            object_id=0,
        ),
        m.ImportedInstance(
            position=[0.0, 0.0, 15.0],
            rotation=[0.707107, 0.707107, 0.0, 0.0],
            scale=[10.0, 10.0, 10.0],
            object_id=1,
        ),
    ]
    cameras = [m.ImportedCamera(position=GOLDEN_CAMERA_POS, rotation=GOLDEN_CAMERA_ROT)]
    worlds = [
        m.WorldInit(num_instances=2, instance_offset=0, num_cameras=1, camera_offset=0)
        for _ in range(num_worlds)
    ]
    vertices = np.array(
        [[0.0, 0.0, 0.0], [5.0, 0.0, 10.0], [10.0, 0.0, 0.0]], np.float32
    )
    uvs = np.zeros((3, 2), np.float32)
    indices = np.array([0, 1, 2], np.uint32)
    return dict(
        asset_paths=asset_paths,
        mesh_vertices=vertices,
        mesh_uvs=uvs,
        mesh_indices=indices,
        mesh_vertex_offsets=np.array([0], np.uint32),
        mesh_indices_offsets=np.array([0], np.uint32),
        mesh_materials=np.array([-1], np.int32),
        instances=instances,
        materials=additional_mats,
        texture_paths=texture_paths,
        cameras=cameras,
        worlds=worlds,
    )
