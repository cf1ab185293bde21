"""Built-in demo scenes for the runners and benchmarks.

The reference's headless binary constructs a Manager with an *empty* render
config and null-derefs (stale binary: ``src/headless.cpp:48-55`` never fills
``cfg.rcfg`` which ``Impl`` reads at ``src/mgr.cpp:136-139``). We fix that
divergence by giving the runners a real default scene: a colored cube and a
ground plane per world, one camera — geometry generated in code, no asset
files needed. The viewer's hardcoded demo (triangle + textured cube,
``src/viewer.cpp:74-164``) is available as ``viewer_scene``.
"""

from __future__ import annotations

import math
import os
from typing import Dict, List

import numpy as np

from ..config import (
    AdditionalMaterial,
    GeometryConfig,
    ImportedAsset,
    ImportedCamera,
    ImportedInstance,
    ManagerConfig,
    RenderConfig,
    RenderMode,
    WorldInit,
)


def cube_mesh(half: float = 0.5):
    """Unit cube: 8 verts expanded to 24 (per-face UVs), 12 tris."""
    faces = []
    uvs = []
    # (axis, sign) for each face
    for axis in range(3):
        for sign in (-1.0, 1.0):
            u_axis, v_axis = [(1, 2), (0, 2), (0, 1)][axis]
            corners = []
            for du, dv in [(-1, -1), (1, -1), (1, 1), (-1, 1)]:
                c = [0.0, 0.0, 0.0]
                c[axis] = sign * half
                c[u_axis] = du * half * sign
                c[v_axis] = dv * half
                corners.append(c)
            faces.extend([corners[0], corners[1], corners[2],
                          corners[0], corners[2], corners[3]])
            uvs.extend([[0, 0], [1, 0], [1, 1], [0, 0], [1, 1], [0, 1]])
    return np.asarray(faces, np.float32), np.asarray(uvs, np.float32)


def plane_mesh(half: float = 10000.0):
    a, b, c, d = (
        [-half, -half, 0.0],
        [half, -half, 0.0],
        [half, half, 0.0],
        [-half, half, 0.0],
    )
    verts = np.asarray([a, b, c, a, c, d], np.float32)
    uvs = np.asarray([[0, 0], [1, 0], [1, 1], [0, 0], [1, 1], [0, 1]], np.float32)
    return verts, uvs


def _geo_from(meshes: List[np.ndarray], uv_list: List[np.ndarray], mats: List[int]):
    verts = np.concatenate(meshes, axis=0)
    uvs = np.concatenate(uv_list, axis=0)
    counts = [len(v) for v in meshes]
    offs = np.cumsum([0] + counts[:-1]).astype(np.uint32)
    return GeometryConfig(
        vertices=verts,
        uvs=uvs,
        indices=np.concatenate([np.arange(c, dtype=np.uint32) for c in counts]),
        mesh_vertex_offsets=offs,
        mesh_index_offsets=offs.copy(),
        mesh_materials=np.asarray(mats, np.int32),
    )



def _cache_dir() -> str:
    """Per-user demo-asset cache dir: on multi-user machines a shared /tmp
    path would collide across users (PermissionError, or trusting another
    user's file); keying by uid gives each user an isolated cache."""
    import tempfile

    uid = os.getuid() if hasattr(os, "getuid") else "u"
    d = os.path.join(tempfile.gettempdir(), f"mrt_cache_{uid}")
    os.makedirs(d, exist_ok=True)
    return d


def _publish_atomic(path: str, data: bytes) -> None:
    """Write-once cache publish: atomic rename so concurrent readers never
    see a partially-written file (bench + tests share these /tmp caches)."""
    import tempfile

    d = os.path.dirname(path)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".mrt_tmp_")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def demo_texture_png(size: int = 64) -> str:
    """Generate (once) and return the path of the demo checkerboard
    texture — the textured-scene analog of the reference's cube.png."""
    path = os.path.join(_cache_dir(), f"mrt_demo_checker_{size}.png")
    if not os.path.exists(path):
        from ..assets.png import encode_png

        yy, xx = np.mgrid[0:size, 0:size]
        checker = ((yy // 8 + xx // 8) % 2).astype(np.float32)
        img = np.empty((size, size, 4), np.uint8)
        img[..., 0] = (255 * (0.35 + 0.6 * checker)).astype(np.uint8)
        img[..., 1] = (255 * (0.55 - 0.25 * checker)).astype(np.uint8)
        img[..., 2] = (255 * (0.25 + 0.5 * (1 - checker))).astype(np.uint8)
        img[..., 3] = 255
        _publish_atomic(path, encode_png(img))
    return path


def demo_texture_ktx2(size: int = 32) -> str:
    """The checkerboard as a BasisLZ/ETC1S .ktx2 — the "cube.png → KTX"
    conversion of BASELINE config 2 (ETC1S is lossy; fine for a texture)."""
    path = os.path.join(_cache_dir(), f"mrt_demo_checker_{size}.ktx2")
    if not os.path.exists(path):
        from ..assets.etc1s_encode import encode_ktx2_etc1s
        from ..assets.png import read_png

        _publish_atomic(path, encode_ktx2_etc1s(read_png(demo_texture_png(size))))
    return path


def demo_obj_assets() -> list:
    """Write the demo cube/plane meshes as OBJ files (once) and return
    their paths — the disk-import variant of the demo scene (BASELINE
    config 1: "cube.obj + plane.obj"), exercising the asset importer."""
    d = os.path.join(_cache_dir(), "mrt_demo_objs")
    os.makedirs(d, exist_ok=True)
    paths = []
    for name, (verts, uvs) in (
        ("cube.obj", cube_mesh()),
        ("plane.obj", plane_mesh()),
    ):
        path = os.path.join(d, name)
        if not os.path.exists(path):
            lines = [f"o {name[:-4]}"]
            for v in verts:
                lines.append(f"v {v[0]} {v[1]} {v[2]}")
            for t in uvs:
                lines.append(f"vt {t[0]} {t[1]}")
            for i in range(0, len(verts), 3):
                lines.append(
                    f"f {i+1}/{i+1} {i+2}/{i+2} {i+3}/{i+3}"
                )
            _publish_atomic(path, ("\n".join(lines) + "\n").encode())
        paths.append(path)
    return paths


def wall_obj_asset() -> str:
    """wall_render.obj equivalent: a 2×2×2.5 wall block (the reference's
    data/wall_render.obj is an 8-vertex block; ours is generated, not
    copied). Written once to a temp dir."""
    d = os.path.join(_cache_dir(), "mrt_demo_objs")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "wall_render.obj")
    if not os.path.exists(path):
        corners = [
            (x, y, z)
            for x in (1.0, -1.0)
            for y in (1.0, -1.0)
            for z in (2.5, 0.0)
        ]
        # 12 triangles over the box faces (indices into corners, 1-based).
        faces = [
            (1, 5, 7), (1, 7, 3), (4, 3, 7), (4, 7, 8), (8, 7, 5), (8, 5, 6),
            (6, 2, 4), (6, 4, 8), (2, 1, 3), (2, 3, 4), (6, 5, 1), (6, 1, 2),
        ]
        lines = ["o Wall"]
        for c in corners:
            lines.append(f"v {c[0]} {c[1]} {c[2]}")
        for f in faces:
            lines.append(f"f {f[0]} {f[1]} {f[2]}")
        _publish_atomic(path, ("\n".join(lines) + "\n").encode())
    return path


def wall_scene_config(
    num_worlds: int,
    render_mode: RenderMode,
    width: int,
    height: int,
    **extra,
) -> ManagerConfig:
    """BASELINE config 3's scene: wall_render.obj instances on a ground
    plane, one camera per world (per-world yaw so worlds differ)."""
    plane_v, plane_uv = plane_mesh()
    geo = _geo_from([plane_v], [plane_uv], [1])  # plane → additional mat 1
    mats = [
        AdditionalMaterial(color=(0.6, 0.55, 0.5, 1.0), roughness=0.8),
        AdditionalMaterial(color=(0.3, 0.35, 0.4, 1.0), roughness=0.9),
    ]
    instances, cameras, worlds = [], [], []
    for w in range(num_worlds):
        yaw = (w * 0.61) % (2 * math.pi)
        qw, qz = math.cos(yaw / 2), math.sin(yaw / 2)
        # Two walls + the ground plane per world. Object ids: disk assets
        # first (wall = 0), then raw meshes (plane = 1).
        instances.append(ImportedInstance(
            position=[-2.5, 0.0, 0.0], rotation=[qw, 0.0, 0.0, qz],
            scale=[1.0, 1.0, 1.0], object_id=0))
        instances.append(ImportedInstance(
            position=[2.5, 0.0, 0.0], rotation=[qw, 0.0, 0.0, -qz],
            scale=[1.0, 1.0, 1.0], object_id=0))
        instances.append(ImportedInstance(
            position=[0.0, 0.0, 0.0], rotation=[1.0, 0.0, 0.0, 0.0],
            scale=[1.0, 1.0, 1.0], object_id=1))
        pitch = -0.12
        ps, pc = math.sin(pitch / 2), math.cos(pitch / 2)
        cameras.append(ImportedCamera(position=[0.0, 9.0, 2.5],
                                      rotation=[0.0, 0.0, ps, pc]))
        worlds.append(WorldInit(num_instances=3, instance_offset=3 * w,
                                num_cameras=1, camera_offset=w))
    return ManagerConfig(
        gpu_id=0,
        num_worlds=num_worlds,
        render_mode=render_mode,
        batch_render_view_width=width,
        batch_render_view_height=height,
        headless_mode=True,
        rcfg=RenderConfig(
            geo_cfg=geo,
            asset_paths=[ImportedAsset(path=wall_obj_asset(), mat_id=0)],
            additional_mats=mats,
            instances=instances,
            cameras=cameras,
            worlds=worlds,
        ),
        **extra,
    )


def _yaw_pitch_quat(yaw: float, pitch: float):
    """(w, x, y, z) for yaw about Z composed with pitch about X — the
    demo camera's orientation convention generalized to any yaw (the
    base camera is the yaw=π special case [0, 0, ps, pc])."""
    cy, sy = math.cos(yaw / 2), math.sin(yaw / 2)
    pc, ps = math.cos(pitch / 2), math.sin(pitch / 2)
    return [cy * pc, cy * ps, sy * ps, sy * pc]


def demo_config(
    num_worlds: int,
    render_mode: RenderMode,
    width: int,
    height: int,
    dynamic: bool = False,
    textured: bool = False,
    tex_size: int = 64,
    tex_format: str = "png",
    from_disk: bool = False,
    num_cams: int = 1,
    **extra,
) -> ManagerConfig:
    """Cube-on-a-plane scene, ``num_cams`` cameras per world (the
    multi-agent analog — reference worlds attach one view per agent,
    ``src/sim.cpp:168-171``; extra cameras orbit the cube at distinct
    yaw offsets so every view differs), all worlds identical
    (they diverge only if the caller mutates transforms — ``dynamic``
    pre-seeds per-world cube yaw so every world differs from step one).
    ``textured`` maps a generated checkerboard onto the cube (the textured
    perf configs; the reference's analog is cube.png via map_Kd);
    ``tex_format='ktx2'`` delivers it as BasisLZ KTX2. ``from_disk`` loads
    the meshes via cube.obj/plane.obj files (asset-importer path) instead
    of raw geometry."""
    asset_paths = []
    if from_disk:
        # Disk-asset variant: object ids keep the disk-assets-first rule
        # (cube=0, plane=1, scripts/test.py:7-9); mat_id binds each asset
        # to the matching additional material.
        asset_paths = [
            ImportedAsset(path=p, mat_id=i)
            for i, p in enumerate(demo_obj_assets())
        ]
        geo = GeometryConfig.empty()
    else:
        cube_v, cube_uv = cube_mesh()
        plane_v, plane_uv = plane_mesh()
        geo = _geo_from([cube_v, plane_v], [cube_uv, plane_uv], [0, 1])
    mats = [
        AdditionalMaterial(
            color=(0.9, 0.3, 0.2, 1.0),
            texture_id=0 if textured else -1,
            roughness=0.6,
        ),
        AdditionalMaterial(color=(0.25, 0.3, 0.35, 1.0), texture_id=-1, roughness=0.9),
    ]
    if not textured:
        textures = []
    elif tex_format == "ktx2":
        textures = [demo_texture_ktx2(tex_size)]
    else:
        textures = [demo_texture_png(tex_size)]
    instances = []
    cameras = []
    worlds = []
    for w in range(num_worlds):
        yaw = (w * 0.37) % (2 * math.pi) if dynamic else 0.0
        qw, qz = math.cos(yaw / 2), math.sin(yaw / 2)
        instances.append(
            ImportedInstance(
                position=[0.0, 0.0, 1.0],
                rotation=[qw, 0.0, 0.0, qz],
                scale=[2.0, 2.0, 2.0],
                object_id=0,
            )
        )
        instances.append(
            ImportedInstance(
                position=[0.0, 0.0, 0.0],
                rotation=[1.0, 0.0, 0.0, 0.0],
                scale=[1.0, 1.0, 1.0],
                object_id=1,
            )
        )
        # Camera north of the cube looking back (-Y), slightly above and
        # pitched down — this side faces the default light (src/mgr.cpp:357
        # direction (1,-1,-0.05) travels toward -Y, lighting +Y faces).
        # quat = yaw(pi about Z) ∘ pitch about X.
        pitch = -0.18
        ps, pc = math.sin(pitch / 2), math.cos(pitch / 2)
        cameras.append(
            ImportedCamera(
                position=[0.0, 8.0, 3.0],
                rotation=[0.0, 0.0, ps, pc],
            )
        )
        for c in range(1, num_cams):
            # Additional agent views orbit the cube: yaw c·(2π/num_cams)
            # past the base camera's 180° turn (plus a small per-camera
            # yaw/height skew so the cube's 90° symmetry can't make two
            # views pixel-identical), same downward pitch.
            yaw_c = math.pi + c * (2 * math.pi / num_cams) + 0.19 * c
            cameras.append(
                ImportedCamera(
                    position=[8.0 * math.sin(yaw_c),
                              -8.0 * math.cos(yaw_c),
                              3.0 + 0.4 * c],
                    rotation=_yaw_pitch_quat(yaw_c, pitch),
                )
            )
        worlds.append(
            WorldInit(
                num_instances=2,
                instance_offset=2 * w,
                num_cameras=num_cams,
                camera_offset=num_cams * w,
            )
        )
    return ManagerConfig(
        gpu_id=0,
        num_worlds=num_worlds,
        render_mode=render_mode,
        batch_render_view_width=width,
        batch_render_view_height=height,
        headless_mode=True,
        rcfg=RenderConfig(
            geo_cfg=geo,
            asset_paths=asset_paths,
            additional_mats=mats,
            additional_textures=textures,
            instances=instances,
            cameras=cameras,
            worlds=worlds,
        ),
        **extra,
    )
