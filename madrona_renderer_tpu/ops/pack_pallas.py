"""Fused Pallas input-pack kernel for the resident raytrace paths.

The XLA front half of the headline step (instance-state gather +
transform + row pack — ``raytrace_ref.planar_soup_parts`` laid out by
``raytrace_pallas._pack_rows_planar``) measured ~15% of the whole step
(r4 chainK epilogue probe, docs/benchmarks.md), and the r4 planar
rewrite proved the cost is the *gather* (``arr[obj]`` over the object
tables), not the layout: the planar layout alone read wall-clock
neutral. This kernel removes the gather from the program entirely:

  * **Bake-style plane expansion (XLA, tiny).** Every object-space
    plane the pack needs (v0/e1/e2/n0/dn1/dn2 xyz, uv planes, valid,
    mat, material color, and the precombined ``a_uv·texw·texh`` mip
    area) is expanded from ``[O, T]`` to ``[NP·O, S]`` by a pure
    broadcast — O(O·S) elements, no gather, fully fused by XLA.
  * **Per-instance scalars ride a tiny ``[W, NK, I]`` array** (pos,
    quat, scale, valid, obj id, inverse-scale, camera origin): ~70
    floats per world instead of the ~40·S packed rows XLA used to
    produce through gathers.
  * **The kernel (grid over world blocks)** rebuilds the exact packed
    rows on the VPU: per-lane instance region masks broadcast the
    scalars ([Wb,1] lane-broadcasts + static selects), an unrolled
    O-way select replaces the object gather, and the Möller–Trumbore /
    normal / density expressions mirror ``planar_soup_parts`` and
    ``_pack_rows_planar`` TERM-FOR-TERM so outputs stay bitwise equal
    (pinned by tests/test_pack_kernel.py; CLAUDE.md: term-identical
    trees or FMA contraction breaks parity).
  * **Outputs are emitted kernel-ready**: the split variant writes the
    SMEM geometry block and the VMEM attribute block (with the
    uv_defer prep-row mirror) as separate outputs, lane-padded to 128
    with exact zeros — the render path's ``_lane_pad`` / attr pad /
    row-slice copies all become no-ops.

Divide/sqrt discipline (Mosaic f32 divide misrounds ~1 ulp —
CLAUDE.md): the inverse-scale used by the normal transform is computed
in XLA at prep time (same expression tree as the reference) and
streamed as scalars, so the kernel's only divide/sqrt is the mip
``density`` row — exactly 0 for untextured scenes; for textured scenes
it is the one row documented ±1 ulp on chip (CPU interpret is bitwise).

Reference anchor: the render-ECS instance gather the reference runs per
step (``RenderingSystem::setupTasks``, src/sim.cpp:122-126) feeding the
raytracer's TLAS refit (src/mgr.cpp:468-479 configures the tracer).

Knobs: MRT_PACK_KERNEL=1 enables (default off until the on-chip A/B
lands — tools/tpu_pack_ab.py); MRT_PACK_WB sets the worlds-per-program
block (default 64, clamped to a divisor of W).
"""

from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.scene import SceneData
from ..core.state import SimState
from .quat import quat_rotate_planar

_LANE = 128

# Plane-table row indices (each a [O, T] object plane, expanded to
# [NP*O, S] for the kernel; order is load-bearing — _expand_planes and
# the kernel's gather helper must agree).
_P_V0 = 0          # 0-2   v0 xyz
_P_E1 = 3          # 3-5   e1 xyz
_P_E2 = 6          # 6-8   e2 xyz
_P_N0 = 9          # 9-11  n0 xyz
_P_DN1 = 12        # 12-14 dn1 xyz
_P_DN2 = 15        # 15-17 dn2 xyz
_P_UV0 = 18        # 18-19 uv0 xy
_P_DUV1 = 20       # 20-21 duv1 xy
_P_DUV2 = 22       # 22-23 duv2 xy
_P_VALID = 24      # tri_valid
_P_MAT = 25        # tri_mat as f32
_P_COL = 26        # 26-28 material color rgb (mat_color[tri_mat])
_P_TEXAREA = 29    # a_uv * texw * texh (mip density numerator)
_NP = 30

# Instance-scalar row indices in the [W, NK, I] array.
_K_POS = 0         # 0-2   position xyz
_K_QUAT = 3        # 3-6   rotation quat wxyz
_K_SCALE = 7       # 7-9   scale xyz
_K_VALID = 10      # instance_valid
_K_OBJ = 11        # object id as f32 (exact for ids < 2^24)
_K_INV = 12        # 12-14 inverse-scale xyz (XLA-computed, see header)
_K_CAM = 15        # 15-17 camera origin xyz (broadcast over I; 0 if none)
_NK = 18


def _expand_planes(scene: SceneData, I: int) -> jnp.ndarray:
    """Object plane table → ``[NP*O, S]`` (S = I*T), lane-padded to 128
    with zeros. Pure broadcast + tiny gathers over the static material
    tables; every value equals what ``planar_soup_parts`` would gather
    for an instance of that object, term-for-term."""
    O, T = scene.tri_valid.shape
    col = scene.mat_color[:, :3][scene.tri_mat]  # [O, T, 3]
    tex_id = scene.mat_tex[scene.tri_mat]  # [O, T]
    du1x, du1y = scene.duv1[..., 0], scene.duv1[..., 1]
    du2x, du2y = scene.duv2[..., 0], scene.duv2[..., 1]
    a_uv = jnp.abs(du1x * du2y - du1y * du2x)
    # Mirrors planar_soup_parts: a_uv * w.astype(f32) * h.astype(f32),
    # left-associated.
    tex_area = (
        a_uv
        * scene.tex_width[tex_id].astype(jnp.float32)
        * scene.tex_height[tex_id].astype(jnp.float32)
    )
    rows = [
        scene.v0[..., 0], scene.v0[..., 1], scene.v0[..., 2],
        scene.e1[..., 0], scene.e1[..., 1], scene.e1[..., 2],
        scene.e2[..., 0], scene.e2[..., 1], scene.e2[..., 2],
        scene.n0[..., 0], scene.n0[..., 1], scene.n0[..., 2],
        scene.dn1[..., 0], scene.dn1[..., 1], scene.dn1[..., 2],
        scene.dn2[..., 0], scene.dn2[..., 1], scene.dn2[..., 2],
        scene.uv0[..., 0], scene.uv0[..., 1],
        scene.duv1[..., 0], scene.duv1[..., 1],
        scene.duv2[..., 0], scene.duv2[..., 1],
        scene.tri_valid,
        scene.tri_mat.astype(jnp.float32),
        col[..., 0], col[..., 1], col[..., 2],
        tex_area,
    ]
    assert len(rows) == _NP
    base = jnp.stack(rows, axis=0)  # [NP, O, T]
    S = I * T
    exp = jnp.broadcast_to(base[:, :, None, :], (_NP, O, I, T))
    exp = exp.reshape(_NP * O, S)
    Sp = -(-S // _LANE) * _LANE
    if Sp != S:
        exp = jnp.pad(exp, ((0, 0), (0, Sp - S)))
    return exp


def _pack_inst(state: SimState, scene: SceneData, cam_pos) -> jnp.ndarray:
    """Per-instance scalar rows ``[W, NK, I]`` (see _K_* indices).

    The inverse-scale rows evaluate the exact planar_soup_parts
    expression in XLA (``1/max(|s|,1e-20) * sign(s + (s==0))``) so the
    kernel needs no divide for the normal transform."""
    W, I = state.instance_obj.shape
    scale = state.instance_scale  # [W, I, 3]
    inv = (
        1.0 / jnp.maximum(jnp.abs(scale), 1e-20)
        * jnp.sign(scale + (scale == 0))
    )
    cam = (
        jnp.zeros((W, 3), jnp.float32) if cam_pos is None
        else cam_pos.astype(jnp.float32)
    )
    rows = jnp.concatenate(
        [
            state.instance_pos.transpose(0, 2, 1),          # 0-2
            state.instance_rot.transpose(0, 2, 1),          # 3-6
            scale.transpose(0, 2, 1),                       # 7-9
            state.instance_valid[:, None, :],               # 10
            state.instance_obj.astype(jnp.float32)[:, None, :],  # 11
            inv.transpose(0, 2, 1),                         # 12-14
            jnp.broadcast_to(cam[:, :, None], (W, 3, I)),   # 15-17
        ],
        axis=1,
    )
    assert rows.shape == (W, _NK, I)
    return rows


def _make_kernel(O: int, I: int, T: int, Sp: int, split: bool,
                 with_cam: bool, uv_defer: bool):
    """Kernel factory. Emits (geo, attr) blocks for split=True, one
    combined 32-row block otherwise — row contents term-identical to
    raytrace_pallas._pack_rows_planar (see that docstring for the row
    map)."""
    S = I * T

    def kernel(inst_ref, planes_ref, *out_refs):
        Wb = inst_ref.shape[0]
        region = jax.lax.broadcasted_iota(jnp.int32, (1, Sp), 1) // T

        _rows = {}

        def inst_row(k):  # [Wb, I] (cached per k)
            if k not in _rows:
                _rows[k] = inst_ref[:, k, :]
            return _rows[k]

        def bw(k):
            """Instance scalar row k → [Wb, Sp] by lane-region select.
            Pad lanes (region ≥ I) stay exactly 0."""
            acc = jnp.zeros((Wb, Sp), jnp.float32)
            row = inst_row(k)
            for i in range(I):
                col = jnp.broadcast_to(row[:, i:i + 1], (Wb, Sp))
                acc = jnp.where(region == i, col, acc)
            return acc

        def bc(k):
            """Per-world scalar row k (same for every instance) →
            [Wb, Sp] lane broadcast."""
            return jnp.broadcast_to(inst_row(k)[:, 0:1], (Wb, Sp))

        obj = bw(_K_OBJ)

        def gp(p):
            """Object plane p → [Wb, Sp] via unrolled O-way select (the
            TPU-native gather: no scatter/gather op exists on Mosaic).
            Pad lanes: every expanded plane is zero there and obj==0
            keeps the o=0 plane → exactly 0."""
            acc = jnp.broadcast_to(planes_ref[p * O:p * O + 1, :], (Wb, Sp))
            for o in range(1, O):
                alt = jnp.broadcast_to(
                    planes_ref[p * O + o:p * O + o + 1, :], (Wb, Sp)
                )
                acc = jnp.where(obj == float(o), alt, acc)
            return acc

        pos = [bw(_K_POS + k) for k in range(3)]
        rotq = [bw(_K_QUAT + k) for k in range(4)]
        scale = [bw(_K_SCALE + k) for k in range(3)]

        def rot3(v):
            return quat_rotate_planar(*rotq, *v)

        # World-space geometry — mirrors planar_soup_parts term-for-term.
        v0 = rot3([scale[k] * gp(_P_V0 + k) for k in range(3)])
        v0 = tuple(v0[k] + pos[k] for k in range(3))
        e1 = rot3([scale[k] * gp(_P_E1 + k) for k in range(3)])
        e2 = rot3([scale[k] * gp(_P_E2 + k) for k in range(3)])
        val = gp(_P_VALID) * bw(_K_VALID)
        inv = [bw(_K_INV + k) for k in range(3)]
        n0 = rot3([gp(_P_N0 + k) * inv[k] for k in range(3)])
        dn1 = rot3([gp(_P_DN1 + k) * inv[k] for k in range(3)])
        dn2 = rot3([gp(_P_DN2 + k) * inv[k] for k in range(3)])

        # Mip density: world-space triangle area from the kernel's e1/e2
        # (same cross order + (x²+y²)+z² association as the reference);
        # the object-constant numerator a_uv·texw·texh was precombined.
        e1x, e1y, e1z = e1
        e2x, e2y, e2z = e2
        cwx = e1y * e2z - e1z * e2y
        cwy = e1z * e2x - e1x * e2z
        cwz = e1x * e2y - e1y * e2x
        a_world = jnp.sqrt(cwx * cwx + cwy * cwy + cwz * cwz)
        density = jnp.sqrt(gp(_P_TEXAREA) / jnp.maximum(a_world, 1e-30))

        mat = gp(_P_MAT)
        zero = jnp.zeros((Wb, Sp), jnp.float32)
        v0x, v0y, v0z = v0

        if split and with_cam:
            # Camera-origin-factored prep constants — mirrors
            # _pack_rows_planar's split+cam_pos branch term-for-term.
            ve1 = [e1[k] * val for k in range(3)]
            ve2 = [e2[k] * val for k in range(3)]
            o_ = [bc(_K_CAM + k) for k in range(3)]
            tvx = o_[0] - v0x
            tvy = o_[1] - v0y
            tvz = o_[2] - v0z
            qx = tvy * ve1[2] - tvz * ve1[1]
            qy = tvz * ve1[0] - tvx * ve1[2]
            qz = tvx * ve1[1] - tvy * ve1[0]
            geo_rows = [
                ve2[1] * ve1[2] - ve2[2] * ve1[1],  # D
                ve2[2] * ve1[0] - ve2[0] * ve1[2],
                ve2[0] * ve1[1] - ve2[1] * ve1[0],
                ve2[1] * tvz - ve2[2] * tvy,  # A
                ve2[2] * tvx - ve2[0] * tvz,
                ve2[0] * tvy - ve2[1] * tvx,
                qx, qy, qz,  # Q
                ve2[0] * qx + ve2[1] * qy + ve2[2] * qz,  # t_num
                zero, zero, zero, zero, zero, zero,
            ]
        elif split:
            geo_rows = [
                v0x, v0y, v0z,
                e1[0] * val, e1[1] * val, e1[2] * val,
                e2[0] * val, e2[1] * val, e2[2] * val,
                zero, zero, zero, zero, zero, zero, zero,
            ]
        attr_rows = [
            gp(_P_UV0), gp(_P_UV0 + 1),
            gp(_P_DUV1), gp(_P_DUV1 + 1),
            gp(_P_DUV2), gp(_P_DUV2 + 1),
            n0[0], n0[1], n0[2],
            dn1[0], dn1[1], dn1[2],
            dn2[0], dn2[1], dn2[2],
            mat,
            gp(_P_COL), gp(_P_COL + 1), gp(_P_COL + 2),
            density,
        ]
        if split:
            geo_ref, attr_ref = out_refs
            for r, row in enumerate(geo_rows):
                geo_ref[:, r, :] = row
            a_rows = attr_rows + [zero, zero, zero, zero]
            if uv_defer:
                # Mirror the 10 prep rows behind the 24 attr rows
                # (rows 24-33) for the resolve's lane gathers.
                a_rows = a_rows + geo_rows[0:10]
            for r, row in enumerate(a_rows):
                attr_ref[:, r, :] = row
        else:
            rows = [
                v0x, v0y, v0z,
                e1[0] * val, e1[1] * val, e1[2] * val,
                e2[0] * val, e2[1] * val, e2[2] * val,
                val,
            ] + attr_rows + [zero, zero]
            (out_ref,) = out_refs
            for r, row in enumerate(rows):
                out_ref[:, r, :] = row

    return kernel


def pack_rows_pallas(
    state: SimState,
    scene: SceneData,
    cam_pos=None,
    split: bool = False,
    uv_defer: bool = False,
    interpret: bool = False,
):
    """Pallas-kernel twin of ``raytrace_pallas._pack_rows_planar``.

    Returns lane-padded (S → ceil(S/128)·128, zero-filled) arrays:
    ``split=True`` → ``(geo [W, 16, Sp], attrs [W, 24(+10), Sp])``;
    ``split=False`` → ``tris [W, 32, Sp]``. Real lanes are bitwise
    equal to the XLA pack (tests/test_pack_kernel.py); zero pad lanes
    are semantically inert for every consumer (the render kernels bound
    all loops by unpadded counts)."""
    W, I = state.instance_obj.shape
    O, T = scene.tri_valid.shape
    S = I * T
    Sp = -(-S // _LANE) * _LANE

    planes = _expand_planes(scene, I)
    inst = _pack_inst(state, scene, cam_pos)

    wb = int(_os.environ.get("MRT_PACK_WB", "64"))
    while W % wb != 0:
        wb //= 2
    wb = max(wb, 1)

    kernel = _make_kernel(
        O, I, T, Sp, split, with_cam=cam_pos is not None, uv_defer=uv_defer
    )
    inst_spec = pl.BlockSpec(
        (wb, _NK, I), lambda w: (w, 0, 0), memory_space=pltpu.VMEM
    )
    planes_spec = pl.BlockSpec(
        (_NP * O, Sp), lambda w: (0, 0), memory_space=pltpu.VMEM
    )
    if split:
        n_attr = 24 + (10 if uv_defer else 0)
        out_shape = [
            jax.ShapeDtypeStruct((W, 16, Sp), jnp.float32),
            jax.ShapeDtypeStruct((W, n_attr, Sp), jnp.float32),
        ]
        out_specs = [
            pl.BlockSpec((wb, 16, Sp), lambda w: (w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, n_attr, Sp), lambda w: (w, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        out_shape = [jax.ShapeDtypeStruct((W, 32, Sp), jnp.float32)]
        out_specs = [
            pl.BlockSpec((wb, 32, Sp), lambda w: (w, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    outs = pl.pallas_call(
        kernel,
        grid=(W // wb,),
        in_specs=[inst_spec, planes_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(inst, planes)
    return tuple(outs) if split else outs[0]


def pack_kernel_wanted(scene: SceneData, n_instances: int) -> bool:
    """Gate: MRT_PACK_KERNEL=1 plus unroll-sanity bounds (the kernel
    unrolls O-way plane selects and I-way scalar selects)."""
    if _os.environ.get("MRT_PACK_KERNEL", "0") != "1":
        return False
    O = int(scene.tri_valid.shape[0])
    return O <= int(_os.environ.get("MRT_PACK_KERNEL_MAXOBJ", "8")) and (
        n_instances <= 64
    )
