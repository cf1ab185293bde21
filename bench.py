"""Headline benchmark: frames/sec at the driver's north-star config.

Default run = 4096 worlds × 1 camera × 64×64 RGB-D raytrace on one chip
(BASELINE.json north_star: ≥1e5 frames/sec). Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N}

vs_baseline is value / 1e5 (the driver-declared target; the reference
publishes no numbers of its own — see BASELINE.md).

The default (argument-less, driver) invocation additionally runs the five
BASELINE.json configs and embeds them in that same line under "configs", so
every round's artifact carries the full perf ladder.

Other configs: bench.py [--worlds N] [--steps N] [--mode rt|rast]
[--width W] [--height H] [--impl auto|jnp|pallas] [--all] (--all runs the
five BASELINE.json configs and prints one JSON line each) [--headline-only]
(skip the config suite). MRT_BENCH_SMOKE=1 shrinks every config ~256x for
CI smoke-testing of the full code path on CPU.
"""

from __future__ import annotations

import argparse
import json
import os
import time

# Persistent XLA compilation cache (MRT_COMPILE_CACHE=0 disables): the
# driver invokes bench.py as a fresh process; with the cache warmed by a
# prior chain run of the same ladder, its bounded health-wait budget goes
# to measurement instead of recompiles. Identical executables — timings
# unaffected. (jax 0.9 ignores the JAX_COMPILATION_CACHE_DIR env var;
# utils/compile_cache.py uses the config API.)
from madrona_renderer_tpu.utils import compile_cache as _compile_cache

_compile_cache.enable()


def build(num_worlds: int, mode_str: str, width: int, height: int, impl: str,
          scene: str = "demo"):
    """scene: 'demo' (raw-geometry cube+plane), 'demo_disk' (same via
    cube.obj/plane.obj files), 'textured' (checker on the cube),
    'textured_ktx' (checker delivered as BasisLZ .ktx2), 'wall'
    (wall_render.obj scene — BASELINE config 3)."""
    from madrona_renderer_tpu.config import RenderMode
    from madrona_renderer_tpu.assets.importer import load_render_assets
    from madrona_renderer_tpu.core.scene import bake_scene
    from madrona_renderer_tpu.core.state import init_state
    from madrona_renderer_tpu.runners.scenes import demo_config, wall_scene_config

    mode = RenderMode.Raytracer if mode_str == "rt" else RenderMode.Rasterizer
    if scene == "wall":
        cfg = wall_scene_config(num_worlds, mode, width, height, impl=impl)
    elif scene == "terrain":
        # r3 scale row: DMA-streamed big mesh (tools/tpu_bigmesh_bench's
        # heightfield, ~10k tris/instance), deferred split-layout sweep.
        from tools.tpu_bigmesh_bench import build_scene as _terrain

        state, scene_d = _terrain(num_worlds)
        cfg = demo_config(num_worlds, mode, width, height, impl=impl)
        return state, scene_d, cfg
    elif scene == "textured256":
        # r3 scale row: 256×256 texture → mip chains + paged texel pool.
        from tools.tpu_paged_tex_bench import build_scene as _paged

        state, scene_d = _paged(num_worlds, 256, "auto")
        cfg = demo_config(num_worlds, mode, width, height, impl=impl)
        return state, scene_d, cfg
    else:
        cfg = demo_config(
            num_worlds, mode, width, height, dynamic=True, impl=impl,
            textured=scene.startswith("textured"), tex_size=32,
            tex_format="ktx2" if scene == "textured_ktx" else "png",
            from_disk=scene == "demo_disk",
            num_cams=4 if scene == "multicam" else 1,
        )
    assets = load_render_assets(
        cfg.rcfg.geo_cfg,
        cfg.rcfg.asset_paths,
        cfg.rcfg.additional_mats,
        cfg.rcfg.additional_textures,
    )
    scene = bake_scene(assets)
    state = init_state(cfg.rcfg.instances, cfg.rcfg.cameras, cfg.rcfg.worlds)
    return state, scene, cfg


def resolve_impl(impl: str) -> str:
    if impl != "auto":
        return impl
    import jax

    return "pallas" if jax.devices()[0].platform in ("tpu", "axon") else "jnp"


def run_config(
    num_worlds: int,
    steps: int,
    mode_str: str,
    width: int,
    height: int,
    impl: str,
    warmup: int = 3,
    scene: str = "demo",
    move_cams: bool = False,
    warmstart: bool = False,
    ssaa: int = 1,
    watertight: bool = False,
) -> float:
    """Returns frames/sec (steps × worlds / elapsed) for the steady-state
    loop, timed like the reference headless bench (src/headless.cpp:57-78)
    but with an explicit device sync and compile excluded."""
    import dataclasses
    from functools import partial

    import jax

    impl = resolve_impl(impl)
    state, scene, cfg = build(num_worlds, mode_str, width, height, impl,
                              scene=scene)

    if mode_str == "rt":
        try:
            if impl != "pallas":
                raise ImportError
            from madrona_renderer_tpu.ops.raytrace_pallas import raytrace as render
        except ImportError:
            from madrona_renderer_tpu.ops.raytrace_ref import raytrace as render
        near = cfg.near_plane
    else:
        try:
            if impl != "pallas":
                raise ImportError
            from madrona_renderer_tpu.ops.raster_pallas import rasterize as render
        except ImportError:
            from madrona_renderer_tpu.ops.raster_ref import rasterize as render
        near = cfg.raster_near_plane

    from madrona_renderer_tpu.ops.quat import quat_multiply, quat_normalize

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, scene):
        # On-device per-step dynamics (the RL-workload shape): advance time
        # and spin every instance a little so no two frames are alike.
        import jax.numpy as jnp

        half = jnp.float32(0.015)
        dq = jnp.array(
            [jnp.cos(half), 0.0, 0.0, jnp.sin(half)], jnp.float32
        )
        updates = dict(
            time=state.time + 0.05,
            instance_rot=quat_normalize(quat_multiply(dq, state.instance_rot)),
        )
        if move_cams:
            # BASELINE config 4: cameras move too (bob vertically).
            bob = jnp.asarray(0.12 * jnp.sin(state.time * 2.0))
            while bob.ndim < state.camera_pos.ndim - 1:
                bob = bob[..., None]
            updates["camera_pos"] = state.camera_pos.at[..., 2].add(bob)
        state = dataclasses.replace(state, **updates)
        frames = render(
            state, scene, height=height * ssaa, width=width * ssaa,
            near=near, far=cfg.far_plane,
            **({"watertight": True} if watertight else {}),
        )
        if ssaa > 1:
            # SSAA quality-tier row: supersampled render + box filter
            # (ops/ssaa.py) — the export the user actually receives.
            from madrona_renderer_tpu.ops.ssaa import downsample_frames

            frames = downsample_frames(frames, ssaa)
        return state, frames

    # Multi-step rollout in ONE dispatch (lax.scan), stacking every step's
    # rgb like a training rollout buffer — nothing can be dead-code
    # eliminated (a checksum over the stack is returned and fetched).
    #
    # Measurement: two-point (n_small and n_big rollouts, both
    # pre-compiled), synced by fetching the checksum VALUE — on the axon
    # tunnel, block_until_ready can return before execution finishes; only
    # a value fetch truly syncs. The slope removes constant
    # dispatch/fetch/tunnel overhead; warming both sizes keeps compiles out
    # of the timed region.
    import numpy as np

    if warmstart:
        # Temporal warm-start rollout (ops/warmstart.py): same dynamics,
        # the previous frame's depth carried through the scan. Output is
        # bitwise-equal to the cold rollout by construction.
        import jax.numpy as jnp

        from madrona_renderer_tpu.ops.warmstart import raytrace_warmstart

        # move_cams is unsupported here: dynamics_only applies only the
        # instance rotation, so a warm row with camera bob would bench
        # different dynamics than its cold baseline — keep that loud.
        assert mode_str == "rt" and impl == "pallas" and not move_cams
        C = state.camera_pos.shape[1]
        prev0 = jnp.full((num_worlds, C, height, width), cfg.far_plane,
                         jnp.float32)

        @partial(jax.jit, static_argnames=("n",))
        def rollout(state, scene, n):
            def body(carry, _):
                st, prev = carry
                st, _frames = dynamics_only(st)
                frames = raytrace_warmstart(
                    st, scene, prev_depth=prev, height=height, width=width,
                    near=near, far=cfg.far_plane)
                return (st, frames.depth), frames.rgb

            (st, _), stack = jax.lax.scan(body, (state, prev0), None,
                                          length=n)
            return st, stack, jnp.sum(stack[:, 0].astype(jnp.int32))

        def dynamics_only(st):
            import jax.numpy as jnp

            half = jnp.float32(0.015)
            dq = jnp.array([jnp.cos(half), 0.0, 0.0, jnp.sin(half)],
                           jnp.float32)
            st = dataclasses.replace(
                st, time=st.time + 0.05,
                instance_rot=quat_normalize(
                    quat_multiply(dq, st.instance_rot)),
            )
            return st, None
    else:
        @partial(jax.jit, static_argnames=("n",))
        def rollout(state, scene, n):
            def body(st, _):
                st, frames = step(st, scene)
                return st, frames.rgb

            st, stack = jax.lax.scan(body, state, None, length=n)
            import jax.numpy as jnp

            # Return the stack too so the rollout buffer is really
            # materialized in HBM (only the checksum is fetched).
            return st, stack, jnp.sum(stack[:, 0].astype(jnp.int32))

    n_small = max(2, steps // 4)
    n_big = max(steps, n_small + 1)
    state, _, ck = rollout(state, scene, n_small)
    float(np.asarray(ck))
    state, _, ck = rollout(state, scene, n_big)
    float(np.asarray(ck))
    del warmup

    t0 = time.perf_counter()
    state, _, ck = rollout(state, scene, n_small)
    float(np.asarray(ck))
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, _, ck = rollout(state, scene, n_big)
    float(np.asarray(ck))
    t_big = time.perf_counter() - t0
    per_step = (t_big - t_small) / (n_big - n_small)
    if per_step <= 0:
        # Tiny configs: the step is below the dispatch/fetch noise floor;
        # report the conservative single-rollout bound instead.
        per_step = t_big / n_big
    return num_worlds / per_step


def _smoke() -> bool:
    import os

    return os.environ.get("MRT_BENCH_SMOKE", "0") == "1"


def _scaled(worlds: int) -> int:
    return max(1, worlds // 256) if _smoke() else worlds


BASELINE_CONFIGS = [
    # (name, worlds, steps, mode, width, height, scene, move_cams) —
    # matching BASELINE.json's declared configs:
    # 1: cube.obj + plane.obj (disk assets), 1 world
    ("cpu_sanity_1w", 1, 8, "rt", 64, 64, "demo_disk", False),
    # 2: 256 worlds, textured cube (checker → BasisLZ KTX2), rasterized
    ("raster_256w", 256, 60, "rast", 64, 64, "textured_ktx", False),
    # 3: 4096 worlds, wall_render.obj scene, 128×128 RGB-D raytrace
    ("raytrace_4096w_128px", 4096, 5, "rt", 128, 128, "wall", False),
    # 4: 8192 worlds, dynamic instance transforms + moving cameras
    ("dynamic_8192w", 8192, 10, "rt", 64, 64, "demo", True),
    # Textured north-star (VERDICT r1 #5): in-kernel nearest sampling of a
    # 32x32 checkerboard on the cube.
    ("textured_4096w", 4096, 20, "rt", 64, 64, "textured", False),
    # Round-3 scale rows (beyond the five declared configs; the scale
    # frontier VERDICT r2 asked to attack — see docs/benchmarks.md):
    # a DMA-streamed ~21k-tri/world mesh and a paged 256² texture.
    ("bigmesh_512w", 512, 4, "rt", 64, 64, "terrain", False),
    ("textured256_4096w", 4096, 10, "rt", 64, 64, "textured256", False),
    # Round-4: the same big-mesh row with the temporal warm-start tier
    # (ops/warmstart.py; bitwise-equal output, previous-frame depth
    # seeds). Its honest baseline is the cold bigmesh row's canonical.
    # NOT in the default driver ladder (VERDICT r4 weak #3): the tier has
    # no measured healthy benefit yet and its in-clamp read is a pure
    # per-launch artifact (exactly ~0.5x cold) with no information
    # content. Re-enters the ladder when tools/tpu_seed_probe.py decides
    # the tier with a healthy read — opt in with MRT_BENCH_WARM_ROW=1.
    # Round-4 quality-tier row: the textured north-star with ssaa=2
    # (renders 128², exports antialiased 64² — ops/ssaa.py). Its honest
    # baseline is the un-supersampled textured row: vs_canonical reads
    # the quality tier's cost factor (~1/4 expected) directly.
    ("textured_4096w_ssaa2", 4096, 10, "rt", 64, 64, "textured", False),
    # Round-4 quality-tier row: the textured north-star through the Woop
    # watertight decision sweep (crack-free seams; ops/watertight.py +
    # raytrace_pallas.py watertight=). Baseline = the ε-slack textured
    # row, so vs_canonical reads the quality tier's cost factor.
    ("watertight_4096w", 4096, 10, "rt", 64, 64, "textured", False),
    # Round-4 multi-agent row: 1024 worlds × 4 cameras (the reference
    # attaches one view per agent — src/sim.cpp:168-171), same total
    # view count as the 4096-world headline. Exercises the supertile
    # CAMERA fold (C views share one geometry block per program). FPS
    # counts world-steps (reference convention); views/s = 4×.
    ("multicam_1024w4c", 1024, 20, "rt", 64, 64, "multicam", False),
]
if os.environ.get("MRT_BENCH_WARM_ROW", "0") == "1":
    BASELINE_CONFIGS.append(
        ("bigmesh_512w_warm", 512, 4, "rt", 64, 64, "terrain", False))
_WARMSTART_ROWS = {"bigmesh_512w_warm"}
_SSAA_ROWS = {"textured_4096w_ssaa2": 2}
_WATERTIGHT_ROWS = {"watertight_4096w"}


# Canonical healthy-session values per ladder row (round-3 record,
# docs/benchmarks.md — full-ladder runs with tpu_health healthy). Scale
# rows (bigmesh/textured256) have no meaningful ratio against the
# 4096-world north-star, so their vs_baseline divides by THIS anchor
# instead (VERDICT r3 #9); every row also reports vs_canonical so
# regressions are machine-readable. raster_256w is a documented volatile
# row (287–620k across healthy runs); its canonical is the spread mid.
CANONICAL_FPS = {
    "cpu_sanity_1w": 500.0,  # CPU-backend jnp reference by design
    "raster_256w": 450000.0,  # volatile row, see docs/benchmarks.md
    "raytrace_4096w_128px": 139277.0,
    "dynamic_8192w": 531922.0,
    "textured_4096w": 401039.0,
    "bigmesh_512w": 1971.0,
    "bigmesh_512w_warm": 1971.0,  # baseline = the cold bigmesh canonical
    # No healthy r4 read yet: baseline = the un-supersampled textured
    # canonical, so vs_canonical reads the ssaa=2 cost factor (~0.25).
    "textured_4096w_ssaa2": 401039.0,
    # No healthy r4 read yet: baseline = the ε-slack textured canonical,
    # so vs_canonical reads the watertight tier's cost factor.
    "watertight_4096w": 401039.0,
    "textured256_4096w": 181073.0,
    "ppo_streaming_16384w": 396610.0,
    # No healthy r4 read yet: baseline = the north-star per-VIEW ceiling
    # over this row's 4 views/world, so vs_canonical reads how close the
    # camera fold gets 4-view worlds to the 1-view view-throughput.
    "multicam_1024w4c": 518575.0 / 4,
    "north_star": 518575.0,
}
# Rows whose honest baseline is the per-row canonical, not the 1e5
# north-star target (10.6M resident triangles / paged 256² textures are
# different workloads than the 4096-world demo scene).
_SCALE_ROWS = ("bigmesh_512w", "bigmesh_512w_warm",
               "textured256_4096w", "cpu_sanity_1w",
               "textured_4096w_ssaa2", "watertight_4096w",
               "multicam_1024w4c")


def run_ppo_streaming(num_worlds: int = 16384, updates: int = 3, res: int = 64) -> float:
    """BASELINE config 5: rendered frames/sec streamed into a jitted PPO
    train step (see madrona_renderer_tpu.rl.ppo)."""
    import time

    import jax

    from madrona_renderer_tpu.config import RenderMode
    from madrona_renderer_tpu.assets.importer import load_render_assets
    from madrona_renderer_tpu.core.scene import bake_scene
    from madrona_renderer_tpu.core.state import init_state
    from madrona_renderer_tpu.rl.ppo import PPOConfig, init_policy_params, make_train_step
    from madrona_renderer_tpu.runners.scenes import demo_config

    cfg = demo_config(num_worlds, RenderMode.Raytracer, res, res, dynamic=True)
    assets = load_render_assets(
        cfg.rcfg.geo_cfg, cfg.rcfg.asset_paths, cfg.rcfg.additional_mats,
        cfg.rcfg.additional_textures,
    )
    scene = bake_scene(assets)
    state = init_state(cfg.rcfg.instances, cfg.rcfg.cameras, cfg.rcfg.worlds)
    ppo = PPOConfig(height=res, width=res, rollout_len=4)
    key = jax.random.PRNGKey(0)
    params = init_policy_params(ppo, key)
    train_step = make_train_step(scene, ppo)
    opt_state = train_step.init_optimizer(params)
    import numpy as np

    params, opt_state, state, key, metrics = train_step(params, opt_state, state, key)
    float(np.asarray(metrics["loss"]))  # value fetch = true sync
    t0 = time.perf_counter()
    for _ in range(updates):
        params, opt_state, state, key, metrics = train_step(params, opt_state, state, key)
    float(np.asarray(metrics["loss"]))
    dt = time.perf_counter() - t0
    frames = updates * (ppo.rollout_len + 1) * num_worlds  # renders/update
    return frames / dt


def run_baseline_suite(impl: str) -> dict:
    """All five BASELINE.json configs, each isolated so one failure can't
    sink the artifact. Returns {name: {value, vs_baseline} | {error}}."""
    import sys
    import traceback

    out = {}
    for name, worlds, steps, mode, w, h, scene, move_cams in BASELINE_CONFIGS:
        try:
            if name == "cpu_sanity_1w":
                # Declared as a CPU-backend sanity config: run the jnp
                # reference on the host CPU even when a TPU is attached.
                import jax

                with jax.default_device(jax.devices("cpu")[0]):
                    fps = run_config(_scaled(worlds), steps, mode, w, h,
                                     "jnp", scene=scene, move_cams=move_cams)
                # This row runs on the HOST CPU and is sensitive to
                # concurrent load (r3+r4 both flagged disregardable
                # reads); stamp the 1-min loadavg so readers can tell a
                # loaded-host read from a real regression (VERDICT r4 #6b).
                try:
                    host_load = round(os.getloadavg()[0], 2)
                except OSError:
                    host_load = None
            elif name in _WARMSTART_ROWS:
                # warmstart is a Pallas-kernel feature; force that impl
                # (interpret mode on CPU smoke, compiled on TPU).
                fps = run_config(_scaled(worlds), steps, mode, w, h,
                                 "pallas", scene=scene, move_cams=move_cams,
                                 warmstart=True)
            else:
                fps = run_config(_scaled(worlds), steps, mode, w, h, impl,
                                 scene=scene, move_cams=move_cams,
                                 ssaa=_SSAA_ROWS.get(name, 1),
                                 watertight=name in _WATERTIGHT_ROWS)
            base = CANONICAL_FPS[name] if name in _SCALE_ROWS else 1e5
            out[name] = {
                "value": round(fps, 1),
                "vs_baseline": round(fps / base, 4),
                "vs_canonical": round(fps / CANONICAL_FPS[name], 4),
            }
            if name == "cpu_sanity_1w" and host_load is not None:
                out[name]["host_load_1min"] = host_load
            if _smoke():
                out[name]["smoke_worlds"] = _scaled(worlds)
        except Exception:
            traceback.print_exc(file=sys.stderr)
            out[name] = {"error": traceback.format_exc(limit=1).strip()[-200:]}
    try:
        fps = run_ppo_streaming(num_worlds=_scaled(16384))
        out["ppo_streaming_16384w"] = {
            "value": round(fps, 1),
            "vs_baseline": round(fps / 1e5, 4),
            "vs_canonical": round(fps / CANONICAL_FPS["ppo_streaming_16384w"], 4),
        }
    except Exception:
        traceback.print_exc(file=sys.stderr)
        out["ppo_streaming_16384w"] = {
            "error": traceback.format_exc(limit=1).strip()[-200:]
        }
    return out


def _tpu_backend() -> bool:
    import jax

    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


def _wait_for_healthy_tpu() -> dict | None:
    """Gate the driver artifact's timed runs on tunnel health.

    The single-chip axon tunnel oscillates between a healthy regime and a
    stable-but-slow one that can persist for hours; in the slow regime
    *all* terrain configs read ~identical ms (kernel-work changes of 3×
    are invisible) and small-config reads can be garbage in either
    direction, so numbers measured there are meaningless (CLAUDE.md,
    docs/benchmarks.md protocol). Before timing, measure the known
    anchor row (32w × 224-grid terrain @ 512², healthy ≈ 86–95 f/s,
    degraded ≈ 50.7) and poll — inside this one long-lived client —
    until it recovers or the budget runs out. Returns an annotation dict
    for the artifact (never raises; None = gate skipped).

    Knobs: MRT_BENCH_HEALTH=0 disables; MRT_BENCH_HEALTHY_FPS (default
    75) is the recovery bar; MRT_BENCH_WAIT_MIN (default 10) bounds the
    wait so a driver-side timeout can't kill us mid-execution (a killed
    client wedges the tunnel for the *next* session too). The default is
    deliberately short: slow-regime episodes last hours (one 10+ h), so
    a long in-bench wait buys little recovery probability while exposing
    the artifact run to driver timeouts; the annotation — not the wait —
    is the load-bearing part.
    """
    import os
    import sys

    if os.environ.get("MRT_BENCH_HEALTH", "1") == "0" or _smoke():
        return None
    if not _tpu_backend():
        return None
    bar = float(os.environ.get("MRT_BENCH_HEALTHY_FPS", "75"))
    budget_s = 60.0 * float(os.environ.get("MRT_BENCH_WAIT_MIN", "10"))

    try:
        import dataclasses
        from functools import partial

        import jax
        import jax.numpy as jnp
        import numpy as np

        from tools.tpu_binned_bench import build_scene as terrain_scene
        from madrona_renderer_tpu.ops.quat import quat_multiply, quat_normalize
        from madrona_renderer_tpu.ops.raytrace_pallas import raytrace

        state0, scene = terrain_scene(32, 224)

        # Rollout body mirrors tools/tpu_env_ab.py's anchor EXACTLY
        # (incl. the materialized rgb stack): the healthy range for this
        # row (86–95 f/s) and the slow-regime signature (50.7) were
        # calibrated with that formulation — a leaner body would need
        # its own calibration.
        @partial(jax.jit, static_argnames=("n",))
        def rollout(st, n):
            def body(s, _):
                half = jnp.float32(0.01)
                dq = jnp.array(
                    [jnp.cos(half), 0.0, 0.0, jnp.sin(half)], jnp.float32
                )
                s = dataclasses.replace(
                    s,
                    time=s.time + 0.05,
                    instance_rot=quat_normalize(
                        quat_multiply(dq, s.instance_rot)
                    ),
                )
                f = raytrace(s, scene, height=512, width=512, accel="binned")
                return s, f.rgb

            st, stack = jax.lax.scan(body, st, None, length=n)
            return st, jnp.sum(stack[:, 0, ::16].astype(jnp.int32))

        def probe() -> float:
            st, ck = rollout(state0, 2)  # warm both trace sizes
            float(np.asarray(ck))
            st, ck = rollout(st, 6)
            float(np.asarray(ck))
            t0 = time.perf_counter()
            st, ck = rollout(st, 2)
            float(np.asarray(ck))
            t_small = time.perf_counter() - t0
            t0 = time.perf_counter()
            st, ck = rollout(st, 6)
            float(np.asarray(ck))
            t_big = time.perf_counter() - t0
            per_step = (t_big - t_small) / 4
            if per_step <= 0:
                per_step = t_big / 6
            return 32.0 / per_step

        # Budget starts AFTER the first probe: that probe includes the
        # 512² terrain compile (up to 15 min cold — CLAUDE.md), and r4's
        # artifact showed the gate expiring inside it with waited_s=0.0
        # (VERDICT r4 weak #4). waited_s reports real elapsed gate time
        # (compile included) so the annotation is trustworthy.
        t_gate0 = time.perf_counter()
        fps = probe()
        t_start = time.perf_counter()
        compile_s = t_start - t_gate0
        while fps < bar and (time.perf_counter() - t_start) < budget_s:
            print(
                f"bench: anchor {fps:.1f} f/s < {bar:.0f} (slow tunnel "
                "regime) — waiting for recovery...",
                file=sys.stderr,
                flush=True,
            )
            time.sleep(120)
            fps = probe()
        if fps >= bar:
            # A single healthy read can be a recovery flicker (r4: one
            # 75.8 between hours of 23.0); confirm before annotating the
            # artifact healthy. A failed confirmation keeps waiting on
            # the remaining budget.
            time.sleep(10)
            fps2 = probe()
            print(
                f"bench: anchor confirm {fps2:.1f} f/s",
                file=sys.stderr, flush=True,
            )
            while fps2 < bar and (time.perf_counter() - t_start) < budget_s:
                time.sleep(120)
                fps = probe()
                if fps < bar:
                    continue
                time.sleep(10)
                fps2 = probe()
                print(
                    f"bench: anchor confirm {fps2:.1f} f/s",
                    file=sys.stderr, flush=True,
                )
            fps = min(fps, fps2)
        return {
            "anchor_fps": round(fps, 1),
            "healthy": fps >= bar,
            # Real elapsed gate time (anchor compile included) and the
            # compile share of it, so "waited_s: 0" can never again mean
            # "the budget expired inside the compile".
            "waited_s": round(time.perf_counter() - t_gate0, 1),
            "anchor_compile_s": round(compile_s, 1),
        }
    except Exception:
        import traceback

        traceback.print_exc(file=sys.stderr)
        return {"error": "health probe failed"}


def main() -> None:
    # The axon TPU plugin ignores the JAX_PLATFORMS env var; honor it
    # explicitly so `JAX_PLATFORMS=cpu python bench.py` (CI smoke) really
    # runs on CPU instead of grabbing the single-client TPU tunnel.
    import os

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--mode", choices=["rt", "rast"], default="rt")
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--impl", default="auto")
    ap.add_argument("--all", action="store_true",
                    help="one JSON line per BASELINE config (human use)")
    ap.add_argument("--headline-only", action="store_true",
                    help="skip the BASELINE config suite in the default run")
    args = ap.parse_args()

    default_invocation = (
        not args.all
        and not args.headline_only
        and args.worlds == 4096 and args.mode == "rt"
        and args.width == 64 and args.height == 64
    )

    health = _wait_for_healthy_tpu() if default_invocation else None

    if args.all:
        for name, result in run_baseline_suite(args.impl).items():
            print(json.dumps({"metric": name, "unit": "frames/sec", **result}))

    fps = run_config(
        _scaled(args.worlds), args.steps, args.mode, args.width, args.height,
        args.impl,
    )
    record = {
        "metric": f"{'raytrace' if args.mode == 'rt' else 'raster'}_fps_"
        f"{args.worlds}w_{args.width}px",
        "value": round(fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 1e5, 4),
    }
    if args.worlds == 4096 and args.width == 64 and args.mode == "rt":
        record["vs_canonical"] = round(fps / CANONICAL_FPS["north_star"], 4)
    if _smoke():
        # Smoke mode shrinks every config ~256×: mark the artifact so a
        # lingering MRT_BENCH_SMOKE=1 can never pass scaled numbers off as
        # full-scale results under the full-scale metric name.
        record["smoke"] = True
        record["worlds_measured"] = _scaled(args.worlds)
    if default_invocation:
        # The driver's invocation (plain `python bench.py`): carry the full
        # BASELINE ladder inside the one parsed JSON line so regressions in
        # the non-headline configs are visible per round (VERDICT r1 #9).
        record["configs"] = run_baseline_suite(args.impl)
    if health is not None:
        # Tunnel-health annotation: healthy=false marks the whole artifact
        # as measured in the slow regime (numbers there are unreliable in
        # both directions — see docs/benchmarks.md protocol).
        record["tpu_health"] = health
        if not health.get("healthy"):
            # Degraded capture: embed the per-row canonical healthy-session
            # values (most recent full-ladder run with tpu_health.healthy
            # =true, maintained above) so the artifact carries the real
            # capability next to the clamped reads. The clamp is a
            # server-side TPU-host regime that can span an entire round
            # (docs/benchmarks.md protocol note 4); these reference values
            # are clearly labeled, never substituted for the live ones.
            record["canonical_healthy_reference"] = {
                k: v for k, v in CANONICAL_FPS.items()
            }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
