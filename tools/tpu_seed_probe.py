"""Oracle probe for best_t seeding (VERDICT r3 #3, terrain >=150 f/s).

Measures the UPPER BOUND of any depth-prepass / temporal-warm-start
scheme: a static terrain rendered with per-pixel best_t seeded by the
exact previous frame's depth x1.001 (the best seed any scheme could
produce). If even oracle seeding does not reach the target, the lever
is falsified with numbers; if it does, the repair-pass machinery is
worth building.

Both configs self-feed the previous frame's depth through the rollout
(data dependence defeats XLA loop-hoisting on the static scene):
  - baseline: seed = far everywhere (bitwise no-op vs unseeded math,
    but pays the same seed-input read — a fair A/B);
  - oracle:   seed = min(prev_depth * 1.001, far).

A health anchor (the canonical rotating-terrain config) runs first;
discard the session if it reads far off 86-95 f/s (CLAUDE.md protocol).

Usage: python -u tools/tpu_seed_probe.py [--worlds 32] [--grid 224]
       [--res 512] [--rounds 3] [--wait-healthy 75] [--wait-max-min 120]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_binned_bench import build_scene, log  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=32)
    ap.add_argument("--grid", type=int, default=224)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--steps", type=int, nargs=2, default=[2, 6])
    ap.add_argument("--wait-healthy", type=float, default=0.0)
    ap.add_argument("--wait-max-min", type=float, default=120.0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon plugin ignores "
                    "JAX_PLATFORMS=cpu — CLAUDE.md)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        # The module-import compile-cache opt-in saw an unset platform;
        # CPU runs must not cache (utils/compile_cache.py SIGILL note).
        jax.config.update("jax_compilation_cache_dir", None)
    import jax.numpy as jnp
    import numpy as np

    from madrona_renderer_tpu.ops.quat import quat_multiply, quat_normalize
    from madrona_renderer_tpu.ops.raytrace_pallas import raytrace

    log(f"devices: {jax.devices()}")
    state0, scene = build_scene(args.worlds, args.grid)
    res = args.res

    # --- health anchor: the canonical rotating-terrain rollout ---------
    @partial(jax.jit, static_argnames=("n",))
    def anchor_rollout(st, n):
        def body(s, _):
            half = jnp.float32(0.01)
            dq = jnp.array([jnp.cos(half), 0.0, 0.0, jnp.sin(half)],
                           jnp.float32)
            s = dataclasses.replace(
                s, time=s.time + 0.05,
                instance_rot=quat_normalize(quat_multiply(dq, s.instance_rot)),
            )
            f = raytrace(s, scene, height=res, width=res, accel="binned")
            return s, f.rgb
        s, stack = jax.lax.scan(body, st, None, length=n)
        return s, jnp.sum(stack[:, 0, ::16].astype(jnp.int32))

    # --- seeded rollouts on the STATIC scene ----------------------------
    def make_rollout(oracle: bool):
        @partial(jax.jit, static_argnames=("n",))
        def rollout(seed0, n):
            def body(seed, _):
                f = raytrace(state0, scene, height=res, width=res,
                             accel="binned", seed_t=seed)
                if oracle:
                    nxt = jnp.minimum(f.depth * 1.001, 1000.0)
                else:
                    nxt = jnp.minimum(f.depth * 0.0 + 1000.0, 1000.0)
                return nxt, jnp.sum(f.rgb[0, :, ::16, ::16].astype(jnp.int32))
            seed, sums = jax.lax.scan(body, seed0, None, length=n)
            return seed, jnp.sum(sums)
        return rollout

    from madrona_renderer_tpu.ops.warmstart import raytrace_warmstart

    @partial(jax.jit, static_argnames=("n",))
    def warmstart_rollout(prev0, n):
        def body(prev, _):
            f = raytrace_warmstart(
                state0, scene, prev_depth=prev,
                height=res, width=res, accel="binned")
            return f.depth, jnp.sum(f.rgb[0, :, ::16, ::16].astype(jnp.int32))
        prev, sums = jax.lax.scan(body, prev0, None, length=n)
        return prev, jnp.sum(sums)

    from madrona_renderer_tpu.ops.warmstart import raytrace_prepass

    @partial(jax.jit, static_argnames=("n",))
    def prepass_rotating_rollout(carry0, n):
        # Cold-start pattern: every frame pays the 1/8-res coarse render
        # + repair merge with NO temporal reuse (rotation defeats XLA
        # loop-hoisting, same dynamics as the anchor).
        def body(s, _):
            half = jnp.float32(0.01)
            dq = jnp.array([jnp.cos(half), 0.0, 0.0, jnp.sin(half)],
                           jnp.float32)
            s = dataclasses.replace(
                s, time=s.time + 0.05,
                instance_rot=quat_normalize(quat_multiply(dq, s.instance_rot)),
            )
            f = raytrace_prepass(
                s, scene, height=res, width=res, accel="binned")
            return s, jnp.sum(f.rgb[0, :, ::16, ::16].astype(jnp.int32))
        s, sums = jax.lax.scan(body, carry0, None, length=n)
        return s, jnp.sum(sums)

    @partial(jax.jit, static_argnames=("n",))
    def warmstart_rotating_rollout(carry0, n):
        # The realistic case: the terrain rotates every step (same
        # dynamics as the anchor), seeds are one frame stale, silhouette
        # pixels go through the repair pass.
        def body(carry, _):
            s, prev = carry
            half = jnp.float32(0.01)
            dq = jnp.array([jnp.cos(half), 0.0, 0.0, jnp.sin(half)],
                           jnp.float32)
            s = dataclasses.replace(
                s, time=s.time + 0.05,
                instance_rot=quat_normalize(quat_multiply(dq, s.instance_rot)),
            )
            f = raytrace_warmstart(
                s, scene, prev_depth=prev,
                height=res, width=res, accel="binned")
            return (s, f.depth), jnp.sum(
                f.rgb[0, :, ::16, ::16].astype(jnp.int32))
        carry, sums = jax.lax.scan(body, carry0, None, length=n)
        return carry, jnp.sum(sums)

    W = args.worlds
    far_seed = jnp.full((W, 1, res, res), 1000.0, jnp.float32)
    rot_carry = (jax.tree.map(jnp.copy, state0), far_seed)
    rollouts = {
        "far-seed baseline": (make_rollout(False), far_seed),
        "ORACLE prev-depth seed": (make_rollout(True), far_seed),
        "WARMSTART 2-pass (production)": (warmstart_rollout, far_seed),
        "WARMSTART rotating (realistic)": (warmstart_rotating_rollout,
                                           rot_carry),
        "PREPASS 1/8 rotating (cold-start)": (
            prepass_rotating_rollout, jax.tree.map(jnp.copy, state0)),
    }

    def time_fn(fn, arg0, n_small, n_big):
        _, ck = fn(arg0, n_small)
        float(np.asarray(ck))
        t0 = time.perf_counter()
        _, ck = fn(arg0, n_small)
        float(np.asarray(ck))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        _, ck = fn(arg0, n_big)
        float(np.asarray(ck))
        tb = time.perf_counter() - t0
        per = (tb - ts) / (n_big - n_small)
        if per <= 0:
            per = tb / n_big
        return W / per, per

    n_small, n_big = args.steps
    log("compiling + warming anchor...")
    st = jax.tree.map(jnp.copy, state0)
    for n in args.steps:
        st, ck = anchor_rollout(st, n)
        float(np.asarray(ck))
    log("compiling + warming seeded rollouts...")
    for name, (fn, arg0) in rollouts.items():
        for n in args.steps:
            _, ck = fn(arg0, n)
            float(np.asarray(ck))

    def anchor_read():
        st2 = jax.tree.map(jnp.copy, state0)
        st2, ck = anchor_rollout(st2, n_small)
        float(np.asarray(ck))
        t0 = time.perf_counter()
        st2, ck = anchor_rollout(st2, n_small)
        float(np.asarray(ck))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        st2, ck = anchor_rollout(st2, n_big)
        float(np.asarray(ck))
        tb = time.perf_counter() - t0
        per = (tb - ts) / (n_big - n_small)
        if per <= 0:
            per = tb / n_big
        return W / per

    if args.wait_healthy > 0:
        t_end = time.time() + args.wait_max_min * 60
        while True:
            fps = anchor_read()
            log(f"health anchor: {fps:,.1f} f/s")
            if fps >= args.wait_healthy:
                log("session HEALTHY")
                break
            if time.time() > t_end:
                log("wait-healthy TIMED OUT — discard per protocol")
                break
            time.sleep(120)
    else:
        log(f"anchor read: {anchor_read():,.1f} f/s")

    # correctness spot check on chip: oracle rollout's final frame must
    # match the unseeded render bitwise (static scene, valid seeds)
    f_ref = raytrace(state0, scene, height=res, width=res, accel="binned")
    seed1 = jnp.minimum(f_ref.depth * 1.001, 1000.0)
    f_seeded = raytrace(state0, scene, height=res, width=res,
                        accel="binned", seed_t=seed1)
    same = bool(np.array_equal(np.asarray(f_ref.rgb), np.asarray(f_seeded.rgb)))
    log(f"on-chip oracle-seed bitwise rgb parity: {same}")

    results = {k: [] for k in rollouts}
    for rnd in range(args.rounds):
        for name, (fn, arg0) in rollouts.items():
            fps, per = time_fn(fn, arg0, n_small, n_big)
            results[name].append(fps)
            log(f"round {rnd} [{name}]: {fps:,.1f} f/s ({per*1e3:.2f} ms)")
    for name, vals in results.items():
        vals = sorted(vals)
        med = vals[len(vals) // 2] if len(vals) % 2 else 0.5 * (
            vals[len(vals) // 2 - 1] + vals[len(vals) // 2])
        log(f"MEDIAN [{name}]: {med:,.1f} f/s over {[f'{v:,.1f}' for v in vals]}")
    log("DONE")


if __name__ == "__main__":
    main()
