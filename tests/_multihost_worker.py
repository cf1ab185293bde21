"""Worker process for the real multi-process jax.distributed tests.

Launched by tests/test_multihost.py as N subprocesses sharing a localhost
coordinator. Each process fakes ``ndev`` CPU devices, so the global mesh
is a faithful miniature of a multi-host TPU fleet (worlds-DP over DCN,
SURVEY.md §2.3).

argv: port pid nproc ndev mode
modes:
  even    — 2×4 fleet, even world split, global-mesh computation with
            per-shard verification (the round-2 happy path).
  uneven  — 4×4 fleet, 18 worlds (uneven: [5,5,4,4]), each process
            renders its own slice with the real Pallas path (interpret,
            CPU) and the fleet cross-checks totals with a DCN allgather.
  doomed  — joins a fleet where one worker was killed before initialize:
            initialize(initialization_timeout=...) must RAISE (failure
            detection), not hang; exits 7 on the expected error.
"""

import os
import sys


def main() -> int:
    port = sys.argv[1]
    pid = int(sys.argv[2])
    nproc = int(sys.argv[3])
    ndev = int(sys.argv[4])
    mode = sys.argv[5]

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={ndev}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from madrona_renderer_tpu.parallel import multihost

    if mode == "doomed":
        try:
            multihost.initialize(
                coordinator_address=f"127.0.0.1:{port}",
                num_processes=nproc,
                process_id=pid,
                initialization_timeout=10,
            )
        except Exception as e:  # noqa: BLE001 — asserting the failure path
            print(f"worker {pid} detected missing peer: {type(e).__name__}",
                  flush=True)
            return 7
        print(f"worker {pid} unexpectedly initialized", flush=True)
        return 1

    multihost.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid
    assert len(jax.local_devices()) == ndev
    assert len(jax.devices()) == nproc * ndev

    # Second initialize() must be a no-op, not a crash.
    multihost.initialize()

    mesh = multihost.global_world_mesh()
    assert mesh.devices.shape == (nproc * ndev, 1), mesh.devices.shape

    import numpy as np

    if mode == "even":
        sl = multihost.local_world_slice(16)
        assert sl == slice(8 * pid, 8 * pid + 8), sl

        # A real global computation over the multi-process mesh: each
        # process contributes its world slice, the jitted program runs
        # globally, and each process checks its addressable output shards.
        from jax.sharding import NamedSharding, PartitionSpec as P

        ns = NamedSharding(mesh, P("worlds"))
        local = np.arange(sl.start, sl.stop, dtype=np.float32)
        x = jax.make_array_from_process_local_data(ns, local, (16,))
        y = jax.jit(lambda a: a * 2.0 + 1.0, out_shardings=ns)(x)
        for shard in y.addressable_shards:
            idx = shard.index[0]
            expect = (
                np.arange(idx.start, idx.stop, dtype=np.float32) * 2.0 + 1.0
            )
            np.testing.assert_array_equal(np.asarray(shard.data), expect)
    elif mode == "uneven":
        n_worlds = 18
        sl = multihost.local_world_range(n_worlds)
        counts = [5, 5, 4, 4]
        starts = [0, 5, 10, 14]
        assert sl == slice(starts[pid], starts[pid] + counts[pid]), sl
        with_even = None
        try:
            with_even = multihost.local_world_slice(n_worlds)
        except ValueError:
            pass  # 18 % 4 != 0 — the even helper must refuse, not lie
        assert with_even is None

        # Establish the CPU (gloo) collective context NOW, while the
        # fleet is still in lockstep: the render below compiles for
        # per-process shapes (uneven world counts), and on a loaded
        # machine the compile-time skew can exceed gloo's fixed 30 s
        # context-initialization deadline if the first collective only
        # happens afterwards.
        from jax.experimental import multihost_utils

        warm = multihost_utils.process_allgather(
            np.asarray([pid], np.int32)
        )
        assert sorted(np.asarray(warm).ravel()) == list(range(nproc))

        # Each process renders its own slice with the real render path
        # (worlds-DP: zero cross-host traffic in the step itself).
        from madrona_renderer_tpu.config import (
            ImportedCamera, ImportedInstance,
        )
        from madrona_renderer_tpu.ops.raytrace_pallas import raytrace
        from tests.helpers import build, quad_xz

        from madrona_renderer_tpu.config import WorldInit

        n_local = sl.stop - sl.start
        state, scene = build(
            [quad_xz(half=50.0, y=0.0)],
            [ImportedInstance(position=[0, 10, 0], rotation=[1, 0, 0, 0],
                              scale=[1, 1, 1], object_id=0)],
            [ImportedCamera(position=[0, 0, 0], rotation=[1, 0, 0, 0])],
            worlds=[
                WorldInit(num_instances=1, instance_offset=0,
                          num_cameras=1, camera_offset=0)
            ] * n_local,
        )
        frames = raytrace(state, scene, height=8, width=8, interpret=True)
        assert frames.rgb.shape == (n_local, 1, 8, 8, 4)
        assert (np.asarray(frames.segmask) >= 0).any()

        # DCN cross-check: the fleet's world counts must tile [0, 18).
        all_counts = multihost_utils.process_allgather(
            np.asarray([sl.start, sl.stop], np.int32)
        )
        assert all_counts.shape == (nproc, 2)
        flat = sorted(map(tuple, np.asarray(all_counts)))
        assert flat[0][0] == 0 and flat[-1][1] == n_worlds
        for (a, b), (c, d) in zip(flat, flat[1:]):
            assert b == c, f"world ranges not contiguous: {flat}"
    else:
        raise SystemExit(f"unknown mode {mode}")

    print(f"worker {pid} OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
