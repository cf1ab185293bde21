"""Worker process for the real 2-process jax.distributed test.

Launched by tests/test_multihost.py as two subprocesses sharing a
localhost coordinator. Each process fakes 4 CPU devices, so the global
mesh has 8 devices across 2 processes — a faithful miniature of a
multi-host TPU fleet (worlds-DP over DCN, SURVEY.md §2.3).
"""

import os
import sys


def main() -> int:
    port = sys.argv[1]
    pid = int(sys.argv[2])

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from madrona_renderer_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 8

    # Second initialize() must be a no-op, not a crash.
    multihost.initialize()

    mesh = multihost.global_world_mesh()
    assert mesh.devices.shape == (8, 1), mesh.devices.shape

    sl = multihost.local_world_slice(16)
    assert sl == slice(8 * pid, 8 * pid + 8), sl

    # A real global computation over the multi-process mesh: each process
    # contributes its world slice, the jitted program runs globally, and
    # each process checks its addressable output shards.
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    ns = NamedSharding(mesh, P("worlds"))
    local = np.arange(sl.start, sl.stop, dtype=np.float32)
    x = jax.make_array_from_process_local_data(ns, local, (16,))
    y = jax.jit(lambda a: a * 2.0 + 1.0, out_shardings=ns)(x)
    for shard in y.addressable_shards:
        idx = shard.index[0]
        expect = np.arange(idx.start, idx.stop, dtype=np.float32) * 2.0 + 1.0
        np.testing.assert_array_equal(np.asarray(shard.data), expect)

    print(f"worker {pid} OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
