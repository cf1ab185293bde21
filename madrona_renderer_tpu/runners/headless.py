"""Headless benchmark runner.

CLI-compatible with the reference's ``renderer_headless``
(``src/args.cpp:52-98``):

    python -m madrona_renderer_tpu.runners.headless \
        NUM_WORLDS NUM_STEPS rt|rast BATCH_WIDTH BATCH_HEIGHT \
        [--dump-last-frame file_name_without_extension]

and prints the same two lines (``src/headless.cpp:72-78``):

    FPS <steps*worlds/elapsed>
    Average total step time: <ms> ms

Divergence (fix, not drift): the reference headless binary never fills its
scene config and null-derefs (``src/headless.cpp:48-55``); ours renders the
built-in demo scene. Timing excludes init/compile (matching the reference,
which starts its clock after the Manager ctor) and synchronizes the device
before stopping the clock.
"""

from __future__ import annotations

import sys
import time

import jax

from ..config import RenderMode
from ..manager import Manager
from .dump import dump_tiled_image
from .scenes import demo_config


def parse_headless_args(argv):
    def usage():
        print(
            f"{argv[0]} [NUM_WORLDS] [NUM_STEPS] [rt|rast] [BATCH_WIDTH] "
            "[BATCH_HEIGHT] [--dump-last-frame file_name_without_extension] "
            "[--trace logdir] [--ssaa N]",
            file=sys.stderr,
        )
        raise SystemExit(1)

    if len(argv) < 6:
        usage()
    num_worlds = int(argv[1])
    num_steps = int(argv[2])
    if argv[3] == "rt":
        mode = RenderMode.Raytracer
    elif argv[3] == "rast":
        mode = RenderMode.Rasterizer
    else:
        usage()
    width = int(argv[4])
    height = int(argv[5])
    dump = None
    trace_dir = None
    ssaa = 1
    i = 6
    while i < len(argv):
        if argv[i] == "--dump-last-frame" and i + 1 < len(argv):
            dump = argv[i + 1]
            i += 2
        elif argv[i] == "--trace" and i + 1 < len(argv):
            trace_dir = argv[i + 1]
            i += 2
        elif argv[i] == "--ssaa" and i + 1 < len(argv):
            ssaa = int(argv[i + 1])
            i += 2
        else:
            usage()
    return num_worlds, num_steps, mode, width, height, dump, trace_dir, ssaa


def main(argv=None) -> None:
    from ..utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    argv = argv if argv is not None else sys.argv
    (num_worlds, num_steps, mode, width, height, dump, trace_dir,
     ssaa) = parse_headless_args(argv)

    mgr = Manager(demo_config(num_worlds, mode, width, height, ssaa=ssaa))

    from ..utils.profiling import trace

    start = time.perf_counter()
    with trace(trace_dir):
        for _ in range(num_steps):
            mgr.step()
        # One device sync so the clock covers real work, not dispatch.
        jax.block_until_ready(mgr.rgb_tensor().to_jax())
    elapsed = time.perf_counter() - start

    if dump:
        dump_tiled_image(dump, mgr.rgb_tensor().numpy())

    fps = num_steps * num_worlds / elapsed
    print(f"FPS {fps:f}")
    print(f"Average total step time: {1000.0 * elapsed / num_steps:f} ms")


if __name__ == "__main__":
    main()
