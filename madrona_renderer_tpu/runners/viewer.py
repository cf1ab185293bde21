"""Interactive viewer: inspect any world/view live while stepping.

Functional parity with the reference's ``renderer_viewer`` (GLFW/ImGui
``viz::Viewer`` loop — reference ``src/viewer.cpp:189-286``; argv contract
``src/args.cpp:9-50``): pick the current world and view, watch frames update
as the sim steps, pause/resume. Vulkan windowing is out of TPU scope
(SURVEY.md §2.2 viewer row); the equivalent here is a matplotlib window
reading the returned arrays — "inspect any world/view live", not a port.

CLI (reference-compatible argv):

    python -m madrona_renderer_tpu.runners.viewer \
        NUM_WORLDS rt|rast WINDOW_W WINDOW_H BATCH_W BATCH_H

Keys: ←/→ world, ↑/↓ view, space pause, d toggle depth, q quit.
"""

from __future__ import annotations

import sys
from typing import Optional

import numpy as np

from ..config import RenderMode
from ..manager import Manager
from .dump import depth_to_gray_u8
from .scenes import demo_config


class Viewer:
    """Drives a Manager and displays one (world, view) at a time."""

    def __init__(self, manager: Manager, sim_tick_rate_hz: float = 10.0):
        self.mgr = manager
        self.world = 0
        self.view = 0
        self.paused = False
        self.show_depth = False
        self.tick_interval = 1.0 / max(sim_tick_rate_hz, 1e-3)

    def current_image(self) -> np.ndarray:
        frames = self.mgr.frames
        if self.show_depth:
            depth = np.asarray(frames.depth[self.world, self.view])
            return depth_to_gray_u8(depth)
        return np.asarray(frames.rgb[self.world, self.view])

    def handle_key(self, key: str) -> bool:
        """Returns False when the viewer should close."""
        if key in ("q", "escape"):
            return False
        num_worlds = self.mgr.cfg.num_worlds
        max_views = self.mgr.state.max_cameras
        if key == "right":
            self.world = (self.world + 1) % num_worlds
        elif key == "left":
            self.world = (self.world - 1) % num_worlds
        elif key == "up":
            self.view = (self.view + 1) % max_views
        elif key == "down":
            self.view = (self.view - 1) % max_views
        elif key == " ":
            self.paused = not self.paused
        elif key == "d":
            self.show_depth = not self.show_depth
        return True

    def tick(self) -> None:
        if not self.paused:
            self.mgr.step()

    def loop(self, max_frames: Optional[int] = None) -> None:
        """Interactive matplotlib loop (blocking)."""
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 6))
        fig.canvas.manager.set_window_title("madrona_renderer_tpu viewer")
        im = ax.imshow(self.current_image())
        ax.axis("off")
        running = {"ok": True}

        def on_key(event):
            if not self.handle_key(event.key or ""):
                running["ok"] = False

        fig.canvas.mpl_connect("key_press_event", on_key)
        plt.ion()
        plt.show()
        frame = 0
        while running["ok"] and plt.fignum_exists(fig.number):
            self.tick()
            im.set_data(self.current_image())
            ax.set_title(
                f"world {self.world} view {self.view}"
                f"{' [depth]' if self.show_depth else ''}"
                f"{' [paused]' if self.paused else ''}"
            )
            plt.pause(self.tick_interval)
            frame += 1
            if max_frames is not None and frame >= max_frames:
                break


def parse_viewer_args(argv):
    def usage():
        print(
            f"{argv[0]} [NUM_WORLDS] [rt|rast] [WINDOW_WIDTH] [WINDOW_HEIGHT] "
            "[BATCH_WIDTH] [BATCH_HEIGHT]",
            file=sys.stderr,
        )
        raise SystemExit(1)

    if len(argv) < 7:
        usage()
    num_worlds = int(argv[1])
    if argv[2] == "rt":
        mode = RenderMode.Raytracer
    elif argv[2] == "rast":
        mode = RenderMode.Rasterizer
    else:
        usage()
    return num_worlds, mode, int(argv[5]), int(argv[6])


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv
    num_worlds, mode, bw, bh = parse_viewer_args(argv)
    mgr = Manager(demo_config(num_worlds, mode, bw, bh, dynamic=True))
    Viewer(mgr).loop()


if __name__ == "__main__":
    main()
