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
Free-fly (reference fly camera, ``src/viewer.cpp:189-195``): f detaches
the selected view into a fly camera — w/a/s/d move, r/c up/down, arrows
(or mouse drag in the webviewer) look, +/- speed, f returns to the agent
view (original pose restored).
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

    def __init__(self, manager: Manager, sim_tick_rate_hz: float = 10.0,
                 fly_speed: float = 2.0):
        self.mgr = manager
        self.world = 0
        self.view = 0
        self.paused = False
        self.show_depth = False
        self.tick_interval = 1.0 / max(sim_tick_rate_hz, 1e-3)
        # Free-fly camera (reference viz::Viewer's cameraMoveSpeed /
        # cameraPosition/cameraRotation fly camera, src/viewer.cpp:189-195):
        # detaches the selected view from its agent pose and flies it via
        # the live camera tensors (the in-place mutation contract).
        self.fly = False
        self.fly_speed = float(fly_speed)
        self._fly_pos = np.zeros(3, np.float32)
        self._fly_yaw = 0.0
        self._fly_pitch = 0.0
        self._saved_pose: Optional[tuple[np.ndarray, np.ndarray]] = None

    # -- free-fly camera ------------------------------------------------ #

    def _flat_cam_index(self) -> Optional[int]:
        """Index of (world, view) in the flat exported camera tensors."""
        m = self.mgr
        idx = np.where((m._cam_w == self.world) & (m._cam_slot == self.view))[0]
        return int(idx[0]) if len(idx) else None

    def enter_fly(self) -> None:
        i = self._flat_cam_index()
        if i is None:
            return  # the selected view has no camera entity
        pos = self.mgr.camera_position_tensor().numpy()
        rot = self.mgr.camera_rotation_tensor().numpy()
        self._saved_pose = (pos[i].copy(), rot[i].copy())
        self._fly_pos = pos[i].astype(np.float32).copy()
        # derive yaw/pitch from the camera's forward (+Y in camera frame)
        w, x, y, z = (float(v) for v in rot[i])
        fwd = np.array([
            2 * (x * y - w * z),
            1 - 2 * (x * x + z * z),
            2 * (y * z + w * x),
        ])
        self._fly_pitch = float(np.arcsin(np.clip(fwd[2], -1, 1)))
        self._fly_yaw = float(np.arctan2(-fwd[0], fwd[1]))
        self.fly = True
        self._apply_fly_pose()

    def exit_fly(self) -> None:
        if self._saved_pose is not None:
            i = self._flat_cam_index()
            if i is not None:
                self.mgr.camera_position_tensor().numpy()[i] = self._saved_pose[0]
                self.mgr.camera_rotation_tensor().numpy()[i] = self._saved_pose[1]
            self._saved_pose = None
        self.fly = False
        if self.paused:
            # While paused, tick() no longer re-renders once fly is off;
            # without this the last fly-camera frame would stay on screen
            # after the agent pose was restored.
            self.mgr.refresh_frames()

    def _fly_quat(self) -> np.ndarray:
        sx, cx = np.sin(self._fly_pitch * 0.5), np.cos(self._fly_pitch * 0.5)
        sz, cz = np.sin(self._fly_yaw * 0.5), np.cos(self._fly_yaw * 0.5)
        # qz(yaw) * qx(pitch) — matches ops.quat.euler_to_quat
        return np.array([cx * cz, sx * cz, sx * sz, cx * sz], np.float32)

    def _apply_fly_pose(self) -> None:
        i = self._flat_cam_index()
        if i is None:
            return
        self.mgr.camera_position_tensor().numpy()[i] = self._fly_pos
        self.mgr.camera_rotation_tensor().numpy()[i] = self._fly_quat()

    def _fly_move(self, axis: str, sign: float) -> None:
        cy, sy = np.cos(self._fly_yaw), np.sin(self._fly_yaw)
        cp, sp = np.cos(self._fly_pitch), np.sin(self._fly_pitch)
        fwd = np.array([-sy * cp, cy * cp, sp], np.float32)
        right = np.array([cy, sy, 0.0], np.float32)
        up = np.array([0.0, 0.0, 1.0], np.float32)
        d = {"fwd": fwd, "right": right, "up": up}[axis]
        self._fly_pos = self._fly_pos + sign * self.fly_speed * d
        self._apply_fly_pose()

    def look(self, dyaw: float, dpitch: float) -> None:
        """Rotate the fly camera (radians); no-op outside fly mode."""
        if not self.fly:
            return
        self._fly_yaw += dyaw
        self._fly_pitch = float(np.clip(self._fly_pitch + dpitch,
                                        -1.55, 1.55))
        self._apply_fly_pose()

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
        if key == "f":
            self.exit_fly() if self.fly else self.enter_fly()
            return True
        if key.startswith("look:"):
            try:
                _, dx, dy = key.split(":")
                self.look(float(dx), float(dy))
            except ValueError:
                pass
            return True
        if self.fly:
            # fly-mode bindings: wasd move, r/c up/down, arrows look
            moves = {"w": ("fwd", 1), "s": ("fwd", -1),
                     "a": ("right", -1), "d": ("right", 1),
                     "r": ("up", 1), "c": ("up", -1)}
            if key in moves:
                self._fly_move(*moves[key])
            elif key == "right":
                self.look(-0.1, 0.0)
            elif key == "left":
                self.look(0.1, 0.0)
            elif key == "up":
                self.look(0.0, 0.1)
            elif key == "down":
                self.look(0.0, -0.1)
            elif key in ("+", "="):
                self.fly_speed *= 1.5
            elif key == "-":
                self.fly_speed /= 1.5
            elif key == " ":
                self.paused = not self.paused
            return True
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
        elif self.fly:
            # Paused + flying: the camera must still respond — re-render
            # without advancing the kept simulation state.
            self.mgr.refresh_frames()

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
            "[BATCH_WIDTH] [BATCH_HEIGHT] [--ssaa N]",
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
    ssaa = 1
    i = 7
    while i < len(argv):
        if argv[i] == "--ssaa" and i + 1 < len(argv):
            ssaa = int(argv[i + 1])
            i += 2
        else:
            usage()
    return num_worlds, mode, int(argv[5]), int(argv[6]), ssaa


def main(argv=None) -> None:
    from ..utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    argv = argv if argv is not None else sys.argv
    num_worlds, mode, bw, bh, ssaa = parse_viewer_args(argv)
    mgr = Manager(demo_config(num_worlds, mode, bw, bh, dynamic=True,
                              ssaa=ssaa))
    Viewer(mgr).loop()


if __name__ == "__main__":
    main()
