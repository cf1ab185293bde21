"""The shipped examples must stay runnable (the reference's only test is
its example — scripts/test.py — so ours are load-bearing API surface)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, *args], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=600,
    )


def test_smoke_example():
    r = _run(["examples/smoke.py", "--no-display", "--steps", "2"])
    assert r.returncode == 0, r.stderr[-2000:]


def test_terrain_demo_example(tmp_path):
    out = str(tmp_path / "terrain")
    r = _run([
        "examples/terrain_demo.py", "--worlds", "2", "--grid", "24",
        "--res", "64", "--steps", "2", "--out", out,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out + ".png")
    assert "triangles/world" in r.stdout
