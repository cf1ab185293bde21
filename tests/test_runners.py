"""Runner tests: headless CLI contract + dump format."""

import os

import numpy as np
import pytest

from madrona_renderer_tpu.assets.png import read_png
from madrona_renderer_tpu.runners.dump import depth_to_gray_u8, dump_tiled_image, tile_images
from madrona_renderer_tpu.runners.headless import main, parse_headless_args


def test_headless_cli_contract(capsys, tmp_path):
    out = str(tmp_path / "frame")
    main(["headless", "4", "3", "rt", "32", "32", "--dump-last-frame", out])
    captured = capsys.readouterr().out
    # Same printout shape as the reference (src/headless.cpp:76-78).
    assert captured.startswith("FPS ")
    assert "Average total step time:" in captured
    img = read_png(out + ".png")
    # 4 images → 2x2 grid of 32px tiles.
    assert img.shape == (64, 64, 4)


def test_headless_rast_mode(capsys):
    main(["headless", "2", "2", "rast", "16", "16"])
    assert "FPS" in capsys.readouterr().out


def test_headless_ssaa_flag(capsys):
    main(["headless", "2", "2", "rt", "16", "16", "--ssaa", "2"])
    assert "FPS" in capsys.readouterr().out


def test_headless_bad_args():
    with pytest.raises(SystemExit):
        parse_headless_args(["headless", "4", "3", "nope", "32", "32"])
    with pytest.raises(SystemExit):
        parse_headless_args(["headless", "4"])


def test_tile_grid_shape():
    imgs = np.zeros((5, 8, 8, 4), np.uint8)
    grid = tile_images(imgs)
    # ceil(sqrt(5)) = 3 rows, ceil(5/3) = 2 cols (reference src/dump.cpp:73-78).
    assert grid.shape == (24, 16, 4)


def test_depth_normalization_rule():
    d = np.asarray([[0.0, 127.5, 255.0, 99999.0]], np.float32)
    g = depth_to_gray_u8(d)
    assert g[0, 0, 0] == 0
    assert g[0, 1, 0] == 127
    assert g[0, 2, 0] == 255
    assert g[0, 3, 0] == 255  # clamped (min(depth/255, 1))
    assert (g[..., 3] == 255).all()
