"""Headless renderer + PNG/GIF writer (reference role: viewer capture,
main.cpp:955-978, and the vendored GIF encoder src/Utils/GIF.hpp)."""

import numpy as np
import pytest

from dot_tpu import render

PIL = pytest.importorskip("PIL.Image")


def _tet_surface():
    V = np.asarray([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
    F = np.asarray([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]])
    return V, F


def test_png_and_gif_roundtrip(tmp_path):
    V, F = _tet_surface()
    frames = [(V + [0.05 * k, 0, 0], F) for k in range(3)]
    imgs, pal = render.render_frames(frames, width=64, height=64)
    assert imgs[0].shape == (64, 64)
    assert (imgs[0] > 0).sum() > 100  # something was rasterized

    png = tmp_path / "f.png"
    render.write_png(str(png), imgs[0], pal)
    im = PIL.open(png)
    a = np.asarray(im.convert("RGB"))
    assert a.shape == (64, 64, 3)
    assert int((a < 250).any(axis=-1).sum()) == int((imgs[0] > 0).sum())

    gif = tmp_path / "a.gif"
    render.write_gif(str(gif), imgs, pal, fps=10)
    im = PIL.open(gif)
    n = 0
    try:
        while True:
            im.seek(n)
            n += 1
    except EOFError:
        pass
    assert n == 3
    im.seek(0)
    a0 = np.asarray(im.convert("RGB"))
    # LZW+palette roundtrip must be exact (no quantization loss)
    exp = pal[imgs[0]]
    np.testing.assert_array_equal(a0, exp)
