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


def test_run_dir_output_contract(tmp_path):
    """A bare simulator run must produce the reference's full per-run
    artifact set (README "Output Files"; main.cpp:318-358): config.txt,
    <n>.obj, status<n>, iterStats.txt, info.txt, log.txt,
    finalResult_mesh.msh, 0.png, finalResult.png, anim.gif."""
    import jax.numpy as jnp
    from dot_tpu import io as meshio
    from dot_tpu.config import Config
    from dot_tpu.mesh_gen import bar_mesh
    from dot_tpu.sim import Simulator

    mesh = bar_mesh(4, 2, 2)
    mpath = str(tmp_path / "bar.msh")
    meshio.save_tet_mesh(mpath, mesh.V_rest, mesh.conn, mesh.SF)
    cfg = Config(energy="FCR", time_stepper="DOT", partition_amt=2,
                 duration=1.0, dt=0.025, rho=1000.0, ym=1e5, pr=0.4,
                 script="stretch", handle_ratio=0.1, shape="input",
                 input_shape_path=mpath)
    out = tmp_path / "run"
    sim = Simulator(cfg, str(out), dtype=jnp.float64, mute=True)
    sim.run(2)
    sim.finalize()

    for name in ("config.txt", "iterStats.txt", "info.txt", "log.txt",
                 "finalResult_mesh.msh", "0.obj", "status0",
                 "0.png", "finalResult.png", "anim.gif"):
        assert (out / name).exists(), name
    assert (out / "0.png").read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"
    assert (out / "anim.gif").read_bytes()[:6] == b"GIF89a"
    im = PIL.open(out / "finalResult.png")
    assert np.asarray(im.convert("RGB")).shape[2] == 3
    # the gif has one frame per saved obj
    im = PIL.open(out / "anim.gif")
    n = 0
    try:
        while True:
            im.seek(n)
            n += 1
    except EOFError:
        pass
    n_objs = len([p for p in out.iterdir()
                  if p.suffix == ".obj" and p.stem.isdigit()])
    assert n == n_objs >= 2
