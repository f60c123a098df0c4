"""Config grammar round-trip, mesh I/O round-trip, and status resume."""

import os

import pytest

import numpy as np
import jax.numpy as jnp

from dot_tpu.config import Config
from dot_tpu import io as meshio
from dot_tpu import partition, scripts
from dot_tpu.mesh import Mesh
from dot_tpu.mesh_gen import bar_mesh
from dot_tpu.steppers import System, DOTStepper


def test_config_parse_reference_script(tmp_path):
    src = tmp_path / "scene.txt"
    src.write_text("""energy FCR
timeStepper DOT 6
inexactSolve 0
warmStart 2
resolution 1000
size 1
time 5 0.025
density 1000
stiffness 100000 0.4
script twist
shape input input/tetMeshes/bar17K.msh
view orthographic
zoom 1
tol 2
1e-4
1e-5
""")
    cfg = Config.load(str(src))
    assert cfg.energy == "FCR"
    assert cfg.time_stepper == "DOT" and cfg.partition_amt == 6
    assert cfg.duration == 5 and cfg.dt == 0.025
    assert cfg.ym == 100000 and cfg.pr == 0.4
    assert cfg.script == "twist"
    assert cfg.input_shape_path == "input/tetMeshes/bar17K.msh"
    assert cfg.orthographic and cfg.zoom == 1
    assert cfg.tol == [1e-4, 1e-5]  # values read from following lines

    # round-trip
    dst = tmp_path / "roundtrip.txt"
    cfg.save(str(dst))
    cfg2 = Config.load(str(dst))
    assert cfg2 == cfg


def test_blocksize_mode(tmp_path):
    src = tmp_path / "scene.txt"
    src.write_text("timeStepper DOT -1 1024\n")
    cfg = Config.load(str(src))
    assert cfg.partition_amt == -1 and cfg.block_size == 1024
    assert partition.partition_amt_from_config(cfg, 17315) == 17315 // 1024 + 1


def test_msh_roundtrip(tmp_path):
    mesh = bar_mesh(3, 2, 2)
    path = str(tmp_path / "bar.msh")
    meshio.save_tet_mesh(path, mesh.V_rest, mesh.conn, mesh.SF)
    V, TT, SF = meshio.read_tet_mesh(path)
    np.testing.assert_allclose(V, mesh.V_rest, rtol=1e-6)
    np.testing.assert_array_equal(TT, mesh.conn)
    np.testing.assert_array_equal(np.sort(SF, axis=1),
                                  np.sort(mesh.SF, axis=1))


@pytest.mark.parametrize("stepper,n_parts",
                         [("DOT", 2), ("LBFGS", 0), ("ADMM", 0),
                          ("ADMMDD", 2)])
def test_status_resume_matches_continuous(tmp_path, stepper, n_parts):
    """Run 4 frames; separately run 2, checkpoint, resume 2 — same state,
    for every stepper family with a distinct State type
    (reference: saveStatus/restart, Optimizer.cpp:1095-1162, 126-177)."""
    from dot_tpu.sim import Simulator

    mesh = bar_mesh(6, 2, 2)
    path = str(tmp_path / "bar.msh")
    meshio.save_tet_mesh(path, mesh.V_rest, mesh.conn, mesh.SF)

    def make_cfg(**kw):
        c = Config(energy="FCR", time_stepper=stepper, partition_amt=n_parts,
                   duration=1.0, dt=0.025, rho=1000.0, ym=1e5, pr=0.4,
                   script="stretch", handle_ratio=0.1, shape="input",
                   input_shape_path=path)
        for k, v in kw.items():
            setattr(c, k, v)
        return c

    simA = Simulator(make_cfg(), str(tmp_path / "A"), dtype=jnp.float64,
                     mute=True, render=False)
    simA.run(4)
    simA.finalize()

    simB = Simulator(make_cfg(), str(tmp_path / "B"), dtype=jnp.float64,
                     mute=True, render=False)
    simB.run(2)
    simB.save_status()
    simB.finalize()

    simC = Simulator(make_cfg(restart=True,
                              status_path=str(tmp_path / "B" / "status2")),
                     str(tmp_path / "C"), dtype=jnp.float64, mute=True,
                     render=False)
    assert simC.frame == 2
    simC.run(2)
    simC.finalize()

    xa = np.asarray(simA.state.x)
    xc = np.asarray(simC.state.x)
    # text checkpoint costs ~1e-6 relative
    np.testing.assert_allclose(xc, xa, atol=5e-5)
