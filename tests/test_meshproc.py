"""Mesh-processing utilities: sTri2Tet, partition debug outputs, and the
2D primitive generators (reference: main.cpp:748, ADMMDDTimeStepper.cpp:
375-442, Mesh.cpp:110-435)."""

import numpy as np

from dot_tpu import io as meshio
from dot_tpu import mesh_gen as mg


def test_stri2tet_contains_face():
    mesh = mg.bar_mesh(4, 2, 2)
    s2t = meshio.stri2tet(mesh.conn, mesh.SF)
    assert s2t.shape[0] == mesh.SF.shape[0]
    for i, t in enumerate(s2t):
        assert set(mesh.SF[i]).issubset(set(mesh.conn[t]))


def test_partition_debug_outputs(tmp_path):
    mesh = mg.bar_mesh(4, 2, 2)
    part = np.arange(mesh.n_elem) % 3
    meshio.write_partition_debug(str(tmp_path), mesh, part)
    labels = [int(l.split()[1]) for l in open(tmp_path / "label.obj")]
    assert len(labels) == mesh.SF.shape[0]
    assert set(labels).issubset({0, 1, 2})
    wire = open(tmp_path / "wire.poly").read()
    assert wire.startswith("POINTS\n") and wire.rstrip().endswith("END")


def test_2d_generators_valid():
    for fn in (mg.grid_2d, mg.square_2d, mg.rectangle_2d, mg.cylinder_2d):
        V, F, bv = fn(1.0, 200)
        assert V.shape[1] == 3 and np.all(V[:, 2] == 0.0)
        e1 = V[F[:, 1], :2] - V[F[:, 0], :2]
        e2 = V[F[:, 2], :2] - V[F[:, 0], :2]
        areas = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
        assert areas.min() > 0          # CCW, non-degenerate
        assert len(bv[0]) > 1 and len(bv[1]) > 1
        assert not set(bv[0]) & set(bv[1])
        # element count within 2x of the request (reference's Triangle
        # area bound gives the same granularity guarantee)
        assert 0.5 * 200 <= F.shape[0] <= 2 * 200


def test_grid_2d_matches_reference_structure():
    """P_GRID is analytic in the reference (Mesh.cpp:121-158): gridSize =
    int(size/spacing) + 1 with spacing = size/sqrt(elemAmt/2)."""
    V, F, bv = mg.grid_2d(1.0, 200)
    gs = int(1.0 / (1.0 / np.sqrt(100.0))) + 1
    assert V.shape[0] == gs * gs
    assert F.shape[0] == (gs - 1) * (gs - 1) * 2
    # handles are the x = 0 and x = size columns
    assert np.allclose(V[bv[0], 0], 0.0)
    assert np.allclose(V[bv[1], 0], 1.0)


def test_spikes_sharkey_generators():
    """P_SPIKES / P_SHARKEY (Mesh.cpp:289-435): concave polygons meshed
    by the from-scratch quality triangulator — CCW non-degenerate
    triangles, element count near the request, disjoint handle chains."""
    for fn, lo in ((mg.spikes_2d, 0.4), (mg.sharkey_2d, 0.4)):
        V, F, bv = fn(1.0, 600)
        assert V.shape[1] == 3 and np.all(V[:, 2] == 0.0)
        e1 = V[F[:, 1], :2] - V[F[:, 0], :2]
        e2 = V[F[:, 2], :2] - V[F[:, 0], :2]
        areas = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
        assert areas.min() > 0
        assert lo * 600 <= len(F) <= 2.5 * 600
        assert len(bv[0]) > 1 and len(bv[1]) > 1
        assert not set(bv[0]) & set(bv[1])
        # all vertices referenced
        assert len(np.unique(F.ravel())) == len(V)


def test_tet_from_surface_cube():
    """tet_from_surface (MeshProcessing mode-2 case 3 / TetGen role):
    stuffing a closed cube surface yields positively-oriented tets whose
    total volume approaches the enclosed volume from below."""
    src = mg.bar_mesh(6, 6, 6, size=(1.0, 1.0, 1.0))
    m = mg.tet_from_surface(src.V_rest, src.SF, elem_amt=4000)
    assert m.vol.min() > 0
    covered = float(m.vol.sum())   # unit cube: total tet volume
    assert 0.5 <= covered <= 1.0001, covered
    assert 1000 <= m.n_elem <= 12000


def test_mode2_inspect_detects_inversion(tmp_path, capsys):
    # mode 2 case 4 (MeshProcessing.hpp:187-247): inversion check
    from dot_tpu.__main__ import main
    mesh = mg.bar_mesh(4, 2, 2)
    good = tmp_path / "good.msh"
    meshio.save_tet_mesh(str(good), mesh.V_rest, mesh.conn, mesh.SF)
    clip = tmp_path / "clip.obj"
    main(["2", "inspect", str(good), "--status", str(clip)])
    out = capsys.readouterr().out
    assert "no element inversion" in out
    assert clip.exists()
    Vc, Fc = meshio.read_obj(str(clip))
    assert len(Fc) % 4 == 0 and len(Fc) > 0

    conn_bad = mesh.conn.copy()
    conn_bad[0, [0, 1]] = conn_bad[0, [1, 0]]  # invert one tet
    bad = tmp_path / "bad.msh"
    meshio.save_tet_mesh(str(bad), mesh.V_rest, conn_bad, mesh.SF)
    main(["2", "inspect", str(bad)])
    out = capsys.readouterr().out
    assert "element inversion detected" in out and "(tet 0)" in out


def test_mode2_couttest(capsys):
    # mode 2 case 13 (MeshProcessing.hpp:578-598)
    from dot_tpu.__main__ import main
    main(["2", "couttest", "--frames", "50"])
    out = capsys.readouterr().out
    assert "cout:" in out and "disabled:" in out
