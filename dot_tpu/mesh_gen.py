"""Procedural tet meshes (tests, benchmarks, and the multi-chip dry run).

The reference generates 2D primitives with Triangle and tetrahedralizes
surfaces with TetGen (MeshProcessing.hpp:106-186); neither is available
here, so we provide a structured bar: an (nx, ny, nz) grid of cubes, each
split into 6 Kuhn tetrahedra, orientation-fixed to positive volume.
"""

from __future__ import annotations

import itertools
import numpy as np

from .mesh import Mesh


def bar_mesh(nx=8, ny=2, nz=2, size=(1.0, 0.25, 0.25), ym=1.0e5, pr=0.4,
             rho=1000.0):
    """Structured bar of nx*ny*nz cubes -> 6 tets each."""
    xs = np.linspace(0, size[0], nx + 1)
    ys = np.linspace(0, size[1], ny + 1)
    zs = np.linspace(0, size[2], nz + 1)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    V = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)

    def vid(i, j, k):
        return (i * (ny + 1) + j) * (nz + 1) + k

    tets = []
    corners = {}
    for (di, dj, dk) in itertools.product((0, 1), repeat=3):
        corners[(di, dj, dk)] = (di, dj, dk)
    perms = list(itertools.permutations(range(3)))
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                base = np.array([i, j, k])
                for perm in perms:
                    path = [np.array([0, 0, 0])]
                    cur = np.array([0, 0, 0])
                    for ax in perm:
                        cur = cur.copy()
                        cur[ax] = 1
                        path.append(cur)
                    ids = [vid(*(base + p)) for p in path]
                    tets.append(ids)
    TT = np.asarray(tets, dtype=np.int64)

    # orientation fix: positive signed volume
    p = V[TT]
    X = np.stack([p[:, 1] - p[:, 0], p[:, 2] - p[:, 0], p[:, 3] - p[:, 0]],
                 axis=-1)
    neg = np.linalg.det(X) < 0
    TT[neg, 2], TT[neg, 3] = TT[neg, 3].copy(), TT[neg, 2].copy()

    return Mesh(V, TT, ym=ym, pr=pr, rho=rho)


# ---------------------------------------------------------------------------
# 2D primitive generators (reference: Mesh.cpp:110-435, DIM == 2 builds).
# P_GRID is reproduced exactly (it is analytic in the reference too); the
# Triangle-meshed primitives (square/rectangle/cylinder) are generated as
# structured triangulations of the same domains with the same target
# element count and the same border-vertex semantics (left/right handle
# columns) — Triangle itself is an external tool (like TetGen) and is not
# vendored here. Spikes/Sharkey require Triangle's PSLG input and are not
# provided. Returns (V_rest (n, 3; z = 0), F (m, 3) CCW, border_verts
# [left list, right list]).
# ---------------------------------------------------------------------------
def _grid_tris(rows, cols):
    """Two CCW triangles per cell over a (rows x cols) vertex lattice,
    reference diagonal convention (Mesh.cpp:146-156)."""
    tris = []
    for r in range(rows - 1):
        for c in range(cols - 1):
            v = r * cols + c
            tris.append([v, v + cols + 1, v + cols])
            tris.append([v, v + 1, v + cols + 1])
    return np.asarray(tris, np.int64)


def grid_2d(size=1.0, elem_amt=200):
    """P_GRID (Mesh.cpp:121-158): square lattice, spacing derived from the
    target element count; border columns are the two handles."""
    spacing = size / np.sqrt(elem_amt / 2.0)
    gs = int(size / spacing) + 1
    xs = np.linspace(0.0, size, gs)
    # row-major (rowI * gs + colI), x = spacing * col, y = spacing * row
    V = np.stack([np.tile(xs, gs), np.repeat(xs, gs),
                  np.zeros(gs * gs)], axis=-1)
    F = _grid_tris(gs, gs)
    left = list(range(0, gs * gs, gs))
    right = list(range(gs - 1, gs * gs, gs))
    return V, F, [left, right]


def square_2d(size=1.0, elem_amt=200):
    """P_SQUARE domain (same square; reference meshes it with Triangle,
    Mesh.cpp:160-233) — structured triangulation substitution."""
    return grid_2d(size, elem_amt)


def rectangle_2d(size=1.0, elem_amt=200):
    """P_RECTANGLE (Mesh.cpp:235-290): width size/2, height size."""
    spacing = size / np.sqrt(float(elem_amt))
    rows = int(size / spacing) + 1
    cols = max(rows // 2, 2)
    xs = np.linspace(0.0, size / 2.0, cols)
    ys = np.linspace(0.0, size, rows)
    V = np.stack([np.tile(xs, rows), np.repeat(ys, cols),
                  np.zeros(rows * cols)], axis=-1)
    F = _grid_tris(rows, cols)
    left = list(range(0, rows * cols, cols))
    right = list(range(cols - 1, rows * cols, cols))
    return V, F, [left, right]


def cylinder_2d(size=1.0, elem_amt=200):
    """P_CYLINDER (Mesh.cpp:341-417): annulus (outer radius size, inner
    size/2) as a structured ring mesh; handles = inner/outer rims."""
    r_in, r_out = 0.5 * size, size
    area = np.pi * (r_out ** 2 - r_in ** 2)
    spacing = np.sqrt(area / elem_amt * 2.0)
    n_r = max(int((r_out - r_in) / spacing) + 1, 2)
    n_t = max(int(2.0 * np.pi * r_out / spacing), 8)
    rs = np.linspace(r_in, r_out, n_r)
    ts = np.arange(n_t) * (2.0 * np.pi / n_t)
    R, T = np.meshgrid(rs, ts, indexing="ij")
    V = np.stack([(R * np.cos(T)).reshape(-1), (R * np.sin(T)).reshape(-1),
                  np.zeros(n_r * n_t)], axis=-1)
    tris = []
    for i in range(n_r - 1):
        for j in range(n_t):
            j1 = (j + 1) % n_t
            a, b = i * n_t + j, i * n_t + j1
            c, d = (i + 1) * n_t + j, (i + 1) * n_t + j1
            tris.append([a, c, d])
            tris.append([a, d, b])
    F = np.asarray(tris, np.int64)
    inner = list(range(n_t))
    outer = list(range((n_r - 1) * n_t, n_r * n_t))
    return V, F, [inner, outer]
