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
