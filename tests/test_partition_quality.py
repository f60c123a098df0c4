"""Multilevel k-way partitioner validity + quality (native/mlkway.cpp;
reference role: METIS<3>::partMesh, METIS.hpp:109-160 — k-way edge-cut
minimization with contiguity, min-connectivity, ufactor=30 balance)."""

import numpy as np
import pytest

from dot_tpu import native, partition
from dot_tpu.mesh_gen import bar_mesh


def _dual_adjacency(conn):
    """(elem, elem) pairs sharing a face."""
    faces = {}
    pairs = []
    combos = [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]
    for e, tet in enumerate(conn):
        for c in combos:
            key = tuple(sorted(tet[list(c)]))
            other = faces.pop(key, None)
            if other is None:
                faces[key] = e
            else:
                pairs.append((other, e))
    return pairs


@pytest.fixture(scope="module")
def mesh():
    return bar_mesh(10, 4, 4)


def test_partition_valid_and_balanced(mesh):
    res = native.partition_mesh_dual(mesh.conn, 6)
    assert res is not None, "native partitioner must be available in CI"
    part, cut = res
    assert part.shape == (mesh.n_elem,)
    assert set(np.unique(part)) == set(range(6))
    sizes = np.bincount(part, minlength=6)
    # ufactor=30-style balance plus slack for contiguity repair
    assert sizes.max() <= 1.10 * mesh.n_elem / 6 + 1

    # reported edge cut matches a direct count
    pairs = _dual_adjacency(mesh.conn)
    direct = sum(1 for a, b in pairs if part[a] != part[b])
    assert direct == cut


def test_partition_contiguous(mesh):
    part, _ = native.partition_mesh_dual(mesh.conn, 6)
    pairs = _dual_adjacency(mesh.conn)
    adj = [[] for _ in range(mesh.n_elem)]
    for a, b in pairs:
        adj[a].append(b)
        adj[b].append(a)
    for p in range(6):
        elems = np.where(part == p)[0]
        seen = {elems[0]}
        stack = [elems[0]]
        inpart = set(elems.tolist())
        while stack:
            v = stack.pop()
            for u in adj[v]:
                if u in inpart and u not in seen:
                    seen.add(u)
                    stack.append(u)
        assert len(seen) == len(elems), f"part {p} is disconnected"


def test_partition_beats_or_ties_rcb_interface(mesh):
    """The point of the multilevel partitioner: fewer duplicated interface
    vertices than plain coordinate bisection (H0 quality gate)."""
    part = partition.element_partition(mesh, 6)
    cent = mesh.V_rest[mesh.conn].mean(axis=1)
    rcb = partition.rcb_partition(cent, 6)
    i_sel = partition._interface_count(mesh.conn, part, mesh.n_vert, 6)
    i_rcb = partition._interface_count(mesh.conn, rcb, mesh.n_vert, 6)
    assert i_sel <= i_rcb


def test_partition_deterministic(mesh):
    p1, c1 = native.partition_mesh_dual(mesh.conn, 4)
    p2, c2 = native.partition_mesh_dual(mesh.conn, 4)
    assert c1 == c2 and np.array_equal(p1, p2)
