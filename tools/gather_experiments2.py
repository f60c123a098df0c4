#!/usr/bin/env python
"""Round 2 of formulation experiments: layout-conversion costs, segsum
alternatives, and assembly/factorization decomposition at bar17K DOT6
shapes."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

R = 30
EPS = jnp.float32(1e-20)


def timed(name, fn, *args):
    f = jax.jit(fn)
    o = f(*args)
    jax.block_until_ready(o)
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    t0 = time.perf_counter()
    o = f(*args)
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / R
    print(f"{name:46s} {dt*1e3:9.3f} ms/rep", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    nV, nE = 17315, 87552
    conn = rng.integers(0, nV, (nE, 4)).astype(np.int32)
    flat = conn.ravel()
    perm = np.argsort(flat, kind="stable").astype(np.int32)
    segids = flat[perm].astype(np.int32)
    perm_j = jnp.asarray(perm)
    segids_j = jnp.asarray(segids)
    conn_j = jnp.asarray(conn)
    conn_cols = tuple(jnp.asarray(conn[:, c].copy()) for c in range(4))

    counts = np.bincount(flat, minlength=nV)
    maxdeg = int(counts.max())
    pad_idx = np.full((nV, maxdeg), nE * 4, np.int64)
    posn = np.zeros(nV, np.int64)
    for k, v in enumerate(flat):
        pad_idx[v, posn[v]] = perm[0] * 0 + k  # row-major (e*4+c) flat index
        posn[v] += 1
    pad_idx_j = jnp.asarray(pad_idx.astype(np.int32))
    # segment boundaries for cumsum trick (row-major flat order, sorted)
    starts = np.zeros(nV + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    starts_j = jnp.asarray(starts[:-1].astype(np.int32))
    ends_j = jnp.asarray((starts[1:] - 1).astype(np.int32))

    x = jnp.asarray(rng.standard_normal((nV, 3)), jnp.float32)
    ge_soa = [[jnp.asarray(rng.standard_normal(nE), jnp.float32)
               for _ in range(3)] for _ in range(4)]
    ge3d = jnp.asarray(rng.standard_normal((nE * 4, 3)), jnp.float32)

    print("--- layout conversions ---")

    def build_rows(g00):
        def body(i, c):
            rows = jnp.concatenate([
                jnp.stack([ge_soa[cc][0] * c, ge_soa[cc][1], ge_soa[cc][2]],
                          axis=-1) for cc in range(4)], axis=0)
            return 1.0 + EPS * jnp.sum(rows)
        return jax.lax.fori_loop(0, R, body, jnp.float32(1))

    timed("12 SoA -> (4nE,3) rows (stack+concat)", build_rows, ge_soa[0][0])

    def build_rows_interleave(g00):
        def body(i, c):
            # row-major (e*4+c) order: stack corners on a new axis 1
            rows = jnp.stack([
                jnp.stack([ge_soa[cc][0] * c, ge_soa[cc][1], ge_soa[cc][2]],
                          axis=-1) for cc in range(4)],
                axis=1).reshape(nE * 4, 3)
            return 1.0 + EPS * jnp.sum(rows)
        return jax.lax.fori_loop(0, R, body, jnp.float32(1))

    timed("12 SoA -> (e*4+c)-major rows", build_rows_interleave,
          ge_soa[0][0])

    def unpack_rows(x):
        def body(i, c):
            rows = [x[conn_cols[cc]] * c for cc in range(4)]   # 4x (nE,3)
            soa = [rows[cc][:, d] for cc in range(4) for d in range(3)]
            return 1.0 + EPS * sum(jnp.sum(s) for s in soa)
        return jax.lax.fori_loop(0, R, body, jnp.float32(1))

    timed("4 row-gathers + unpack to 12 SoA", unpack_rows, x)

    print("--- scatter alternatives (3 dims at once) ---")

    def s_padded3(ge3d):
        def body(i, c):
            vals = jnp.concatenate([ge3d * c,
                                    jnp.zeros((1, 3), jnp.float32)])
            o = jnp.sum(vals[pad_idx_j], axis=1)
            return 1.0 + EPS * jnp.sum(o)
        return jax.lax.fori_loop(0, R, body, jnp.float32(1))

    timed("padded row gather + rowsum (baseline)", s_padded3, ge3d)

    def s_cumsum(ge3d):
        def body(i, c):
            vals = (ge3d * c)[perm_j]
            cs = jnp.cumsum(vals, axis=0)
            z = jnp.zeros((1, 3), jnp.float32)
            cs = jnp.concatenate([z, cs], axis=0)
            o = cs[ends_j + 1] - cs[starts_j]
            return 1.0 + EPS * jnp.sum(o)
        return jax.lax.fori_loop(0, R, body, jnp.float32(1))

    timed("perm gather + cumsum-diff segsum", s_cumsum, ge3d)

    def s_rowscatter(ge3d):
        def body(i, c):
            o = jnp.zeros((nV, 3), jnp.float32).at[jnp.asarray(flat)].add(
                ge3d * c)
            return 1.0 + EPS * jnp.sum(o)
        return jax.lax.fori_loop(0, R, body, jnp.float32(1))

    timed("unsorted row .at[].add (nE*4,3)", s_rowscatter, ge3d)

    def s_sorted_rowscatter(ge3d):
        def body(i, c):
            vals = (ge3d * c)[perm_j]
            o = jnp.zeros((nV, 3), jnp.float32).at[segids_j].add(
                vals, indices_are_sorted=True)
            return 1.0 + EPS * jnp.sum(o)
        return jax.lax.fori_loop(0, R, body, jnp.float32(1))

    timed("sorted row .at[].add (nE*4,3)", s_sorted_rowscatter, ge3d)

    print("--- assembly decomposition (bar17K DOT6 plan shapes) ---")
    nUB9 = 2276721          # scalar dests
    nUB = nUB9 // 9         # unique blocks
    nAsm = 1479329          # gathered tuples
    elem_h = jnp.asarray(rng.standard_normal((144, nE)), jnp.float32)
    asm_src = jnp.asarray(rng.integers(0, nE * 16, nAsm).astype(np.int32))
    stage1 = jnp.asarray(np.sort(rng.integers(0, nUB, nAsm)).astype(np.int32))
    P, bs, nb = 6, 1536, 7
    diag_sz = P * nb * bs * bs
    total = diag_sz + P * (nb - 1) * bs * bs
    band_dest = jnp.asarray(
        rng.choice(total, nUB9, replace=False).astype(np.int32))

    def a_transpose(elem_h):
        def body(i, c):
            rows = (elem_h * c).T.reshape(-1, 9)
            return 1.0 + EPS * jnp.sum(rows[0])
        return jax.lax.fori_loop(0, R, body, jnp.float32(1))

    timed("elem_h.T reshape (50MB relayout)", a_transpose, elem_h)

    def a_gather(elem_h):
        rowsrc = elem_h.T.reshape(-1, 9)

        def body(i, c):
            rows = (rowsrc * c)[asm_src]
            return 1.0 + EPS * jnp.sum(rows[0])
        return jax.lax.fori_loop(0, R, body, jnp.float32(1))

    timed("asm gather 1.48M rows of 9", a_gather, elem_h)

    def a_segsum(elem_h):
        rows = elem_h.T.reshape(-1, 9)[asm_src]

        def body(i, c):
            o = jax.ops.segment_sum(rows * c, stage1, num_segments=nUB,
                                    indices_are_sorted=True)
            return 1.0 + EPS * jnp.sum(o[0])
        return jax.lax.fori_loop(0, R, body, jnp.float32(1))

    timed("asm segsum 1.48M->253K rows of 9", a_segsum, elem_h)

    compact = jnp.asarray(rng.standard_normal((nUB, 9)), jnp.float32)

    def a_scatter(compact):
        def body(i, c):
            flatb = jnp.zeros((total,), jnp.float32).at[band_dest].set(
                (compact * c).reshape(-1), mode="drop")
            return 1.0 + EPS * flatb[0]
        return jax.lax.fori_loop(0, R, body, jnp.float32(1))

    timed("banded scatter-set 2.28M into 740MB", a_scatter, compact)


if __name__ == "__main__":
    main()
