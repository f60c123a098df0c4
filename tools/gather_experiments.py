#!/usr/bin/env python
"""Measure alternative TPU formulations of the two mesh primitives that
dominate the step cost: corner gather (nV,3)->(nE,4,3) and vertex
scatter-add (nE,4,3)->(nV,3). Shapes match bar17K DOT6 (nEp=87552,
nV=17315). EVERY loop body derives its inputs from the loop carry so
nothing is hoisted out of the fori_loop."""

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
    print(f"{name:44s} {dt*1e3:9.3f} ms/rep", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    nV, nE = 17315, 87552
    conn = rng.integers(0, nV, (nE, 4)).astype(np.int32)
    flat = conn.ravel()
    perm = np.argsort(flat, kind="stable").astype(np.int32)
    segids = flat[perm].astype(np.int32)

    x = jnp.asarray(rng.standard_normal((nV, 3)), jnp.float32)
    xT = jnp.asarray(np.asarray(x).T.copy())
    conn_cols = tuple(jnp.asarray(conn[:, c].copy()) for c in range(4))
    flat_j = jnp.asarray(flat)
    # c-major flat: idx = c*nE + e (no interleave needed on device)
    flat_cm = np.concatenate([conn[:, c] for c in range(4)])
    perm_cm = np.argsort(flat_cm, kind="stable").astype(np.int32)
    segids_cm = flat_cm[perm_cm].astype(np.int32)
    perm_cm_j = jnp.asarray(perm_cm)
    segids_cm_j = jnp.asarray(segids_cm)
    perm_j = jnp.asarray(perm)
    segids_j = jnp.asarray(segids)

    counts = np.bincount(flat, minlength=nV)
    maxdeg = int(counts.max())
    print(f"maxdeg = {maxdeg}, mean = {counts.mean():.1f}")
    pad_idx = np.full((nV, maxdeg), nE * 4, np.int64)
    posn = np.zeros(nV, np.int64)
    for k, v in enumerate(flat):
        pad_idx[v, posn[v]] = (k % 4) * nE + (k // 4)
        posn[v] += 1
    pad_idx_j = jnp.asarray(pad_idx.astype(np.int32))

    ge = [jnp.asarray(rng.standard_normal(nE), jnp.float32)
          for _ in range(4)]
    ge_cm = jnp.concatenate(ge)
    ge3d = jnp.asarray(rng.standard_normal((nE * 4, 3)), jnp.float32)

    print("--- corner gather (x -> per-element corner values) ---")

    def g_12scalar(xT):
        def body(i, c):
            xs = tuple(xT[d] * c for d in range(3))
            out = sum(jnp.sum(xs[d][conn_cols[cc]]) for cc in range(4)
                      for d in range(3))
            return 1.0 + EPS * out
        return jax.lax.fori_loop(0, R, body, jnp.float32(1))

    timed("12x scalar gather from (3,nV) rows", g_12scalar, xT)

    def g_4row(x):
        def body(i, c):
            xs = x * c
            out = sum(jnp.sum(xs[conn_cols[cc]]) for cc in range(4))
            return 1.0 + EPS * out
        return jax.lax.fori_loop(0, R, body, jnp.float32(1))

    timed("4x row gather (nV,3) slices", g_4row, x)

    def g_1flat(x):
        def body(i, c):
            xs = x * c
            return 1.0 + EPS * jnp.sum(xs[flat_j])
        return jax.lax.fori_loop(0, R, body, jnp.float32(1))

    timed("1x row gather of (nE*4,) from (nV,3)", g_1flat, x)

    def g_1flat_xT(xT):
        def body(i, c):
            xs = xT * c
            return 1.0 + EPS * jnp.sum(xs[:, flat_j])
        return jax.lax.fori_loop(0, R, body, jnp.float32(1))

    timed("1x gather of (3,nE*4) from (3,nV)", g_1flat_xT, xT)

    print("--- vertex scatter-add ---")

    def s_current(ge0, ge1, ge2, ge3):
        def body(i, c):
            vals = jnp.stack([ge0 * c, ge1 * c, ge2 * c, ge3 * c],
                             axis=1).reshape(-1)[perm_j]
            o = jax.ops.segment_sum(vals, segids_j, num_segments=nV + 1,
                                    indices_are_sorted=True)
            return 1.0 + EPS * jnp.sum(o)
        return jax.lax.fori_loop(0, R, body, jnp.float32(1))

    timed("stack+perm gather+sorted segsum (1 dim)", s_current, *ge)

    def s_cm(gecm):
        def body(i, c):
            vals = (gecm * c)[perm_cm_j]
            o = jax.ops.segment_sum(vals, segids_cm_j, num_segments=nV + 1,
                                    indices_are_sorted=True)
            return 1.0 + EPS * jnp.sum(o)
        return jax.lax.fori_loop(0, R, body, jnp.float32(1))

    timed("c-major perm gather+sorted segsum (1 dim)", s_cm, ge_cm)

    def s_perm_only(gecm):
        def body(i, c):
            vals = (gecm * c)[perm_cm_j]
            return 1.0 + EPS * jnp.sum(vals)
        return jax.lax.fori_loop(0, R, body, jnp.float32(1))

    timed("  ... perm gather only", s_perm_only, ge_cm)

    def s_segsum_only(gecm):
        def body(i, c):
            o = jax.ops.segment_sum(gecm * c, segids_cm_j,
                                    num_segments=nV + 1,
                                    indices_are_sorted=True)
            return 1.0 + EPS * jnp.sum(o)
        return jax.lax.fori_loop(0, R, body, jnp.float32(1))

    timed("  ... sorted segsum only (no perm)", s_segsum_only, ge_cm)

    def s_scatter(gecm):
        def body(i, c):
            o = jnp.zeros(nV, jnp.float32).at[flat_cm].add(gecm * c)
            return 1.0 + EPS * jnp.sum(o)
        return jax.lax.fori_loop(0, R, body, jnp.float32(1))

    flat_cm_j = jnp.asarray(flat_cm)

    def s_scatter2(gecm):
        def body(i, c):
            o = jnp.zeros(nV, jnp.float32).at[flat_cm_j].add(gecm * c)
            return 1.0 + EPS * jnp.sum(o)
        return jax.lax.fori_loop(0, R, body, jnp.float32(1))

    timed("unsorted .at[].add (1 dim)", s_scatter2, ge_cm)

    def s_padded(gecm):
        def body(i, c):
            vals = jnp.concatenate([gecm * c, jnp.zeros(1, jnp.float32)])
            o = jnp.sum(vals[pad_idx_j], axis=1)
            return 1.0 + EPS * jnp.sum(o)
        return jax.lax.fori_loop(0, R, body, jnp.float32(1))

    timed("padded (nV,maxdeg) gather + rowsum", s_padded, ge_cm)

    def s_rows3(ge3d):
        def body(i, c):
            vals = (ge3d * c)[perm_j]
            o = jax.ops.segment_sum(vals, segids_j, num_segments=nV + 1,
                                    indices_are_sorted=True)
            return 1.0 + EPS * jnp.sum(o)
        return jax.lax.fori_loop(0, R, body, jnp.float32(1))

    timed("3-dim rows: perm gather+segsum (nE*4,3)", s_rows3, ge3d)

    def s_padded3(ge3d):
        def body(i, c):
            vals = jnp.concatenate([ge3d * c,
                                    jnp.zeros((1, 3), jnp.float32)])
            o = jnp.sum(vals[pad_idx_j], axis=1)
            return 1.0 + EPS * jnp.sum(o)
        return jax.lax.fori_loop(0, R, body, jnp.float32(1))

    timed("3-dim rows: padded gather + rowsum", s_padded3, ge3d)


if __name__ == "__main__":
    main()
