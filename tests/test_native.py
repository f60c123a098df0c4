"""Native plan-ops (packed radix sort + fused unique) vs numpy reference."""

import numpy as np

from dot_tpu import native


def test_sort_unique_inverse_matches_numpy(rng):
    keys = rng.integers(0, 1 << 35, size=200_000).astype(np.int64)
    keys[:1000] = keys[1000:2000]  # force duplicates
    perm, inv, uni = native.sort_unique_inverse(keys)

    ref_perm = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(perm, ref_perm)  # incl. stability
    ref_uni, ref_inv = np.unique(keys[ref_perm], return_inverse=True)
    np.testing.assert_array_equal(uni, ref_uni)
    np.testing.assert_array_equal(inv, ref_inv)


def test_block_plan_matches_numpy(rng):
    n, n3 = 50_000, 300
    sbd = rng.integers(0, 4, size=n).astype(np.int32)
    row = rng.integers(0, n3 // 3, size=n).astype(np.int32)
    col = rng.integers(0, n3 // 3, size=n).astype(np.int32)
    perm, inv, uni = native.block_plan(sbd, row, col, n3)

    i3 = np.arange(3, dtype=np.int64)
    dest = (sbd.astype(np.int64)[:, None, None] * (n3 * n3)
            + (row.astype(np.int64)[:, None, None] * 3 + i3[None, :, None]) * n3
            + (col.astype(np.int64)[:, None, None] * 3 + i3[None, None, :]))
    dest = dest.reshape(-1)
    ref_perm = np.argsort(dest, kind="stable")
    np.testing.assert_array_equal(perm, ref_perm)
    ref_uni, ref_inv = np.unique(dest[ref_perm], return_inverse=True)
    np.testing.assert_array_equal(uni, ref_uni)
    np.testing.assert_array_equal(inv, ref_inv)
