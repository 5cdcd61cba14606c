"""Native (C++) host runtime: sort primitives vs numpy oracles."""

import numpy as np
import pytest

from nksr_tpu.native import (merge_unique, radix_argsort, sort_unique,
                             sorted_join, keysearch, stencil_join,
                             flat_cells, using_native)


@pytest.mark.parametrize("shift", [-3, -1, 0, 2])
def test_flat_cells_matches_numpy(shift):
    """Fused shift/origin/bounds/flat-index pass == the numpy oracle
    (plan_lattice's flat_cell)."""
    rng = np.random.default_rng(shift + 10)
    c = rng.integers(-300, 300, (20000, 3)).astype(np.int64)
    origin, dims = (-100, -50, -20), (190, 140, 80)
    got = flat_cells(c, shift, origin, dims)
    cd = (c << shift) if shift >= 0 else (c >> -shift)
    loc = cd - np.array(origin, np.int64)
    ok = ((loc >= 0) & (loc < np.array(dims))).all(-1)
    f = (loc[:, 0] * dims[1] + loc[:, 1]) * dims[2] + loc[:, 2]
    np.testing.assert_array_equal(got, np.where(ok, f, 0).astype(np.int32))


def test_flat_cells_out_view():
    """Writing into a preallocated strided row view (the slot-table
    fill pattern in plan_lattice)."""
    rng = np.random.default_rng(0)
    c = rng.integers(-40, 40, (500, 3)).astype(np.int64)
    tab = np.zeros((3, 600), np.int32)
    flat_cells(c, -1, (-20, -20, -20), (40, 40, 40), out=tab[1, :500])
    ref = flat_cells(c, -1, (-20, -20, -20), (40, 40, 40))
    np.testing.assert_array_equal(tab[1, :500], ref)
    assert tab[0].sum() == 0 and tab[2].sum() == 0 and tab[1, 500:].sum() == 0


@pytest.mark.parametrize("n", [0, 1, 7, 1000, 100000])
def test_radix_argsort_matches_numpy(n):
    rng = np.random.default_rng(n)
    k = rng.integers(-10 ** 12, 10 ** 12, n).astype(np.int64)
    np.testing.assert_array_equal(k[radix_argsort(k)], np.sort(k))


def test_radix_argsort_stable():
    rng = np.random.default_rng(0)
    k = np.repeat(np.arange(5, dtype=np.int64), 40)[rng.permutation(200)]
    o = radix_argsort(k)
    for v in range(5):
        idx = o[k[o] == v]
        assert (np.diff(idx) > 0).all()


def test_sort_unique_matches_numpy():
    rng = np.random.default_rng(1)
    k = rng.integers(-1000, 1000, 50000).astype(np.int64)
    np.testing.assert_array_equal(sort_unique(k), np.unique(k))


def test_merge_unique_matches_numpy():
    rng = np.random.default_rng(2)
    base = np.unique(rng.integers(-10 ** 9, 10 ** 9, 5000).astype(np.int64))
    deltas = rng.integers(-100, 100, 27).astype(np.int64)
    ref = np.unique((base[:, None] + deltas[None]).ravel())
    np.testing.assert_array_equal(merge_unique(base, deltas), ref)


@pytest.mark.parametrize("cap", [None, 2500])
def test_stencil_join_matches_per_column(cap):
    rng = np.random.default_rng(4)
    keys = np.unique(rng.integers(0, 10 ** 6, 4000).astype(np.int64))
    base = np.sort(rng.choice(keys, 1500, replace=False))
    deltas = np.concatenate([[0], rng.integers(-50, 50, 26)]) \
        .astype(np.int64)
    got = stencil_join(keys, base, deltas, cap=cap)
    capv = (1 << 31) - 1 if cap is None else cap
    ref = np.empty((len(base), len(deltas)), np.int32)
    for k, d in enumerate(deltas):
        col = sorted_join(keys, base + d)
        ref[:, k] = np.where(col < capv, col, -1)
    np.testing.assert_array_equal(got, ref)
    if cap is None:
        assert (got[:, 0] >= 0).all()   # delta 0: base keys all present


def test_stencil_join_empty():
    deltas = np.array([0, 1], np.int64)
    assert stencil_join(np.empty(0, np.int64),
                        np.empty(0, np.int64), deltas).shape == (0, 2)
    out = stencil_join(np.empty(0, np.int64),
                       np.array([5], np.int64), deltas)
    np.testing.assert_array_equal(out, [[-1, -1]])


def test_joins_match_searchsorted():
    rng = np.random.default_rng(3)
    keys = np.unique(rng.integers(0, 10 ** 6, 4000).astype(np.int64))
    q = np.sort(rng.integers(0, 10 ** 6, 9000).astype(np.int64))
    pos = np.searchsorted(keys, q)
    pc = np.minimum(pos, len(keys) - 1)
    ref = np.where(keys[pc] == q, pc, -1).astype(np.int32)
    np.testing.assert_array_equal(sorted_join(keys, q), ref)
    np.testing.assert_array_equal(keysearch(keys, q), ref)


def test_fused_key_ops_match_numpy():
    """pack_floor/half/unpack/minmax fused passes == the numpy oracles
    they replace in the host planner (bit-exact, incl. the f32
    division + floor rounding and negative-coordinate halving)."""
    from nksr_tpu.core import host_build as HB
    from nksr_tpu.native import (coord_minmax, half_keys,
                                 pack_floor_keys, unpack_keys)
    rng = np.random.default_rng(7)
    xyz = rng.uniform(-60, 60, (50000, 3)).astype(np.float32)
    for vs in (0.1, 0.07, 1.3):
        ref = HB.pack64(np.floor(xyz / vs).astype(np.int64))
        got = pack_floor_keys(xyz, vs)
        if got is None:   # no native lib in this environment
            pytest.skip("native lib unavailable")
        np.testing.assert_array_equal(ref, got)
    keys = ref
    b = np.int64(1 << 20)
    m = np.int64((1 << 21) - 1)
    i = (keys >> 42) - b
    j = ((keys >> 21) & m) - b
    k = (keys & m) - b
    ref_h = ((((i >> 1) + b) << 42) | (((j >> 1) + b) << 21)
             | ((k >> 1) + b))
    np.testing.assert_array_equal(ref_h, half_keys(keys))
    c = unpack_keys(keys)
    np.testing.assert_array_equal(np.stack([i, j, k], -1), c)
    mn, mx = coord_minmax(c)
    np.testing.assert_array_equal(mn, c.min(0))
    np.testing.assert_array_equal(mx, c.max(0))
