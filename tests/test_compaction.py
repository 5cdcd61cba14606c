"""ops/compaction.py: block compaction == np.nonzero, all edge shapes."""

import numpy as np
import pytest

from nksr_tpu.ops.compaction import compact_ids


@pytest.mark.parametrize("n,density", [
    (1, 1.0), (127, 0.5), (128, 0.5), (129, 0.5), (1000, 0.03),
    (4096, 0.97), (5000, 0.5), (70000, 0.001),
])
def test_matches_nonzero(n, density):
    rng = np.random.default_rng(n)
    flat = rng.uniform(size=n) < density
    want = np.nonzero(flat)[0]
    cap = max(1, int(1.5 * max(len(want), 1)))
    ids = np.asarray(compact_ids(flat, cap))
    assert ids.shape == (cap,)
    assert (ids >= 0).all()
    m = min(len(want), cap)
    np.testing.assert_array_equal(ids[:m], want[:m])


def test_empty_mask():
    ids = np.asarray(compact_ids(np.zeros(300, bool), 16))
    assert ids.shape == (16,)
    assert (ids >= 0).all() and (ids < 384).all()


def test_all_set():
    ids = np.asarray(compact_ids(np.ones(300, bool), 512))
    np.testing.assert_array_equal(ids[:300], np.arange(300))


def test_overflow_cap_truncates_in_order():
    flat = np.ones(1000, bool)
    ids = np.asarray(compact_ids(flat, 256))
    np.testing.assert_array_equal(ids, np.arange(256))


def test_pack64_order_is_flat_id_order():
    """The dense-UNet sorted splat relies on pack64 key order ==
    dense flat-id order ((x*Y+y)*Z+z): both must be lexicographic in
    (x, y, z).  Guards the indices_are_sorted claim in
    models/dense_unet.py (a violated sortedness hint silently
    mis-scatters on TPU)."""
    from nksr_tpu.core.host_build import pack64

    rng = np.random.default_rng(0)
    c = rng.integers(-500, 500, size=(5000, 3)).astype(np.int64)
    keys = pack64(c)
    order = np.argsort(keys, kind="stable")
    cs = c[order]
    Y, Z = 2000, 2000  # any dims larger than the coordinate range
    flat = ((cs[:, 0] + 600) * Y + (cs[:, 1] + 600)) * Z + (cs[:, 2] + 600)
    assert (np.diff(flat) >= 0).all()
