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
