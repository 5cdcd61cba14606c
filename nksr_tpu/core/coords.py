"""Integer voxel-coordinate keys and sorted-set primitives.

TPU-native replacement for the VDB-style native hash grid used by the
reference's ``nksr.svh`` runtime (contract recovered from usage at
/root/reference/models/nksr_net.py:57-62 and /root/reference/models/loss.py:33-46).

Design notes (TPU-first):
  * XLA has no atomics and wants static shapes, so instead of an
    open-addressing hash table we keep active voxel coordinates in a
    *sorted* array of 2-word lexicographic keys.  Membership queries are
    vectorized binary searches (pure gathers), duplicates are removed with
    sort + adjacent-compare + masked scatter, and set union is concat+sort.
  * Keys are two uint32 words (``hi`` = packed i,j; ``lo`` = packed k) so we
    never need int64 (which XLA:TPU only emulates).  Coordinates must be in
    ``[-2**15, 2**15)`` — at a 10 cm voxel that is a ±3.2 km extent per
    chunk, beyond which the chunked reconstruction mode applies (mirrors the
    reference's chunk-mode prescaling rule, /root/reference/NKSR-USAGE.md:137).
  * All arrays carry a static ``capacity``; the live prefix is ``n`` and
    padding slots hold ``INVALID`` keys that sort to the end.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

COORD_OFFSET = 1 << 15  # coords valid in [-2**15, 2**15)
INVALID_HI = jnp.uint32(0xFFFFFFFF)
INVALID_LO = jnp.uint32(0xFFFFFFFF)  # valid lo is <= 0xFFFF, so this is unused


def pack(coords: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., 3) int32 ijk -> (hi, lo) uint32 lexicographic key words."""
    i = (coords[..., 0] + COORD_OFFSET).astype(jnp.uint32)
    j = (coords[..., 1] + COORD_OFFSET).astype(jnp.uint32)
    k = (coords[..., 2] + COORD_OFFSET).astype(jnp.uint32)
    hi = (i << 16) | j
    lo = k
    return hi, lo


def unpack(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """(hi, lo) uint32 -> (..., 3) int32 ijk."""
    i = (hi >> 16).astype(jnp.int32) - COORD_OFFSET
    j = (hi & jnp.uint32(0xFFFF)).astype(jnp.int32) - COORD_OFFSET
    k = lo.astype(jnp.int32) - COORD_OFFSET
    return jnp.stack([i, j, k], axis=-1)


def key_less(a_hi, a_lo, b_hi, b_lo):
    return (a_hi < b_hi) | ((a_hi == b_hi) & (a_lo < b_lo))


def key_eq(a_hi, a_lo, b_hi, b_lo):
    return (a_hi == b_hi) & (a_lo == b_lo)


def sort_keys(hi: jnp.ndarray, lo: jnp.ndarray, *payload):
    """Lexicographically sort keys (and optional same-length payloads)."""
    out = jax.lax.sort((hi, lo) + tuple(payload), num_keys=2)
    return out


def masked_keys(coords: jnp.ndarray, mask: jnp.ndarray):
    """Pack coords but give masked-out rows INVALID keys (sort to the end)."""
    hi, lo = pack(coords)
    hi = jnp.where(mask, hi, INVALID_HI)
    lo = jnp.where(mask, lo, INVALID_LO)
    return hi, lo


def unique_coords(coords: jnp.ndarray, mask: jnp.ndarray, capacity: int):
    """Deduplicate (N, 3) int32 coords under ``mask`` into a sorted set.

    Returns ``(hi, lo, out_coords, n)`` where the first ``n`` slots of the
    ``capacity``-sized outputs hold the sorted unique coordinates and the
    rest hold INVALID keys.  If there are more than ``capacity`` unique
    coordinates the overflow is dropped (callers size capacities with
    headroom and can detect overflow via ``n == capacity``).
    """
    hi, lo = masked_keys(coords, mask)
    hi, lo = sort_keys(hi, lo)
    valid = hi != INVALID_HI
    first = jnp.concatenate(
        [valid[:1], ~key_eq(hi[1:], lo[1:], hi[:-1], lo[:-1]) & valid[1:]]
    )
    dest = jnp.cumsum(first.astype(jnp.int32)) - 1
    n = jnp.sum(first.astype(jnp.int32))
    dest = jnp.where(first, dest, capacity)  # dropped rows go out of bounds
    out_hi = jnp.full((capacity,), INVALID_HI).at[dest].set(hi, mode="drop")
    out_lo = jnp.full((capacity,), INVALID_LO).at[dest].set(lo, mode="drop")
    out_coords = unpack(out_hi, out_lo)
    out_coords = jnp.where((jnp.arange(capacity) < n)[:, None], out_coords, 0)
    return out_hi, out_lo, out_coords, jnp.minimum(n, capacity)


def search_sorted(set_hi: jnp.ndarray, set_lo: jnp.ndarray, n: jnp.ndarray,
                  q_hi: jnp.ndarray, q_lo: jnp.ndarray) -> jnp.ndarray:
    """Find each query key in the sorted key set (-1 where absent).

    Implemented as a sort-merge join: concatenate set and query keys, sort
    once, and read each query's predecessor set element off a cumulative
    count.  On TPU this is the right primitive — XLA's sort is fully
    vectorized sequential access, while per-query binary search costs
    ~log2(C) rounds of *random* HBM gathers (profiled 20-100x slower at
    10^6-10^7 queries).
    """
    C = set_hi.shape[0]
    M = q_hi.shape[0]
    all_hi = jnp.concatenate([set_hi, q_hi])
    all_lo = jnp.concatenate([set_lo, q_lo])
    is_q = jnp.concatenate([jnp.zeros(C, jnp.uint32),
                            jnp.ones(M, jnp.uint32)])
    payload = jnp.concatenate([jnp.zeros(C, jnp.int32),
                               jnp.arange(M, dtype=jnp.int32)])
    # equal keys: set element sorts before its queries (is_q key)
    sh, sl, sq, sp = jax.lax.sort((all_hi, all_lo, is_q, payload),
                                  num_keys=3)
    set_pos = jnp.cumsum(1 - sq.astype(jnp.int32)) - 1  # predecessor index
    cand = jnp.where(sq == 1, set_pos, -1)
    safe = jnp.clip(cand, 0, C - 1)
    found = (cand >= 0) & (cand < n) & key_eq(
        jnp.take(set_hi, safe), jnp.take(set_lo, safe), sh, sl)
    res = jnp.where(found, cand, -1)
    out = jnp.zeros((M,), jnp.int32).at[
        jnp.where(sq == 1, sp, M)].set(res, mode="drop")
    return out


def search_sorted_binary(set_hi: jnp.ndarray, set_lo: jnp.ndarray,
                         n: jnp.ndarray, q_hi: jnp.ndarray,
                         q_lo: jnp.ndarray) -> jnp.ndarray:
    """Per-query binary search variant (for few queries over big sets)."""
    capacity = set_hi.shape[0]
    iters = max(1, (capacity).bit_length())
    low = jnp.zeros(q_hi.shape, jnp.int32)
    high = jnp.full(q_hi.shape, capacity, jnp.int32)

    def body(_, state):
        low, high = state
        mid = (low + high) >> 1
        m_hi = jnp.take(set_hi, mid, mode="clip")
        m_lo = jnp.take(set_lo, mid, mode="clip")
        less = key_less(m_hi, m_lo, q_hi, q_lo)
        low = jnp.where(less, mid + 1, low)
        high = jnp.where(less, high, mid)
        return low, high

    low, _ = jax.lax.fori_loop(0, iters, body, (low, high))
    f_hi = jnp.take(set_hi, low, mode="clip")
    f_lo = jnp.take(set_lo, low, mode="clip")
    found = key_eq(f_hi, f_lo, q_hi, q_lo) & (low < n)
    return jnp.where(found, low, -1)


def multi_search_sorted(sets, queries):
    """Batched sort-join over SEVERAL (set, query) pairs in ONE sort.

    ``sets``: list of (set_hi, set_lo, n); ``queries``: list of
    (q_hi, q_lo) — same length.  Returns a list of int32 index arrays.

    Each big sort costs minutes of (remote) XLA compile time because the
    bitonic lowering emits ~log^2(n) stages; folding every lookup of a
    pipeline stage into one segmented sort (segment id as the leading key)
    pays that cost once.
    """
    assert len(sets) == len(queries)
    sid_parts, hi_parts, loq_parts, pay_parts = [], [], [], []
    q_offsets = []
    off = 0
    for i, ((shi, slo, _), (qhi, qlo)) in enumerate(zip(sets, queries)):
        sid = jnp.uint32(i)
        c = shi.shape[0]
        m = qhi.shape[0]
        sid_parts += [jnp.full((c,), sid), jnp.full((m,), sid)]
        hi_parts += [shi, qhi]
        # fold (lo, is_query) into one word: valid lo <= 0xFFFF, and set
        # elements (bit 0 = 0) sort before their equal-key queries
        loq_parts += [jnp.where(slo == INVALID_LO, INVALID_LO, slo << 1),
                      jnp.minimum((qlo << 1) | 1, INVALID_LO)]
        pay_parts += [jnp.full((c,), -1, jnp.int32),
                      jnp.arange(off, off + m, dtype=jnp.int32)]
        q_offsets.append((off, m))
        off += m
    sid_s, hi_s, loq_s, pay_s = jax.lax.sort(
        (jnp.concatenate(sid_parts), jnp.concatenate(hi_parts),
         jnp.concatenate(loq_parts), jnp.concatenate(pay_parts)),
        num_keys=3)
    is_q = (loq_s & 1).astype(jnp.int32)
    is_q = jnp.where(loq_s == INVALID_LO, 0, is_q)
    run = jnp.cumsum(1 - is_q) - 1  # running count of set elements
    seg_sizes = jnp.asarray([s[0].shape[0] for s in sets], jnp.int32)
    seg_base = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                jnp.cumsum(seg_sizes)[:-1]])
    base = jnp.take(seg_base, jnp.clip(sid_s.astype(jnp.int32), 0,
                                       len(sets) - 1))
    local = run - base  # candidate index within this segment's set
    # verify the candidate by key equality against the flattened sets
    all_shi = jnp.concatenate([s[0] for s in sets])
    all_slo = jnp.concatenate([s[1] for s in sets])
    cand_flat = jnp.clip(base + jnp.maximum(local, 0), 0,
                         all_shi.shape[0] - 1)
    ok = local >= 0
    for i, (_, _, n) in enumerate(sets):
        ok = ok & jnp.where(sid_s.astype(jnp.int32) == i, local < n, True)
    found = ok & (is_q == 1) & \
        (jnp.take(all_shi, cand_flat) == hi_s) & \
        (jnp.take(all_slo, cand_flat) == (loq_s >> 1))
    res = jnp.where(found, local, -1)
    results = jnp.full((off + 1,), -1, jnp.int32).at[
        jnp.where(is_q == 1, pay_s, off)].set(res, mode="drop")[:-1]
    return [results[o:o + m] for (o, m) in q_offsets]


def lookup_coords(set_hi, set_lo, n, coords) -> jnp.ndarray:
    """Indices of (..., 3) int32 coords in the sorted set (-1 if absent)."""
    q_hi, q_lo = pack(coords)
    shape = q_hi.shape
    idx = search_sorted(set_hi, set_lo, n, q_hi.reshape(-1), q_lo.reshape(-1))
    return idx.reshape(shape)


@functools.partial(jax.jit, static_argnames=("capacity",))
def unique_coords_jit(coords, mask, capacity: int):
    return unique_coords(coords, mask, capacity)
