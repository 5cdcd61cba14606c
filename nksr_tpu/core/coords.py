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
    """Find each query key in the sorted key set.

    Returns int32 indices into the set, or -1 where absent.  Pure gathers —
    no host sync, no atomics; ~log2(capacity) fori_loop iterations.
    """
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


def lookup_coords(set_hi, set_lo, n, coords) -> jnp.ndarray:
    """Indices of (..., 3) int32 coords in the sorted set (-1 if absent)."""
    q_hi, q_lo = pack(coords)
    shape = q_hi.shape
    idx = search_sorted(set_hi, set_lo, n, q_hi.reshape(-1), q_lo.reshape(-1))
    return idx.reshape(shape)


@functools.partial(jax.jit, static_argnames=("capacity",))
def unique_coords_jit(coords, mask, capacity: int):
    return unique_coords(coords, mask, capacity)
