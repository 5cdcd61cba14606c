"""Stream compaction without long scalar scatters.

The obvious TPU compaction — ``zeros(cap).at[where(mask, rank, cap)]
.set(arange(N))`` — issues a scatter with N index rows.  Scalar (1-lane)
scatters cost ~25 ns/row regardless of how many rows are dropped, so at
dense-lattice meshing scale (N ~ 7e7 fine cells, done 4-5 times per
mesh) the compactions alone were ~7 s of the 10 s extraction
(measured on TPU v5e, BASELINE.md round-2 trajectory).

``compact_ids`` produces the same result with block-local lane sorts and
only short scatters/gathers:

  1. view the mask as (N/128, 128) lane blocks;
  2. per block, stable-sort lanes by liveness (a 128-wide bitonic sort —
     vector work, no data-dependent addressing);
  3. exclusive-scan the per-block live counts -> each block's base output
     offset (a (N/128,) cumsum);
  4. invert the map OUTPUT-side: scatter each live block's id at its base
     offset (N/128 index rows, 512x fewer) and forward-fill with a
     cummax, so output slot j knows its source block; the source lane is
     then ``j - base[block]`` into the lane-sorted table — two short
     gathers (cap rows).

Total data-dependent-addressing work is O(N/128 + cap) rows instead of
O(N), turning ~1.8 s compactions into ~100 ms.

Used by the dense dual-MC mesher (meshing/lattice_mc.py); reference
analog: the CUDA mesher's thrust::copy_if / exclusive_scan compactions
inside the unvendored `nksr` wheel's dual-MC (contract
/root/reference/NKSR-USAGE.md:77).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_L = 128


def compact_ids(flat: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Indices of the set elements of ``flat``, ascending, padded to
    ``cap``.

    ``ids[j]`` = flat index of the j-th True element for
    ``j < popcount(flat)``; for ``j >= popcount`` the value is an
    arbitrary index in range of the 128-padded length — it can reach
    ``ceil(n/128)*128 - 1``, i.e. BEYOND ``n-1``.  Callers must mask by
    the live count, or read through clip-mode ``jnp.take`` (as all
    in-tree callers do); do not scatter with these ids unmasked.
    """
    n = int(flat.shape[0])
    nb = -(-n // _L)
    live = jnp.pad(flat.astype(bool), (0, nb * _L - n)).reshape(nb, _L)
    lane = jnp.broadcast_to(jnp.arange(_L, dtype=jnp.int32), (nb, _L))
    # live lanes first, stable in lane order
    key = jnp.where(live, lane, _L + lane)
    _, slane = jax.lax.sort((key, lane), dimension=-1, num_keys=1)

    cnt = jnp.sum(live.astype(jnp.int32), axis=1)
    base = jnp.cumsum(cnt) - cnt                    # exclusive scan
    # output slot j -> source block: live blocks' bases are strictly
    # increasing, so scatter each block id at its base and forward-fill
    blk = jnp.zeros((cap,), jnp.int32)
    blk = blk.at[jnp.where(cnt > 0, base, cap)].set(
        jnp.arange(nb, dtype=jnp.int32), mode="drop")
    blk = jax.lax.cummax(blk, axis=0)

    j = jnp.arange(cap, dtype=jnp.int32)
    lane_of = jnp.clip(j - jnp.take(base, blk), 0, _L - 1)
    src_lane = jnp.take(slane.reshape(-1), blk * _L + lane_of)
    return blk * _L + src_lane
