"""Gather helpers tuned for TPU.

`take_along_axis` with arbitrary per-element indices lowers to a slow
scalar gather on TPU; axis-0 `jnp.take` on a flattened array is the fast
path (measured ~30x faster at these shapes). `row_take` expresses per-row
column indexing that way.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def row_take(arr2d: jnp.ndarray, col_idx: jnp.ndarray) -> jnp.ndarray:
    """(B, L) array, (B, K) int32 column indices -> (B, K) values
    arr2d[b, clip(col_idx[b, k], 0, L-1)]."""
    B, L = arr2d.shape
    K = col_idx.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, K), 0)
    flat = rows * L + jnp.clip(col_idx, 0, L - 1)
    return jnp.take(arr2d.reshape(-1), flat.reshape(-1), axis=0).reshape(B, K)
