"""Multi-chip scale-out: data-parallel read batches over a device mesh.

The reference's intra-process thread pipeline (rayon + crossbeam queue,
src/core/pescanner.rs:296-425) maps to TPU as: the panel index is
REPLICATED on every chip (it is small relative to HBM), read batches are
SHARDED over the mesh's 'data' axis, each chip runs merge+map_read on its
shard, and per-shard match-count statistics ride a psum over ICI. Match
records stay device-sharded and are gathered to host only for the rare
matched rows; the deterministic (read_break desc, len asc, name desc) host
sort then makes the merged result order-independent, reproducing the
reference's determinism guarantee (read_match.rs:227).

Multi-host deployment: the same shard_map program under jax.distributed —
batches arrive host-local (process-local shards), collectives ride
ICI/DCN automatically.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import KMER
from ..ops.map_read import MapReadResult, map_read_batch
from ..ops.merge import merge_batch


class ShardedScanStats(NamedTuple):
    n_merged: jnp.ndarray  # () int32, global (psum)
    n_mapable: jnp.ndarray  # () int32, global (psum)


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def build_sharded_scan(mesh: Mesh, shift: int, max_dupe: int,
                       major_req: int = 40, minor_req: int = 20,
                       mismatch_thr: int = 10, axis: str = "data"):
    """Returns a jitted function:
      (b1, q1, l1, b2r, q2r, l2, table, dupes) ->
          (MergeFields..., MapReadResult x3 lanes, ShardedScanStats)

    Batch-dim arrays are sharded over `axis`; index tables replicated.
    Inside each shard: merge, then map the merged lane plus the R1/R2 lanes
    (unmerged rows); lane masking matches the engine's host compaction —
    merged pairs never map R1/R2 (pescanner.rs:448-471)."""

    def per_shard(b1, q1, l1, b2r, b2, q2r, l2, keys_tbl, vals_tbl, dupes):
        mr = merge_batch(b1, q1, l1, b2r, q2r, l2)
        # merged lane: codes from merged bytes; dead rows get length 0
        from ..core.sequence import BASE_CODE_LUT

        lut = jnp.asarray(BASE_CODE_LUT)
        m_codes = jnp.take(lut, mr.out_seq.astype(jnp.int32), axis=0)
        m_len = jnp.where(mr.merged, mr.out_len, 0)
        res_m = map_read_batch(
            m_codes, m_len, keys_tbl, vals_tbl, dupes, shift, max_dupe,
            major_req, minor_req, mismatch_thr,
        )
        r1_codes = jnp.take(lut, b1.astype(jnp.int32), axis=0)
        r2_codes = jnp.take(lut, b2.astype(jnp.int32), axis=0)
        dead = mr.merged
        res_1 = map_read_batch(
            r1_codes, jnp.where(dead, 0, l1), keys_tbl, vals_tbl, dupes,
            shift, max_dupe, major_req, minor_req, mismatch_thr,
        )
        res_2 = map_read_batch(
            r2_codes, jnp.where(dead, 0, l2), keys_tbl, vals_tbl, dupes,
            shift, max_dupe, major_req, minor_req, mismatch_thr,
        )
        n_merged = jax.lax.psum(jnp.sum(mr.merged.astype(jnp.int32)), axis)
        n_mapable = jax.lax.psum(
            jnp.sum(
                (
                    (res_m.seg_valid[:, 0] & res_m.seg_valid[:, 1])
                    | (res_1.seg_valid[:, 0] & res_1.seg_valid[:, 1])
                    | (res_2.seg_valid[:, 0] & res_2.seg_valid[:, 1])
                ).astype(jnp.int32)
            ),
            axis,
        )
        return (
            tuple(mr),
            tuple(res_m),
            tuple(res_1),
            tuple(res_2),
            (n_merged, n_mapable),
        )

    batch = P(axis)
    repl = P()
    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(batch, batch, batch, batch, batch, batch, batch, repl, repl, repl),
        out_specs=(
            (batch,) * 6,  # MergeResult fields
            (batch,) * 5,  # MapReadResult merged lane
            (batch,) * 5,
            (batch,) * 5,
            (repl, repl),  # stats (psum -> replicated)
        ),
        check_vma=False,
    )

    def wrapped(*args):
        mr, rm, r1, r2, stats = sharded(*args)
        from ..ops.map_read import MapReadResult
        from ..ops.merge import MergeResult

        return (
            MergeResult(*mr),
            MapReadResult(*rm),
            MapReadResult(*r1),
            MapReadResult(*r2),
            ShardedScanStats(*stats),
        )

    return jax.jit(wrapped)
