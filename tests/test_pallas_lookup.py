"""Pallas lookup kernel (interpret mode) must match the XLA hash_lookup."""

import numpy as np
import pytest

from genefuserust_tpu.config import Settings
from genefuserust_tpu.core.indexer import Indexer
from genefuserust_tpu.models.fusion import Fusion
from genefuserust_tpu.ops.hashtable import pack_index
from genefuserust_tpu.utils.synthetic import make_panel, write_panel_files


def test_pallas_lookup_matches_xla(tmp_path):
    import jax.numpy as jnp

    from genefuserust_tpu.ops.map_read import hash_lookup
    from genefuserust_tpu.ops.pallas_lookup import TILE, pallas_lookup

    panel = make_panel(chrom_len=12000, gene_len=6000)
    _, csv_path = write_panel_files(panel, str(tmp_path))
    ix = Indexer(panel.contigs, Fusion.parse_csv(csv_path), Settings())
    ix.make_index()
    packed = pack_index(ix)

    rng = np.random.default_rng(0)
    # half real keys, half random misses
    real = rng.choice(np.asarray(ix.uniq_keys), size=TILE // 2).astype(np.uint32)
    miss = rng.integers(0, 2**32, TILE - TILE // 2, dtype=np.uint64).astype(
        np.uint32
    )
    queries = np.concatenate([real, miss])
    rng.shuffle(queries)
    q_i32 = queries.astype(np.int64)
    q_i32 = np.where(q_i32 >= 2**31, q_i32 - 2**32, q_i32).astype(np.int32)

    keys_d = jnp.asarray(packed.keys_tbl)
    vals_d = jnp.asarray(packed.vals_tbl)
    got = np.asarray(
        pallas_lookup(
            jnp.asarray(q_i32), keys_d, vals_d, packed.shift, interpret=True
        )
    )
    exp_c, exp_p = hash_lookup(
        (keys_d, vals_d),
        packed.shift,
        jnp.asarray(queries.astype(np.uint32)),
        jnp.ones(len(queries), bool),
    )
    exp_c, exp_p = np.asarray(exp_c), np.asarray(exp_p)
    assert (got[:, 0] == exp_c).all()
    assert (got[:, 1] == exp_p).all()
