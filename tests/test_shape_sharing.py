"""Multi-CSV compile sharing: equal splits of a panel must pack to tables
with IDENTICAL static jit signatures (shapes + static scalars), so the
per-panel scan variants compile once and are reused by every CSV.

Round-4 measurement that motivates this: `bench.py --multi-csv 16` spent
1564 s in warmup because the 16 per-CSV tables drifted in pos_bias /
cbits / dupe-table shape (all static under jit: ops/fused.py
static_argnames), recompiling every variant per panel (PERF.md round 4).
The normalization lives in ops/hashtable.py (`_kv_budget` bucketing,
`_entries_from_indexer` pow2 dupe dims); this test pins it.
"""

import numpy as np

from genefuserust_tpu.config import Settings
from genefuserust_tpu.models.fusion import Fusion
from genefuserust_tpu.core.indexer import Indexer
from genefuserust_tpu.ops import hashtable
from genefuserust_tpu.utils.synthetic import make_panel


def _split_csv(csv_text: str, n: int):
    """Round-robin gene blocks into n part-CSVs (bench.split_panel_csvs
    shape)."""
    blocks, cur = [], []
    for line in csv_text.strip().splitlines():
        if line.startswith(">"):
            if cur:
                blocks.append(cur)
            cur = []
        cur.append(line)
    if cur:
        blocks.append(cur)
    return [
        "\n".join("\n".join(b) for b in blocks[k::n]) + "\n" for k in range(n)
    ]


def _signature(packed):
    return (
        type(packed).__name__,
        packed.kv_tbl.shape,
        packed.dupes.shape,
        packed.n_buckets,
        packed.shift,
        packed.cbits,
        packed.pos_bias,
        packed.max_dupe,
    )


def test_equal_panel_splits_share_table_signature(tmp_path):
    panel = make_panel(seed=11, chrom_len=30000, n_genes=8, gene_len=10000)
    parts = _split_csv(panel.csv_text, 4)
    sigs = []
    for k, text in enumerate(parts):
        p = tmp_path / f"part{k}.csv"
        p.write_text(text)
        fusions = Fusion.parse_csv(str(p))
        ix = Indexer(panel.contigs, fusions, Settings())
        ix.make_index()
        packed = hashtable.build_packed_index(ix)
        sigs.append(_signature(packed))
    assert len(set(sigs)) == 1, f"split panels drifted: {sigs}"


def test_dupe_table_dims_are_pow2_bucketed():
    # a duplicated motif forces real dupe entries; dims must still land on
    # the pow2 buckets (rows >= 16, max_dupe pow2) with lookups intact
    rng = np.random.default_rng(3)
    from genefuserust_tpu.utils.synthetic import random_seq

    motif = random_seq(rng, 60)
    seq = random_seq(rng, 6000) + motif + random_seq(rng, 500) + motif
    seq += random_seq(rng, 3000)
    contigs = {"chr1": seq}
    csv = f">G1,chr1:1000-{len(seq) - 100}\n1,1100,1400\n2,2000,2400\n"
    import os

    path = os.path.join(os.path.dirname(__file__), "..", ".pytest_dupes.csv")
    with open(path, "w") as f:
        f.write(csv)
    try:
        fusions = Fusion.parse_csv(path)
    finally:
        os.unlink(path)
    ix = Indexer(contigs, fusions, Settings())
    ix.make_index()
    keys, ctg, poss, dupes, max_dupe = hashtable._entries_from_indexer(ix)
    assert dupes.shape[0] >= 16 and dupes.shape[0] & (dupes.shape[0] - 1) == 0
    assert max_dupe & (max_dupe - 1) == 0
    n_dup = int((ctg == hashtable.DUPE).sum())
    assert n_dup >= 1  # the motif actually created dupe entries
    # packed lookup over every indexed key must agree with the entry table
    packed = hashtable.pack_index_kv(ix)
    out_c, out_p = hashtable.lookup_np_kv(packed, keys)
    reg = ctg >= 0
    np.testing.assert_array_equal(out_c[reg], ctg[reg])
    np.testing.assert_array_equal(out_p[reg], poss[reg])
    assert (out_c[ctg == hashtable.DUPE] == hashtable.DUPE).all()
    assert (out_p[ctg == hashtable.DUPE] == poss[ctg == hashtable.DUPE]).all()
