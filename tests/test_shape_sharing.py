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


def test_multi_panel_scan_compiles_once(tmp_path):
    """End-to-end guard for the compile sharing (VERDICT r4 weak #5): a
    4-panel-split scan through the ENGINE must grow the fused-scan jit
    cache by at most 2 entries (the main 3-lane program + at most one
    single-lane retry program) — i.e. the per-panel dispatches actually
    reuse one compiled scan, rather than merely packing equal-shaped
    tables."""
    from genefuserust_tpu.core.mapper import FusionMapper
    from genefuserust_tpu.ops.fused import fused_scan_lanes
    from genefuserust_tpu.parallel.engine import TpuEngine
    from genefuserust_tpu.utils.synthetic import make_panel, plant_fusion_pairs

    panel = make_panel(seed=11, chrom_len=30000, n_genes=8, gene_len=10000)
    parts = _split_csv(panel.csv_text, 4)
    mappers = []
    for k, text in enumerate(parts):
        p = tmp_path / f"part{k}.csv"
        p.write_text(text)
        mappers.append(FusionMapper(panel.contigs, str(p), Settings()))
    pairs = plant_fusion_pairs(panel, n_support=5, n_background=120, seed=7)
    import numpy as np_  # tokenize via the engine's own helper

    from genefuserust_tpu.parallel.engine import _tokenize_bytes

    L = 192
    b1, l1 = _tokenize_bytes([p.left.seq.encode() for p in pairs], L)
    q1, _ = _tokenize_bytes([p.left.quality.encode() for p in pairs], L)
    b2, l2 = _tokenize_bytes([p.right.seq.encode() for p in pairs], L)
    q2, _ = _tokenize_bytes([p.right.quality.encode() for p in pairs], L)
    engine = TpuEngine(Settings(), batch_size=64)
    before = fused_scan_lanes._cache_size()
    for s in range(0, len(pairs), 64):
        sl = slice(s, min(len(pairs), s + 64))
        engine._scan_pair_matrices(
            mappers, b1[sl], q1[sl], l1[sl], b2[sl], q2[sl], l2[sl],
            lambda i, s=s: (pairs[s + i].left, pairs[s + i].right),
        )
    engine.flush()
    grown = fused_scan_lanes._cache_size() - before
    assert grown <= 2, f"fused_scan_lanes compiled {grown} variants"
    # (the planted fusion's genes may land in different split CSVs, so a
    # positive detection is not guaranteed here; the scan must simply
    # have processed every pair through the engine)
    assert engine._progress_n >= len(pairs)


def test_dupe_table_dims_are_pow2_bucketed(tmp_path):
    # a duplicated motif forces real dupe entries; dims must still land on
    # the pow2 buckets (rows >= 16, max_dupe pow2) with lookups intact
    rng = np.random.default_rng(3)
    from genefuserust_tpu.utils.synthetic import random_seq

    motif = random_seq(rng, 60)
    seq = random_seq(rng, 6000) + motif + random_seq(rng, 500) + motif
    seq += random_seq(rng, 3000)
    contigs = {"chr1": seq}
    csv = f">G1,chr1:1000-{len(seq) - 100}\n1,1100,1400\n2,2000,2400\n"
    path = str(tmp_path / "dupes.csv")
    with open(path, "w") as f:
        f.write(csv)
    fusions = Fusion.parse_csv(path)
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


def test_pad_reuse_window_is_one_quarter_step():
    """Regression guard for the round-5 sticky-pad bug: with 65536 already
    in the memo (the merged lane), a ~30k-row lane must get its own 32768
    pad, not adopt the 2x-too-big 65536 (which doubled that lane's gather
    volume); adjacent quarter-step reuse (49152 -> 65536) stays allowed."""
    from genefuserust_tpu.parallel.engine import TpuEngine

    e = TpuEngine(Settings(), batch_size=65536)
    assert e._pad_rows(50452) == 65536  # merged lane seeds the memo
    assert e._pad_rows(30168) == 32768  # unmerged lane: NOT 65536
    assert e._pad_rows(49152) == 65536  # adjacent quarter-step reuse ok
    assert e._pad_rows(100) == 128  # small-lane floor
    assert e._pad_rows(30169) == 32768  # stable thereafter
