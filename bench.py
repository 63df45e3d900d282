"""Benchmark: paired-end scan throughput on one chip.

Workload: a cancer-panel-scale synthetic index (the real cancer.csv gene/
exon structure remapped onto synthetic contigs — 136 genes, 15.1 Mbp, same
per-gene spans) and realistic targeted-capture read pairs (150bp, mostly
on-target single-gene, some off-target, trace fusion-junction reads).

Measures the full device pipeline per pair: fast_merge + map_read on the
merged lane + map_read on R1/R2 lanes for unmerged pairs (static 3-lane
step, no host work in the loop). Prints ONE JSON line.

Baseline derivation (BASELINE.md row 5: reference binary, hg19 +
testdata/cancer.csv, 18.41 s on 8 cores): the reference's bench fastqs are
the OpenGene GeneFuse demo pair (~1.34M read pairs); 1.34e6/18.41 s ≈
72.8k pairs/s on a Ryzen 5800X. vs_baseline = our pairs/s / 72,800.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASELINE_PAIRS_PER_SEC = 72_800.0
CACHE = os.path.join(REPO, ".bench_cache")


def build_panel(panel_mbp: float, seed: int = 1):
    """Real cancer.csv gene structure, remapped onto synthetic contigs,
    optionally truncated to ~panel_mbp total."""
    from genefuserust_tpu.config import Settings
    from genefuserust_tpu.core.indexer import Indexer
    from genefuserust_tpu.models.fusion import Fusion
    from genefuserust_tpu.models.gene import Gene
    from genefuserust_tpu.utils.synthetic import random_seq

    rng = np.random.default_rng(seed)
    genes = []
    for line in open("/root/reference/testdata/cancer.csv"):
        if line.startswith(">"):
            m = re.match(r">(\S+?),(\S+?):(\d+)-(\d+)", line.strip())
            genes.append((m.group(1), int(m.group(4)) - int(m.group(3))))
    contigs = {}
    fusions = []
    total = 0
    for i, (name, span) in enumerate(genes):
        if total / 1e6 >= panel_mbp:
            break
        cn = f"c{i:03d}"
        contigs[cn] = random_seq(rng, span + 100)
        g = Gene(name=name, chr=cn, start=50, end=50 + span)
        step = max(1000, span // 20)
        eid = 1
        pos = 60
        while pos + 300 < span and eid <= 40:
            g.add_exon(eid, 50 + pos, 50 + pos + 300)
            eid += 1
            pos += step
        fusions.append(Fusion(g))
        total += span
    ix = Indexer(contigs, fusions, Settings())
    ix.make_index()
    return ix, contigs


def get_packed(panel_mbp: float):
    from genefuserust_tpu.ops.hashtable import PackedIndex, pack_index

    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"panel_{panel_mbp:g}.npz")
    if os.path.exists(path):
        z = np.load(path)
        return (
            PackedIndex(
                z["table"], z["dupes"], int(z["nb"]), int(z["shift"]), int(z["maxd"])
            ),
            None,
        )
    t0 = time.time()
    ix, contigs = build_panel(panel_mbp)
    packed = pack_index(ix)
    print(f"# index build: {time.time() - t0:.1f}s, "
          f"{packed.nbytes / 1e6:.0f} MB table", file=sys.stderr)
    np.savez(
        path,
        table=packed.table,
        dupes=packed.dupes,
        nb=packed.n_buckets,
        shift=packed.shift,
        maxd=packed.max_dupe,
    )
    # also cache read batches' source material
    np.save(
        os.path.join(CACHE, f"panel_{panel_mbp:g}_seqs.npy"),
        np.array([contigs[k] for k in sorted(contigs)], dtype=object),
        allow_pickle=True,
    )
    return packed, contigs


def gen_pairs(panel_mbp: float, n: int, read_len: int = 150, seed: int = 2):
    """Pre-tokenized byte arrays for n pairs: 70% on-target, 29.9% off-
    target, 0.1% junction-spanning."""
    from genefuserust_tpu.core.sequence import COMPLEMENT_LUT
    from genefuserust_tpu.utils.synthetic import random_seq

    seqs_path = os.path.join(CACHE, f"panel_{panel_mbp:g}_seqs.npy")
    gene_seqs = np.load(seqs_path, allow_pickle=True)
    rng = np.random.default_rng(seed)
    frag_len = read_len + 40
    frags = []
    n_on = int(n * 0.70)
    n_junc = max(1, int(n * 0.001))
    n_off = n - n_on - n_junc
    offtarget = random_seq(rng, 200000)
    for k in range(n_on):
        s = gene_seqs[int(rng.integers(len(gene_seqs)))]
        off = int(rng.integers(0, max(1, len(s) - frag_len)))
        frags.append(s[off : off + frag_len])
    for k in range(n_off):
        off = int(rng.integers(0, len(offtarget) - frag_len))
        frags.append(offtarget[off : off + frag_len])
    for k in range(n_junc):
        s1 = gene_seqs[int(rng.integers(len(gene_seqs)))]
        s2 = gene_seqs[int(rng.integers(len(gene_seqs)))]
        o1 = int(rng.integers(0, len(s1) - frag_len))
        o2 = int(rng.integers(0, len(s2) - frag_len))
        frags.append(s1[o1 : o1 + frag_len // 2] + s2[o2 : o2 + frag_len // 2])
    buf = np.frombuffer("".join(frags).encode(), np.uint8).reshape(n, frag_len)
    b1 = buf[:, :read_len].copy()
    r2 = buf[:, frag_len - read_len :]
    b2 = COMPLEMENT_LUT[r2][:, ::-1].copy()  # raw R2 (RC of fragment tail)
    b2r = COMPLEMENT_LUT[b2][:, ::-1].copy()  # RC(R2) for merging
    q = rng.integers(ord("5"), ord("J"), size=(n, read_len)).astype(np.uint8)
    q2 = rng.integers(ord("5"), ord("J"), size=(n, read_len)).astype(np.uint8)
    lens = np.full(n, read_len, np.int32)
    return b1, q, b2, b2r, q2[:, ::-1].copy(), lens


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--panel-mbp", type=float, default=15.2)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--read-len", type=int, default=150)
    args = ap.parse_args()

    os.environ.setdefault("PYTHONPATH", REPO)
    import jax
    import jax.numpy as jnp

    from genefuserust_tpu.config import KMER
    from genefuserust_tpu.core.sequence import BASE_CODE_LUT
    from genefuserust_tpu.ops.map_read import map_read_batch
    from genefuserust_tpu.ops.merge import merge_batch

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    packed, _ = get_packed(args.panel_mbp)
    keys_tbl = jax.device_put(jnp.asarray(packed.keys_tbl), dev)
    vals_tbl = jax.device_put(jnp.asarray(packed.vals_tbl), dev)
    dupes = jax.device_put(jnp.asarray(packed.dupes), dev)

    B = args.batch
    b1, q1, b2, b2r, q2r, lens = gen_pairs(args.panel_mbp, B, args.read_len)
    lut = jnp.asarray(BASE_CODE_LUT)

    @jax.jit
    def step(b1, q1, l1, b2, b2r, q2r, l2, keys_tbl, vals_tbl, dupes):
        mr = merge_batch(b1, q1, l1, b2r, q2r, l2)
        m_codes = jnp.take(lut, mr.out_seq.astype(jnp.int32), axis=0)
        m_len = jnp.where(mr.merged, mr.out_len, 0)
        res_m = map_read_batch(
            m_codes, m_len, keys_tbl, vals_tbl, dupes, packed.shift, packed.max_dupe
        )
        r1_codes = jnp.take(lut, b1.astype(jnp.int32), axis=0)
        r2_codes = jnp.take(lut, b2.astype(jnp.int32), axis=0)
        res_1 = map_read_batch(
            r1_codes,
            jnp.where(mr.merged, 0, l1),
            keys_tbl,
            vals_tbl,
            dupes,
            packed.shift,
            packed.max_dupe,
        )
        res_2 = map_read_batch(
            r2_codes,
            jnp.where(mr.merged, 0, l2),
            keys_tbl,
            vals_tbl,
            dupes,
            packed.shift,
            packed.max_dupe,
        )
        n_merged = jnp.sum(mr.merged.astype(jnp.int32))
        n_map = jnp.sum(
            (
                (res_m.seg_valid[:, 0] & res_m.seg_valid[:, 1])
                | (res_1.seg_valid[:, 0] & res_1.seg_valid[:, 1])
                | (res_2.seg_valid[:, 0] & res_2.seg_valid[:, 1])
            ).astype(jnp.int32)
        )
        return (
            n_merged,
            n_map,
            res_m.seg_valid.sum(),
            res_1.seg_valid.sum(),
            res_2.seg_valid.sum(),
        )

    da = [
        jax.device_put(jnp.asarray(x), dev)
        for x in (b1, q1, lens, b2, b2r, q2r, lens)
    ] + [keys_tbl, vals_tbl, dupes]
    t0 = time.time()
    out = step(*da)
    jax.block_until_ready(out)
    print(f"# compile+first: {time.time() - t0:.1f}s  "
          f"merged={int(out[0])} mapable={int(out[1])}", file=sys.stderr)

    t0 = time.time()
    for _ in range(args.iters):
        out = step(*da)
    jax.block_until_ready(out)
    dt = time.time() - t0
    pairs_per_sec = B * args.iters / dt
    print(
        f"# steady: {dt:.3f}s for {args.iters}x{B} pairs "
        f"({pairs_per_sec:,.0f} pairs/s)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "pe_pairs_per_sec_per_chip",
                "value": round(pairs_per_sec, 1),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
