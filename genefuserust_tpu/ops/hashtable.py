"""Device k-mer hash table: host-built (vectorized numpy), immutable.

The reference's mutable HashMap + 512MB exact-membership bitmap
(src/core/indexer.rs:74-76,243-250) becomes a 2-choice bucketed hash table
in HBM: each k-mer lives in bucket h1 or (on overflow) h2, each bucket has
8 slots; a lookup is two contiguous row gathers (8 slots x 3 int32 = 96B).
A table miss is exactly a "bloom miss" (the reference bitmap is an exact
bijection over 32-bit k-mers, so the structures are semantically identical).

Slot layout (int32 x 3): [key, contig, pos]
  contig >= 0 : regular entry, (contig, pos) is the GenePos
  contig = -1 : dupe entry, pos = row index into the dupe table
  contig = -2 : high-level dupe (skipped in both passes)
  contig = -3 : empty slot
Dupe table (int32 [n_dupe_rows, D, 2]): rows padded with contig -3.
"""

from __future__ import annotations

import dataclasses

import numpy as np

EMPTY = -3
DUPE = -1
HIGH = -2

SLOTS = 8

_H1_MUL = np.uint32(0x9E3779B1)
_H2_MUL = np.uint32(0x85EBCA6B)
_H2_ADD = np.uint32(0xC2B2AE35)


def h1_np(kmers: np.ndarray, shift: int) -> np.ndarray:
    return ((kmers.astype(np.uint32) * _H1_MUL) >> np.uint32(shift)).astype(np.int64)


def h2_np(kmers: np.ndarray, shift: int) -> np.ndarray:
    k = kmers.astype(np.uint32)
    return (((k ^ (k >> np.uint32(15))) * _H2_MUL + _H2_ADD) >> np.uint32(shift)).astype(
        np.int64
    )


@dataclasses.dataclass
class PackedIndex:
    table: np.ndarray  # (n_buckets, SLOTS, 3) int32
    dupes: np.ndarray  # (n_dupe_rows, D, 2) int32
    n_buckets: int
    shift: int  # 32 - log2(n_buckets)
    max_dupe: int  # D

    @property
    def nbytes(self) -> int:
        return self.table.nbytes + self.dupes.nbytes


def pack_index(indexer) -> PackedIndex:
    """Build the device table from a host core.indexer.Indexer."""
    n_reg, n_dup, n_high = (
        len(indexer.kmer_gp),
        len(indexer.kmer_dupe),
        len(indexer.kmer_high),
    )
    keys = np.empty(n_reg + n_dup + n_high, np.uint32)
    contigs = np.empty(len(keys), np.int32)
    poss = np.empty(len(keys), np.int32)
    keys[:n_reg] = np.fromiter(indexer.kmer_gp.keys(), np.uint32, n_reg)
    contigs[:n_reg] = np.fromiter(
        (v[0] for v in indexer.kmer_gp.values()), np.int32, n_reg
    )
    poss[:n_reg] = np.fromiter(
        (v[1] for v in indexer.kmer_gp.values()), np.int32, n_reg
    )
    keys[n_reg : n_reg + n_dup] = np.fromiter(indexer.kmer_dupe.keys(), np.uint32, n_dup)
    contigs[n_reg : n_reg + n_dup] = DUPE
    poss[n_reg : n_reg + n_dup] = np.arange(n_dup, dtype=np.int32)
    keys[n_reg + n_dup :] = np.fromiter(indexer.kmer_high, np.uint32, n_high)
    contigs[n_reg + n_dup :] = HIGH
    poss[n_reg + n_dup :] = 0

    max_dupe = max((len(v) for v in indexer.kmer_dupe.values()), default=1)
    dupes = np.full((max(1, n_dup), max_dupe, 2), EMPTY, np.int32)
    dupes[:, :, 1] = 0
    for row, sites in enumerate(indexer.kmer_dupe.values()):
        m = len(sites)
        dupes[row, :m, 0] = [s[0] for s in sites]
        dupes[row, :m, 1] = [s[1] for s in sites]

    nb = 16
    while nb * 4 < max(len(keys), 1):
        nb *= 2
    while True:
        shift = 32 - int(round(np.log2(nb)))
        table = _build(keys, contigs, poss, nb, shift)
        if table is not None:
            return PackedIndex(table, dupes, nb, shift, max_dupe)
        nb *= 2


def _place(order, buckets, fill, nb):
    """Given candidate bucket per key (and current fills), compute slot for
    keys in `order`; returns (slots, placed_mask) — vectorized rank-within-
    bucket via sort."""
    srt = np.argsort(buckets[order], kind="stable")
    ob = order[srt]
    bs = buckets[ob]
    # rank within equal-bucket runs
    first = np.concatenate([[True], bs[1:] != bs[:-1]])
    idx = np.arange(len(bs))
    run_start = np.maximum.accumulate(np.where(first, idx, -1))
    rank = idx - run_start
    slots = fill[bs] + rank
    ok = slots < SLOTS
    return ob, bs, slots, ok


def _build(keys, contigs, poss, nb, shift):
    table = np.zeros((nb, SLOTS, 3), np.int32)
    table[:, :, 1] = EMPTY
    fill = np.zeros(nb, np.int64)
    pending = np.arange(len(keys))
    for hf in (h1_np, h2_np):
        if len(pending) == 0:
            break
        buckets = hf(keys, shift)
        ob, bs, slots, ok = _place(pending, buckets, fill, nb)
        put = ob[ok]
        pb, ps = bs[ok], slots[ok]
        table[pb, ps, 0] = keys[put].astype(np.int32)
        table[pb, ps, 1] = contigs[put]
        table[pb, ps, 2] = poss[put]
        np.add.at(fill, pb, 1)
        pending = ob[~ok]
    if len(pending):
        return None
    return table


def lookup_np(packed: PackedIndex, kmers: np.ndarray):
    """Numpy lookup (test oracle for the device path): (contig, pos),
    contig==EMPTY on miss. Keys are unique, so at most one slot matches."""
    ki = kmers.astype(np.uint32).astype(np.int32)
    out_c = np.full(kmers.shape, EMPTY, np.int32)
    out_p = np.zeros(kmers.shape, np.int32)
    for hf in (h1_np, h2_np):
        rows = packed.table[hf(kmers, packed.shift)]  # (..., SLOTS, 3)
        match = (rows[..., 0] == ki[..., None]) & (rows[..., 1] != EMPTY)
        any_m = match.any(-1)
        slot = match.argmax(-1)
        sel = np.take_along_axis(rows, slot[..., None, None], axis=-2)[..., 0, :]
        upd = any_m & (out_c == EMPTY)
        out_c = np.where(upd, sel[..., 1], out_c)
        out_p = np.where(upd, sel[..., 2], out_p)
    return out_c, out_p
