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
    with np.errstate(over="ignore"):
        return ((kmers.astype(np.uint32) * _H1_MUL) >> np.uint32(shift)).astype(
            np.int64
        )


def h2_np(kmers: np.ndarray, shift: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        k = kmers.astype(np.uint32)
        return (
            ((k ^ (k >> np.uint32(15))) * _H2_MUL + _H2_ADD) >> np.uint32(shift)
        ).astype(np.int64)


@dataclasses.dataclass
class PackedIndex:
    table: np.ndarray  # (n_buckets, SLOTS, 3) int32 (combined; build form)
    dupes: np.ndarray  # (n_dupe_rows, D, 2) int32
    n_buckets: int
    shift: int  # 32 - log2(n_buckets)
    max_dupe: int  # D
    # device lookup form: keys separated from values so the hot probe only
    # gathers 4-byte keys; empty slots hold a key value NOT present in the
    # panel (false "found" then resolves to an EMPTY value -> no candidates)
    keys_tbl: np.ndarray = None  # (n_buckets, SLOTS) int32
    vals_tbl: np.ndarray = None  # (n_buckets*SLOTS, 2) int32
    empty_key: int = 0

    def __post_init__(self):
        if self.keys_tbl is None:
            empty = self.table[:, :, 1] == EMPTY
            keys = self.table[:, :, 0].copy()
            sentinel = _absent_key(self.table[:, :, 0][~empty])
            keys[empty] = np.int32(sentinel - (1 << 32) if sentinel >= 1 << 31 else sentinel)
            self.keys_tbl = keys
            vals = self.table[:, :, 1:].reshape(-1, 2).copy()
            self.empty_key = sentinel
            self.vals_tbl = vals

    @property
    def nbytes(self) -> int:
        return self.keys_tbl.nbytes + self.vals_tbl.nbytes + self.dupes.nbytes


def _absent_key(present: np.ndarray) -> int:
    """Smallest uint32 not present in `present` (as u32 values)."""
    u = np.unique(present.astype(np.int64) & 0xFFFFFFFF)
    gaps = np.nonzero(u != np.arange(len(u)))[0]
    return int(gaps[0]) if len(gaps) else len(u)


def pack_index(indexer) -> PackedIndex:
    """Build the device table from a host core.indexer.Indexer (fully
    vectorized over the indexer's grouped-array representation)."""
    thr = indexer.settings.skip_key_dup_threshold
    counts = indexer.group_count
    starts = indexer.group_start
    uk = indexer.uniq_keys
    se_c = indexer.se_contig
    se_p = indexer.se_pos

    is_reg = counts == 1
    is_dup = (counts > 1) & (counts <= thr)
    is_high = counts > thr

    reg_i = np.nonzero(is_reg)[0]
    dup_i = np.nonzero(is_dup)[0]
    high_i = np.nonzero(is_high)[0]
    n_reg, n_dup, n_high = len(reg_i), len(dup_i), len(high_i)

    keys = np.concatenate([uk[reg_i], uk[dup_i], uk[high_i]]).astype(np.uint32)
    contigs = np.concatenate(
        [
            se_c[starts[reg_i]],
            np.full(n_dup, DUPE, np.int32),
            np.full(n_high, HIGH, np.int32),
        ]
    )
    poss = np.concatenate(
        [
            se_p[starts[reg_i]],
            np.arange(n_dup, dtype=np.int32),
            np.zeros(n_high, np.int32),
        ]
    )

    max_dupe = int(counts[dup_i].max()) if n_dup else 1
    dupes = np.full((max(1, n_dup), max_dupe, 2), EMPTY, np.int32)
    dupes[:, :, 1] = 0
    if n_dup:
        d_off = np.arange(max_dupe)[None, :]
        src = starts[dup_i][:, None] + d_off  # (n_dup, D)
        valid = d_off < counts[dup_i][:, None]
        src_c = np.clip(src, 0, len(se_c) - 1)
        dupes[:, :, 0] = np.where(valid, se_c[src_c], EMPTY).astype(np.int32)
        dupes[:, :, 1] = np.where(valid, se_p[src_c], 0).astype(np.int32)

    from .. import native

    nb = 16
    while nb * 2 < max(len(keys), 1):
        nb *= 2
    while True:
        shift = 32 - int(round(np.log2(nb)))
        table = native.pack_table(keys, contigs, poss, nb, shift, SLOTS, EMPTY)
        if table is None:
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


def _build(keys, contigs, poss, nb, shift, rounds: int = 8):
    """Iterative balanced 2-choice placement: each round sends pending keys
    to the currently-emptier of their two buckets; repeated rounds converge
    at load factors well above what single-pass overflow tolerates."""
    table = np.zeros((nb, SLOTS, 3), np.int32)
    table[:, :, 1] = EMPTY
    fill = np.zeros(nb, np.int64)
    pending = np.arange(len(keys))
    b1_all = h1_np(keys, shift)
    b2_all = h2_np(keys, shift)
    for r in range(rounds):
        if len(pending) == 0:
            break
        b1 = b1_all[pending]
        b2 = b2_all[pending]
        # alternate preference on ties/rounds to break livelock
        if r % 2 == 0:
            choose = np.where(fill[b1] <= fill[b2], b1, b2)
        else:
            choose = np.where(fill[b2] <= fill[b1], b2, b1)
        buckets = np.empty(len(keys), np.int64)
        buckets[pending] = choose
        ob, bs, slots, ok = _place(pending, buckets, fill, nb)
        put = ob[ok]
        pb, ps = bs[ok], slots[ok]
        table[pb, ps, 0] = keys[put].astype(np.int32)
        table[pb, ps, 1] = contigs[put]
        table[pb, ps, 2] = poss[put]
        np.add.at(fill, pb, 1)
        pending = ob[~ok]
    if len(pending):
        # tiny residue with both buckets full: cuckoo eviction random walk
        if len(pending) > 4096:
            return None
        for i in pending.tolist():
            if not _cuckoo_insert(
                table, fill, int(keys[i]), int(contigs[i]), int(poss[i]), shift
            ):
                return None
    return table


def _alt_bucket(key: int, bucket: int, shift: int) -> int:
    k = np.uint32(key)
    b1 = int(h1_np(k, shift))
    b2 = int(h2_np(k, shift))
    return b2 if bucket == b1 else b1


def _key_i32(key: int) -> int:
    """u32 key value -> int32 bit pattern (table storage form)."""
    return key - (1 << 32) if key >= (1 << 31) else key


def _cuckoo_insert(table, fill, key, contig, pos, shift, max_kicks: int = 500):
    rng = np.random.default_rng(np.uint32(key))
    cur = (key & 0xFFFFFFFF, contig, pos)
    bucket = int(h1_np(np.uint32(key), shift))
    for _ in range(max_kicks):
        for b in (bucket, _alt_bucket(cur[0], bucket, shift)):
            if fill[b] < SLOTS:
                table[b, int(fill[b])] = (_key_i32(cur[0]), cur[1], cur[2])
                fill[b] += 1
                return True
        # evict a random occupant of `bucket` and take its slot
        s = int(rng.integers(SLOTS))
        victim = tuple(int(v) for v in table[bucket, s])
        table[bucket, s] = (_key_i32(cur[0]), cur[1], cur[2])
        cur = (victim[0] & 0xFFFFFFFF, victim[1], victim[2])
        bucket = _alt_bucket(cur[0], bucket, shift)
    return False


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
