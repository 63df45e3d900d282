"""TPU batch engine: merge + map_read on device, assembly on host.

Replaces the reference's producer/consumer thread pipeline
(src/core/pescanner.rs:296-425) with a batched device pipeline:

  host: FASTQ -> padded byte arrays (tokenization, RC of R2)
  device: merge_batch (ops/merge.py)
  host: lane compaction (merged pairs -> 1 lane, unmerged -> R1+R2 lanes)
  device: map_read_batch (ops/map_read.py) over all lanes
  host: segment assembly -> direction check -> make_match + edit-distance
        verification (rare rows) -> match bins
  device: one tiny retry map_read batch for direction-rejected rows (the
        only case the reference retries with the reverse complement —
        pescanner.rs:455-513: misses with <2 segments set mapable=false
        and are NOT retried)

Semantics are identical to the scalar host oracle (cross-checked in
tests/test_engine_equality.py); only the schedule differs.
"""

from __future__ import annotations

import logging
from typing import Iterable, List, Optional, Tuple

import numpy as np

from ..config import KMER, Settings
from ..core.indexer import GenePos, SeqMatch
from ..core.read import SequenceRead
from ..core.sequence import BASE_CODE_LUT, COMPLEMENT_LUT

log = logging.getLogger("genefuse")


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _tokenize_bytes(strings: List[bytes], L: int) -> Tuple[np.ndarray, np.ndarray]:
    arr = np.zeros((len(strings), L), np.uint8)
    lens = np.zeros(len(strings), np.int32)
    for i, s in enumerate(strings):
        n = len(s)
        arr[i, :n] = np.frombuffer(s, np.uint8)
        lens[i] = n
    return arr, lens


class TpuEngine:
    """Batched engine; device selection follows JAX's default backend."""

    def __init__(self, settings: Settings, batch_size: int = 1024):
        self.settings = settings
        self.batch_size = batch_size
        self._prepared_for = None
        self._table = None
        self._dupes = None
        self._packed = None

    # ------------- index upload -------------

    def _prepare(self, mapper) -> None:
        if self._prepared_for is mapper:
            return
        import jax.numpy as jnp

        from ..ops.hashtable import pack_index

        self._packed = pack_index(mapper.indexer)
        self._table = jnp.asarray(self._packed.table)
        self._dupes = jnp.asarray(self._packed.dupes)
        self._prepared_for = mapper
        log.info(
            "device index ready: %d buckets, %.1f MB",
            self._packed.n_buckets,
            self._packed.nbytes / 1e6,
        )

    # ------------- public API -------------

    def scan_pairs(self, mapper, pairs: Iterable) -> None:
        self._prepare(mapper)
        batch: List = []
        for pair in pairs:
            batch.append(pair)
            if len(batch) >= self.batch_size:
                self._process_pair_batch(mapper, batch)
                batch = []
        if batch:
            self._process_pair_batch(mapper, batch)

    def scan_singles(self, mapper, reads: Iterable) -> None:
        self._prepare(mapper)
        batch: List = []
        for r in reads:
            batch.append(r)
            if len(batch) >= self.batch_size:
                self._process_single_batch(mapper, batch)
                batch = []
        if batch:
            self._process_single_batch(mapper, batch)

    # ------------- batch processing -------------

    def _process_pair_batch(self, mapper, pairs: List) -> None:
        import jax.numpy as jnp

        from ..ops.merge import merge_batch

        B = len(pairs)
        Lr = _round_up(
            max(
                KMER,
                max(max(len(p.left.seq), len(p.right.seq)) for p in pairs),
            ),
            32,
        )
        b1, l1 = _tokenize_bytes([p.left.seq.encode("latin-1") for p in pairs], Lr)
        q1, _ = _tokenize_bytes([p.left.quality.encode("latin-1") for p in pairs], Lr)
        # RC(right): complement LUT + per-row reverse of the true read span
        b2r, l2 = _tokenize_bytes(
            [
                COMPLEMENT_LUT[
                    np.frombuffer(p.right.seq.encode("latin-1"), np.uint8)
                ][::-1].tobytes()
                for p in pairs
            ],
            Lr,
        )
        q2r, _ = _tokenize_bytes(
            [p.right.quality.encode("latin-1")[::-1] for p in pairs], Lr
        )

        mr = merge_batch(
            jnp.asarray(b1),
            jnp.asarray(q1),
            jnp.asarray(l1),
            jnp.asarray(b2r),
            jnp.asarray(q2r),
            jnp.asarray(l2),
        )
        merged = np.asarray(mr.merged)
        m_seq = np.asarray(mr.out_seq)
        m_qual = np.asarray(mr.out_qual)
        m_len = np.asarray(mr.out_len)
        m_diff = np.asarray(mr.diff)

        # ---- lane compaction ----
        lane_rows: List[np.ndarray] = []
        lane_lens: List[int] = []
        lane_meta: List[Tuple[int, int]] = []  # (pair_idx, lane: 0=m,1=r1,2=r2)
        midx = np.nonzero(merged)[0]
        uidx = np.nonzero(~merged)[0]
        for i in midx.tolist():
            lane_rows.append(m_seq[i])
            lane_lens.append(int(m_len[i]))
            lane_meta.append((i, 0))
        for i in uidx.tolist():
            lane_rows.append(b1[i])
            lane_lens.append(int(l1[i]))
            lane_meta.append((i, 1))
            lane_rows.append(b2r[i])  # note: raw R2 maps as its own read...
            lane_lens.append(int(l2[i]))
            lane_meta.append((i, 2))
        # R2 must be mapped in ORIGINAL orientation (pescanner.rs:496), not
        # RC; rebuild those rows from the original bytes.
        k = len(midx)
        for j, i in enumerate(uidx.tolist()):
            row = np.zeros(Lr, np.uint8)
            rb = pairs[i].right.seq.encode("latin-1")
            row[: len(rb)] = np.frombuffer(rb, np.uint8)
            lane_rows[k + 2 * j + 1] = row

        self._map_and_assemble(
            mapper, pairs, lane_rows, lane_lens, lane_meta, m_qual, m_diff, m_len
        )

    def _process_single_batch(self, mapper, reads: List) -> None:
        Lr = _round_up(max(KMER, max(len(r.seq) for r in reads)), 32)
        lane_rows = []
        lane_lens = []
        lane_meta = []
        for i, r in enumerate(reads):
            row = np.zeros(Lr, np.uint8)
            rb = r.seq.encode("latin-1")
            row[: len(rb)] = np.frombuffer(rb, np.uint8)
            lane_rows.append(row)
            lane_lens.append(len(rb))
            lane_meta.append((i, 1))
        self._map_and_assemble(
            mapper, [(r,) for r in reads], lane_rows, lane_lens, lane_meta, None, None, None,
            single=True,
        )

    # ------------- map + assemble -------------

    def _run_map(self, mapper, rows: np.ndarray, lens: np.ndarray):
        import jax.numpy as jnp

        from ..ops.map_read import map_read_batch

        codes = BASE_CODE_LUT[rows]
        st = self.settings
        res = map_read_batch(
            jnp.asarray(codes),
            jnp.asarray(lens),
            self._table,
            self._dupes,
            self._packed.shift,
            self._packed.max_dupe,
            st.major_gene_key_requirement,
            st.minor_gene_key_requirement,
            st.mismatch_threshold,
        )
        return (
            np.asarray(res.seg_valid),
            np.asarray(res.seg_start),
            np.asarray(res.seg_end),
            np.asarray(res.seg_contig),
            np.asarray(res.seg_pos),
        )

    def _map_and_assemble(
        self,
        mapper,
        pairs,
        lane_rows,
        lane_lens,
        lane_meta,
        m_qual,
        m_diff,
        m_len,
        single: bool = False,
    ) -> None:
        if not lane_rows:
            return
        Lmap = _round_up(max(KMER, max(lane_lens)), 32)
        rows = np.zeros((len(lane_rows), Lmap), np.uint8)
        for j, r in enumerate(lane_rows):
            n = lane_lens[j]
            rows[j, :n] = r[:n]
        lens = np.asarray(lane_lens, np.int32)
        sv, ss, se, sc, sp = self._run_map(mapper, rows, lens)

        def read_obj(j: int) -> SequenceRead:
            i, lane = lane_meta[j]
            if lane == 0:
                n = lane_lens[j]
                seq = rows[j, :n].tobytes().decode("latin-1")
                qual = m_qual[i, :n].tobytes().decode("latin-1")
                name = f"{pairs[i].left.name} merged_diff_{int(m_diff[i])}"
                return SequenceRead(name, seq, "+", qual)
            if single:
                return pairs[i][0]
            return pairs[i].left if lane == 1 else pairs[i].right

        def originals(i: int) -> List[SequenceRead]:
            if single:
                return [pairs[i][0]]
            return [pairs[i].left, pairs[i].right]

        retry: List[Tuple[int, SequenceRead]] = []  # (meta_idx, rc_read)
        for j in range(len(lane_rows)):
            if not (sv[j, 0] and sv[j, 1]):
                continue  # <2 segments -> not mapable -> no retry
            mapping = [
                SeqMatch(int(ss[j, t]), int(se[j, t]), GenePos(int(sc[j, t]), int(sp[j, t])))
                for t in range(2)
            ]
            if mapper.indexer.in_required_direction(mapping):
                r = read_obj(j)
                m = mapper.make_match(r, mapping)
                i, lane = lane_meta[j]
                m.original_reads = originals(i)
                mapper.add_match(m)
            else:
                retry.append((j, read_obj(j).reverse_complement()))

        if not retry:
            return
        # ---- RC retry (direction-rejected rows only) ----
        Lr2 = _round_up(max(KMER, max(len(r.seq) for _, r in retry)), 32)
        rrows, rlens = _tokenize_bytes(
            [r.seq.encode("latin-1") for _, r in retry], Lr2
        )
        sv, ss, se, sc, sp = self._run_map(mapper, rrows, rlens)
        for k, (j, rc_read) in enumerate(retry):
            if not (sv[k, 0] and sv[k, 1]):
                continue
            mapping = [
                SeqMatch(int(ss[k, t]), int(se[k, t]), GenePos(int(sc[k, t]), int(sp[k, t])))
                for t in range(2)
            ]
            if not mapper.indexer.in_required_direction(mapping):
                continue
            m = mapper.make_match(rc_read, mapping)
            i, lane = lane_meta[j]
            m.original_reads = originals(i)
            if lane != 0:
                # merged-lane RC matches keep reversed=False
                # (faithful: pescanner.rs:465-468 vs :487-490)
                m.reversed = True
            mapper.add_match(m)
