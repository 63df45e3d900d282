"""TPU batch engine: merge + map_read on device, assembly on host.

Replaces the reference's producer/consumer thread pipeline
(src/core/pescanner.rs:296-425) with a batched device pipeline:

  host: FASTQ -> padded byte matrices (block reader) -> packed
        4-bit-seq/2-bit-qual-class upload (ops/pack.py)
  device stage 0: merge-on-codes (merged reads stay device-resident)
  device stage 1: vote pass over COMPACTED lanes (merged pairs never pay
        the R1/R2 lanes and vice versa)
  device stage 2: one combined mask/segment pass over the vote survivors
  host  stage 3: segment assembly -> direction check -> make_match +
        batched edit-distance verification -> match bins; a tiny retry
        batch for direction-rejected rows (the only case the reference
        retries with the reverse complement — pescanner.rs:455-513)
  Stages of successive batches are interleaved (4-deep) so every fetch
  overlaps younger batches' device work.

Multi-CSV mode (reference: fusion_scan.rs:62-188 outer rayon pool): the
engine scans ONE read batch against MANY panels at once —
`scan_pair_block_multi` packs/uploads/merges each batch a single time
(stage 0 is panel-independent) and fans out stages 1-3 per panel, so the
per-batch upload and merge cost is amortized across all CSVs and the
device pipeline stays busy while older panels' matches are assembled on
the host.

Semantics are identical to the scalar host oracle (cross-checked in
tests/test_engine_equality.py); only the schedule differs.
"""

from __future__ import annotations

import logging
from typing import Callable, Iterable, List, Optional, Tuple

import numpy as np

from ..config import KMER, Settings
from ..core.indexer import GenePos, SeqMatch
from ..core.read import SequenceRead
from ..core.sequence import BASE_CODE_LUT

log = logging.getLogger("genefuse")


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class _Fetch:
    """Background device->host fetch: starts a transfer thread at kernel
    issue time so stage advancement consumes an already-landed numpy array
    — critical when dispatch round trips are slow (remote/tunneled
    devices), harmless otherwise. PJRT transfers are thread-safe."""

    __slots__ = ("_arr", "_out", "_thread")

    def __init__(self, arr):
        import threading

        self._arr = arr
        self._out = None
        if arr is None:
            self._thread = None
            return
        try:
            arr.copy_to_host_async()  # hint where supported
        except Exception:
            pass
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        self._out = np.asarray(self._arr)

    def get(self):
        if self._thread is None:
            return None
        self._thread.join()
        return self._out


def _tokenize_bytes(strings: List[bytes], L: int) -> Tuple[np.ndarray, np.ndarray]:
    arr = np.zeros((len(strings), L), np.uint8)
    lens = np.zeros(len(strings), np.int32)
    for i, s in enumerate(strings):
        n = len(s)
        arr[i, :n] = np.frombuffer(s, np.uint8)
        lens[i] = n
    return arr, lens


class TpuEngine:
    """Batched engine; device selection follows JAX's default backend.

    Multi-chip: pass a 1-D `jax.sharding.Mesh` (axis name "data") and the
    engine shards every read batch over it while replicating the index
    tables — the TPU-native replacement for the reference's consumer
    thread pool (pescanner.rs:296-311). The kernels are batch-parallel, so
    jit's auto-SPMD partitioning runs them collective-free per shard; host
    compaction/assembly sees gathered summaries exactly as in the
    single-device flow, keeping results byte-identical (checked in
    tests/test_mesh_engine.py)."""

    def __init__(self, settings: Settings, batch_size: int = 65536, mesh=None,
                 pipeline_depth: int = 4):
        self.settings = settings
        self.batch_size = batch_size
        self.mesh = mesh
        # in-flight batch bound (the `-t` analog; see driver.make_engine)
        self.pipeline_depth = max(1, pipeline_depth)
        self._n_dev = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
        self._batch_sharding = None
        self._repl_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            self._batch_sharding = NamedSharding(mesh, P(axis))
            self._repl_sharding = NamedSharding(mesh, P())
        self._prepared_for = None
        self._default_entry = None
        self._tables = {}  # id(mapper) -> table entry dict
        self._progress_t0 = None
        self._progress_n = 0
        self._queue = []
        self._producer = None  # single-worker pack/upload/dispatch thread

    def _submit_producer(self, fn, *args):
        from concurrent.futures import ThreadPoolExecutor

        if self._producer is None:
            self._producer = ThreadPoolExecutor(max_workers=1)
        return self._producer.submit(fn, *args)

    def _put_batch(self, x):
        """Upload a batch-dim array (sharded over the mesh if present)."""
        import jax
        import jax.numpy as jnp

        if self._batch_sharding is None:
            return jnp.asarray(x)
        return jax.device_put(np.asarray(x), self._batch_sharding)

    def _put_repl(self, x):
        import jax
        import jax.numpy as jnp

        if self._repl_sharding is None:
            return jnp.asarray(x)
        return jax.device_put(np.asarray(x), self._repl_sharding)

    # ------------- index upload -------------

    def _entry_from_packed(self, packed) -> dict:
        """Upload a PackedIndex / PackedIndexKV; tables are replicated
        across the mesh (they are small vs HBM)."""
        if hasattr(packed, "kv_tbl"):
            keys = self._put_repl(packed.kv_tbl)
            vals = self._put_repl(np.zeros((1, 2), np.int32))  # unused
            statics = dict(
                shift=packed.shift, max_dupe=packed.max_dupe, kv=True,
                cbits=packed.cbits, pos_bias=packed.pos_bias,
            )
        else:
            keys = self._put_repl(packed.keys_tbl)
            vals = self._put_repl(packed.vals_tbl)
            statics = dict(
                shift=packed.shift, max_dupe=packed.max_dupe, kv=False,
                cbits=0, pos_bias=0,
            )
        return dict(
            packed=packed,
            keys=keys,
            vals=vals,
            dupes=self._put_repl(packed.dupes),
            statics=statics,
        )

    def use_packed(self, packed) -> None:
        """Install a pre-built device index for the next-prepared mapper."""
        self._default_entry = self._entry_from_packed(packed)

    def _table_entry(self, mapper) -> dict:
        key = id(mapper)
        e = self._tables.get(key)
        if e is not None:
            return e
        if self._default_entry is not None and self._prepared_for is mapper:
            self._tables[key] = self._default_entry
            return self._default_entry
        from ..ops.hashtable import pack_index, pack_index_kv

        packed = pack_index_kv(mapper.indexer)
        if packed is None:  # panel exceeds the KV payload bit budget
            packed = pack_index(mapper.indexer)
        e = self._entry_from_packed(packed)
        self._tables[key] = e
        log.info(
            "device index ready: %d buckets, %.1f MB%s",
            packed.n_buckets,
            packed.nbytes / 1e6,
            " (kv rows)" if hasattr(packed, "kv_tbl") else "",
        )
        return e

    def _prepare(self, mapper) -> None:
        self._table_entry(mapper)

    def _pad_rows(self, n: int) -> int:
        """Compacted-kernel row padding: next power of two, refined down in
        quarter-pow2 steps (..., 3/4·2^k, 2^k). At most two compiled shape
        variants per octave, but up to 25% less dead gather work — which
        matters once realistic merge-failure rates split a batch across the
        merged and unmerged-lane kernels. Keeps at least one row per mesh
        device (quarter steps stay n_dev-divisible for pow2 meshes)."""
        floor = max(8, self._n_dev)
        pb = floor
        while pb < n:
            pb *= 2
        step = pb // 4
        if step >= floor:
            while pb - step >= n:
                pb -= step
        return pb

    def _progress(self, n: int) -> None:
        """Scan progress: unknown-length 8Hz spinner with reads/s on a TTY
        (reference progress bars: src/aux/pbar.rs), throughput log lines
        otherwise."""
        import time

        from ..utils.pbar import prepare_pbar

        if self._progress_t0 is None:
            self._progress_t0 = time.time()
            self._pbar = prepare_pbar(0)
            self._pbar.set_message("scanning reads...")
        self._progress_n += n
        self._pbar.inc(n)
        dt = time.time() - self._progress_t0
        if (
            self._pbar.is_hidden()
            and dt > 0
            and self._progress_n % (self.batch_size * 8) < n
        ):
            log.info(
                "scanned %d reads (%.0f reads/s)", self._progress_n,
                self._progress_n / dt,
            )

    # ------------- public API: object streams -------------

    def scan_pairs(self, mapper, pairs: Iterable) -> None:
        self._prepare(mapper)
        batch: List = []
        for pair in pairs:
            batch.append(pair)
            if len(batch) >= self.batch_size:
                self._pairs_from_objects(mapper, batch)
                batch = []
        if batch:
            self._pairs_from_objects(mapper, batch)

    def scan_singles(self, mapper, reads: Iterable) -> None:
        self._prepare(mapper)
        batch: List = []
        for r in reads:
            batch.append(r)
            if len(batch) >= self.batch_size:
                self._singles_from_objects(mapper, batch)
                batch = []
        if batch:
            self._singles_from_objects(mapper, batch)

    # ------------- public API: block matrices -------------

    def scan_pair_block(self, mapper, block) -> None:
        """block: io.fastq_block.PairBlock."""
        self.scan_pair_block_multi([mapper], block)

    def scan_pair_block_multi(self, mappers: List, block) -> None:
        """Scan one pair block against MANY panels: per batch, one
        pack/upload/merge (panel-independent) fans out into per-panel
        pass1/pass2/assembly contexts (fusion_scan.rs:62-188 analog)."""
        for m in mappers:
            self._prepare(m)
        n = len(block)
        lb, rb = block.left, block.right
        for s in range(0, n, self.batch_size):
            e = min(n, s + self.batch_size)
            sl = slice(s, e)
            self._scan_pair_matrices(
                mappers,
                lb.seq[sl],
                lb.qual[sl],
                lb.lens[sl],
                rb.seq[sl],
                rb.qual[sl],
                rb.lens[sl],
                lambda i, s=s: (
                    block.left.read_obj(s + i),
                    block.right.read_obj(s + i),
                ),
            )

    def scan_single_block(self, mapper, rblock) -> None:
        self._prepare(mapper)
        n = len(rblock)
        for s in range(0, n, self.batch_size):
            e = min(n, s + self.batch_size)
            sl = slice(s, e)
            self._scan_single_matrices(
                mapper,
                rblock.seq[sl],
                rblock.lens[sl],
                lambda i, s=s: rblock.read_obj(s + i),
            )

    # ------------- object adapters -------------

    def _pairs_from_objects(self, mapper, pairs: List) -> None:
        Lr = _round_up(
            max(KMER, max(max(len(p.left.seq), len(p.right.seq)) for p in pairs)), 32
        )
        b1, l1 = _tokenize_bytes([p.left.seq.encode("latin-1") for p in pairs], Lr)
        q1, _ = _tokenize_bytes([p.left.quality.encode("latin-1") for p in pairs], Lr)
        b2, l2 = _tokenize_bytes([p.right.seq.encode("latin-1") for p in pairs], Lr)
        q2, _ = _tokenize_bytes([p.right.quality.encode("latin-1") for p in pairs], Lr)
        self._scan_pair_matrices(
            [mapper],
            b1,
            q1,
            l1,
            b2,
            q2,
            l2,
            lambda i: (pairs[i].left, pairs[i].right),
        )

    def _singles_from_objects(self, mapper, reads: List) -> None:
        Lr = _round_up(max(KMER, max(len(r.seq) for r in reads)), 32)
        rows, lens = _tokenize_bytes([r.seq.encode("latin-1") for r in reads], Lr)
        self._scan_single_matrices(mapper, rows, lens, lambda i: reads[i])

    # ------------- core batch processing -------------

    def _scan_pair_matrices(
        self, mappers: List, b1, q1, l1, b2, q2, l2, pair_obj: Callable
    ) -> None:
        """Staged pipeline: merge -> compacted pass1 (merged lane + R1/R2
        lanes separately; merged pairs never pay the R lanes) -> combined
        pass2 -> assembly. Stages of successive batches are interleaved so
        fetches overlap younger batches' device work; engine.flush drains."""
        shared = dict(
            fut=self._submit_producer(
                self._st0_issue_merge, b1, q1, l1, b2, q2, l2
            ),
            mappers=list(mappers),
            pair_obj=pair_obj,
            orig_B=b1.shape[0],
            fetched=False,
            merged_read_cache={},
        )
        for j, m in enumerate(mappers):
            self._queue.append(
                dict(
                    stage=0,
                    mapper=m,
                    tbl=self._table_entry(m),
                    shared=shared,
                    count_progress=(j == len(mappers) - 1),
                )
            )
        # advance older batches one stage each (oldest first)
        n_new = len(mappers)
        for c in list(self._queue[:-n_new]):
            self._advance(c)
        while self._queue and self._queue[0]["stage"] >= 3:
            self._queue.pop(0)
        depth = self.pipeline_depth * max(1, n_new)
        while len(self._queue) > depth:
            c = self._queue.pop(0)
            while c["stage"] < 3:
                self._advance(c)

    def flush(self, mapper=None) -> None:
        while self._queue:
            c = self._queue.pop(0)
            while c["stage"] < 3:
                self._advance(c)

    # ---- stage 0: pack, upload, issue merge (panel-independent) ----

    def _st0_issue_merge(self, b1, q1, l1, b2, q2, l2):
        """Pack + upload + merge dispatch. Runs on the producer thread
        (device-independent of older batches; JAX dispatch is
        thread-safe). Exotic rows are packed as-is — their 'other' codes
        can produce no candidates — and routed to the scalar oracle by
        _fetch_merge on the main thread."""
        from .. import native
        from ..ops.fused import fused_merge_chunked

        l1 = np.asarray(l1, np.int32).copy()
        l2 = np.asarray(l2, np.int32).copy()
        B = b1.shape[0]
        # R1/R2 blocks may have different widths (independently parsed
        # files); all kernels slice the packed buffer with offsets from ONE
        # width, so pad both sides to a common L (floor 32 also guards the
        # MIN_OVERLAP/KMER loops against all-short batches)
        L = _round_up(max(32, b1.shape[1], b2.shape[1]), 32)
        # pad rows to a power of two: bounds compiled shape variants
        padB = 16
        while padB < B:
            padB *= 2
        chunk = max(1, min(2048, padB // self._n_dev))

        if b1.shape[1] != b2.shape[1]:
            Lin = max(b1.shape[1], b2.shape[1])

            def padw_in(a):
                if a.shape[1] == Lin:
                    return a
                out = np.zeros((a.shape[0], Lin), a.dtype)
                out[:, : a.shape[1]] = a
                return out

            b1, q1, b2, q2 = padw_in(b1), padw_in(q1), padw_in(b2), padw_in(q2)
        nat = native.pack_pe_batch(b1, q1, b2, q2, l1, l2, L, padB)
        if nat is not None:
            buf, exotic = nat
        else:  # numpy fallback (byte-identical; see native.py)
            from ..ops.pack import (
                SEQ4_LUT, has_exotic, pack_q2, pack_seq4, qual_class,
            )

            exotic = has_exotic(b1, l1) | has_exotic(b2, l2)

            def padw(a):
                if a.shape[1] == L:
                    return a
                out = np.zeros((a.shape[0], L), a.dtype)
                out[:, : a.shape[1]] = a
                return out

            pb1, pq1, pb2, pq2 = padw(b1), padw(q1), padw(b2), padw(q2)
            if padB != B:
                padrows = padB - B

                def padm(a):
                    return np.concatenate(
                        [a, np.zeros((padrows,) + a.shape[1:], a.dtype)], axis=0
                    )

                pb1, pq1, pb2, pq2 = padm(pb1), padm(pq1), padm(pb2), padm(pq2)
            buf = np.concatenate(
                [
                    pack_seq4(SEQ4_LUT[pb1]),
                    pack_q2(qual_class(pq1)),
                    pack_seq4(SEQ4_LUT[pb2]),
                    pack_q2(qual_class(pq2)),
                ],
                axis=1,
            )
        if padB != B:
            l1 = np.concatenate([l1, np.zeros(padB - B, np.int32)])
            l2 = np.concatenate([l2, np.zeros(padB - B, np.int32)])
        lens2 = np.stack([l1, l2], axis=1).astype(np.int32)
        buf_d = self._put_batch(buf)
        msum_d, m_codes_d = fused_merge_chunked(
            buf_d, self._put_batch(lens2), L, chunk
        )
        return dict(
            msum_f=_Fetch(msum_d),
            m_codes_d=m_codes_d,
            buf_d=buf_d,
            l1=l1,
            l2=l2,
            exotic=exotic,
            L=L,
        )

    def _advance(self, c) -> None:
        if c["stage"] == 0:
            self._st1_issue_pass1(c)
        elif c["stage"] == 1:
            self._st2_issue_pass2(c)
        elif c["stage"] == 2:
            self._st3_assemble(c)

    def _fetch_merge(self, sh: dict) -> None:
        """Join the producer thread, fetch the merge summary, route exotic
        rows to the scalar oracle, and derive the (panel-independent)
        compaction work arrays — once per physical batch."""
        if sh["fetched"]:
            return
        sh.update(sh.pop("fut").result())
        # reads with bytes outside ACGTNacgtn go through the scalar oracle
        # (here, on the main thread, so match-bin append order stays
        # deterministic; the sort before clustering removes any remaining
        # order dependence)
        exotic = sh["exotic"]
        if exotic.any():
            from ..core.read import SequenceReadPair
            from ..core.scanner import scan_one_pair

            pair_obj = sh["pair_obj"]
            ex_rows = np.nonzero(exotic)[0]
            for i in ex_rows.tolist():
                lr = pair_obj(int(i))
                for m in sh["mappers"]:
                    scan_one_pair(m, SequenceReadPair(lr[0], lr[1]))
            # l1/l2 are padded to padB; index (not bool-mask) the B rows
            sh["l1"][ex_rows] = 0
            sh["l2"][ex_rows] = 0
        M = sh["msum_f"].get()  # transfer overlapped since stage 0
        n_ex = len(exotic)
        merged = M[:, 0].astype(bool)
        merged[:n_ex] &= ~exotic
        sh["m_diff"] = M[:, 1]
        sh["m_len"] = M[:, 2]
        sh["merged"] = merged
        rows_m = np.nonzero(merged)[0]
        # unmerged pairs with at least one live read map both lanes (a dead
        # lane is len-0 and gated on device); padded/exotic rows have both 0
        uidx = np.nonzero(~merged & ((sh["l1"] > 0) | (sh["l2"] > 0)))[0]
        sh["rows_m"] = rows_m
        sh["uidx"] = uidx
        if len(rows_m):
            pb = self._pad_rows(len(rows_m))
            mi = np.zeros(pb, np.int32)
            ml = np.zeros(pb, np.int32)
            mi[: len(rows_m)] = rows_m
            ml[: len(rows_m)] = sh["m_len"][rows_m]
            # length bucketing: trim the scan width to the batch's max
            # merged length, rounded up to bound compiled-shape variants
            sh["m_width"] = _round_up(max(KMER, int(ml.max())), 32)
            sh["mi_d"] = self._put_repl(mi)
            sh["ml_d"] = self._put_repl(ml)
        if len(uidx):
            n_r = 2 * len(uidx)
            pb = self._pad_rows(n_r)
            rwork = np.zeros((pb, 3), np.int32)
            rwork[: len(uidx), 0] = uidx
            rwork[: len(uidx), 1] = 1
            rwork[: len(uidx), 2] = sh["l1"][uidx]
            rwork[len(uidx) : n_r, 0] = uidx
            rwork[len(uidx) : n_r, 1] = 2
            rwork[len(uidx) : n_r, 2] = sh["l2"][uidx]
            sh["rwork"] = rwork
            sh["n_r"] = n_r
            sh["rwork_d"] = self._put_repl(rwork)
        sh["fetched"] = True

    # ---- stage 1: fetch merge summary, issue compacted pass1 ----

    def _st1_issue_pass1(self, c) -> None:
        from ..ops.fused import pass1_rows_merged, pass1_rows_packed

        st = self.settings
        sh = c["shared"]
        self._fetch_merge(sh)
        tbl = c["tbl"]
        c["pm_d"] = None
        c["pr_d"] = None
        common = (tbl["keys"], tbl["vals"], tbl["dupes"])
        if len(sh["rows_m"]):
            c["pm_d"] = pass1_rows_merged(
                sh["m_codes_d"],
                sh["mi_d"],
                sh["ml_d"],
                *common,
                L2=2 * sh["L"],
                major_req=st.major_gene_key_requirement,
                minor_req=st.minor_gene_key_requirement,
                width=sh["m_width"],
                **tbl["statics"],
            )
        if len(sh["uidx"]):
            c["pr_d"] = pass1_rows_packed(
                sh["buf_d"],
                sh["rwork_d"],
                *common,
                L=sh["L"],
                major_req=st.major_gene_key_requirement,
                minor_req=st.minor_gene_key_requirement,
                **tbl["statics"],
            )
        c["pm_f"] = _Fetch(c["pm_d"])
        c["pr_f"] = _Fetch(c["pr_d"])
        c["stage"] = 1

    # ---- stage 2: fetch pass1, issue combined pass2 for survivors ----

    def _st2_issue_pass2(self, c) -> None:
        from ..ops.fused import fused_pass2_combined

        st = self.settings
        sh = c["shared"]
        tbl = c["tbl"]
        idx_list = []
        lane_list = []
        lens_list = []
        gps_list = []
        if c["pm_d"] is not None:
            P = c["pm_f"].get()  # (pb, 5)
            k = len(sh["rows_m"])
            ok = P[:k, 0].astype(bool)
            sel = np.nonzero(ok)[0]
            idx_list.append(sh["rows_m"][sel])
            lane_list.append(np.zeros(len(sel), np.int32))
            lens_list.append(sh["m_len"][sh["rows_m"][sel]])
            gps_list.append(P[sel, 1:5])
        if c["pr_d"] is not None:
            P = c["pr_f"].get()
            k = sh["n_r"]
            ok = P[:k, 0].astype(bool)
            sel = np.nonzero(ok)[0]
            rw = sh["rwork"]
            idx_list.append(rw[sel, 0])
            lane_list.append(rw[sel, 1])
            lens_list.append(rw[sel, 2])
            gps_list.append(P[sel, 1:5])
        c["out_d"] = None
        if idx_list and sum(len(x) for x in idx_list):
            idx = np.concatenate(idx_list).astype(np.int64)
            lane_arr = np.concatenate(lane_list).astype(np.int32)
            lens_arr = np.concatenate(lens_list).astype(np.int32)
            gps_arr = np.concatenate(gps_list).astype(np.int32)
            n_surv = len(idx)
            pb = self._pad_rows(n_surv)
            work = np.zeros((pb, 7), np.int32)
            work[:n_surv, 0] = idx
            work[:n_surv, 1] = lane_arr
            work[:n_surv, 2] = lens_arr
            work[:n_surv, 3:7] = gps_arr
            c["surv_idx"] = idx
            c["surv_lane"] = lane_arr
            c["n_surv"] = n_surv
            c["out_d"] = fused_pass2_combined(
                sh["m_codes_d"],
                sh["buf_d"],
                self._put_repl(work),
                tbl["keys"],
                tbl["vals"],
                tbl["dupes"],
                L=sh["L"],
                mismatch_thr=st.mismatch_threshold,
                **tbl["statics"],
            )
        c["out_f"] = _Fetch(c["out_d"])
        c["stage"] = 2

    # ---- stage 3: fetch pass2, assemble matches ----

    def _st3_assemble(self, c) -> None:
        from ..core.read import SequenceReadPair
        from .ed_batch import EdBatcher

        mapper = c["mapper"]
        sh = c["shared"]
        pair_obj = sh["pair_obj"]
        merged_read_cache = sh["merged_read_cache"]

        def merged_read(i: int) -> SequenceRead:
            if i not in merged_read_cache:
                lr = pair_obj(i)
                m = SequenceReadPair(lr[0], lr[1]).fast_merge()
                assert m is not None, "device/host merge disagreement"
                merged_read_cache[i] = m
            return merged_read_cache[i]

        def read_for(i: int, lane: int) -> SequenceRead:
            if lane == 0:
                return merged_read(i)
            lr = pair_obj(i)
            return lr[0] if lane == 1 else lr[1]

        ed = EdBatcher()
        retry: List[Tuple[int, int, SequenceRead]] = []
        if c["out_d"] is not None:
            out = c["out_f"].get()  # (pb, 10)
            for k in range(c["n_surv"]):
                if not (out[k, 0] and out[k, 1]):
                    continue
                i = int(c["surv_idx"][k])
                lane = int(c["surv_lane"][k])
                mapping = [
                    SeqMatch(
                        int(out[k, 2 + t]),
                        int(out[k, 4 + t]),
                        GenePos(int(out[k, 6 + t]), int(out[k, 8 + t])),
                    )
                    for t in range(2)
                ]
                if mapper.indexer.in_required_direction(mapping):
                    r = read_for(i, lane)
                    m = mapper.make_match(r, mapping, ed_batcher=ed)
                    m.original_reads = list(pair_obj(i))
                    mapper.add_match(m)
                else:
                    retry.append((i, lane, read_for(i, lane).reverse_complement()))
        if retry:
            self._retry(mapper, c["tbl"], retry, lambda i: list(pair_obj(i)), ed)
        ed.flush()
        if c["count_progress"]:
            self._progress(sh["orig_B"])
        c["stage"] = 3

    def _retry(self, mapper, tbl, retry, originals_fn, ed_batcher=None) -> None:
        """RC retry for direction-rejected reads (tiny batch).
        retry: [(key, lane, rc_read)]; originals_fn(key) -> original reads."""
        Lr2 = _round_up(max(KMER, max(len(r.seq) for _, _, r in retry)), 32)
        rrows, rlens = _tokenize_bytes(
            [r.seq.encode("latin-1") for _, _, r in retry], Lr2
        )
        sv, ss, se, sc, sp = self._run_map(rrows, rlens, tbl)
        for k, (key, lane, rc_read) in enumerate(retry):
            if not (sv[k, 0] and sv[k, 1]):
                continue
            mapping = [
                SeqMatch(
                    int(ss[k, t]), int(se[k, t]), GenePos(int(sc[k, t]), int(sp[k, t]))
                )
                for t in range(2)
            ]
            if not mapper.indexer.in_required_direction(mapping):
                continue
            m = mapper.make_match(rc_read, mapping, ed_batcher=ed_batcher)
            m.original_reads = originals_fn(key)
            if lane != 0:
                # merged-lane RC matches keep reversed=False
                # (faithful: pescanner.rs:465-468 vs :487-490)
                m.reversed = True
            mapper.add_match(m)

    def _scan_single_matrices(self, mapper, rows, lens, read_at: Callable) -> None:
        rows = np.ascontiguousarray(rows)
        L = _round_up(max(32, rows.shape[1]), 32)
        if rows.shape[1] != L:
            out = np.zeros((rows.shape[0], L), rows.dtype)
            out[:, : rows.shape[1]] = rows
            rows = out
        lens = np.asarray(lens, np.int32)
        meta_lane = np.ones(len(lens), np.int8)
        self._assemble(
            mapper,
            rows,
            lens,
            lambda j: read_at(j),
            lambda j: [read_at(j)],
            meta_lane,
        )

    # ------------- map + assemble -------------

    def _run_map(self, rows: np.ndarray, lens: np.ndarray, tbl: dict):
        """Two-phase map: vote gate on every read, mask/segments only on the
        compacted survivors (identical results to the fused kernel)."""
        from ..ops.map_read import map_read_pass1, map_read_pass2

        codes = BASE_CODE_LUT[rows]
        st = self.settings
        n = len(lens)
        ok, h1, l1, h2, l2 = map_read_pass1(
            self._put_batch(codes),
            self._put_batch(lens),
            tbl["keys"],
            tbl["vals"],
            tbl["dupes"],
            major_req=st.major_gene_key_requirement,
            minor_req=st.minor_gene_key_requirement,
            **tbl["statics"],
        )
        ok = np.asarray(ok)
        sv = np.zeros((n, 2), bool)
        ss = np.zeros((n, 2), np.int32)
        se = np.zeros((n, 2), np.int32)
        sc = np.zeros((n, 2), np.int32)
        sp = np.zeros((n, 2), np.int32)
        surv = np.nonzero(ok)[0]
        if len(surv) == 0:
            return sv, ss, se, sc, sp
        h1, l1, h2, l2 = (np.asarray(x) for x in (h1, l1, h2, l2))
        # pad survivor count to a power-of-two bucket to bound jit variants
        pb = self._pad_rows(len(surv))
        idx = np.concatenate([surv, np.zeros(pb - len(surv), np.int64)])
        res = map_read_pass2(
            self._put_batch(codes[idx]),
            self._put_batch(np.where(np.arange(pb) < len(surv), lens[idx], 0)),
            self._put_batch(h1[idx]),
            self._put_batch(l1[idx]),
            self._put_batch(h2[idx]),
            self._put_batch(l2[idx]),
            tbl["keys"],
            tbl["vals"],
            tbl["dupes"],
            mismatch_thr=st.mismatch_threshold,
            **tbl["statics"],
        )
        k = len(surv)
        sv[surv] = np.asarray(res.seg_valid)[:k]
        ss[surv] = np.asarray(res.seg_start)[:k]
        se[surv] = np.asarray(res.seg_end)[:k]
        sc[surv] = np.asarray(res.seg_contig)[:k]
        sp[surv] = np.asarray(res.seg_pos)[:k]
        return sv, ss, se, sc, sp

    def _assemble(
        self, mapper, rows, lens, read_obj: Callable, originals: Callable, meta_lane
    ) -> None:
        if len(lens) == 0:
            return
        from .ed_batch import EdBatcher

        ed = EdBatcher()
        tbl = self._table_entry(mapper)
        sv, ss, se, sc, sp = self._run_map(rows, lens, tbl)
        hits = np.nonzero(sv[:, 0] & sv[:, 1])[0]
        retry: List[Tuple[int, SequenceRead]] = []
        for j in hits.tolist():
            mapping = [
                SeqMatch(
                    int(ss[j, t]), int(se[j, t]), GenePos(int(sc[j, t]), int(sp[j, t]))
                )
                for t in range(2)
            ]
            if mapper.indexer.in_required_direction(mapping):
                r = read_obj(j)
                m = mapper.make_match(r, mapping, ed_batcher=ed)
                m.original_reads = originals(j)
                mapper.add_match(m)
            else:
                retry.append((j, read_obj(j).reverse_complement()))

        if retry:
            self._retry(
                mapper,
                tbl,
                [(j, int(meta_lane[j]), rc) for j, rc in retry],
                lambda j: originals(j),
                ed,
            )
        ed.flush()
