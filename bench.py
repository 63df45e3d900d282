"""Benchmark: paired-end scan throughput on one chip, true engine path.

Workload: a cancer-panel-scale synthetic index (the real cancer.csv gene/
exon structure remapped onto synthetic contigs — 136 genes, 15.1 Mbp, same
per-gene spans) and realistic targeted-capture read pairs (150bp, 70%
on-target single-gene, ~30% off-target, 0.1% fusion-junction).

Measures TpuEngine.scan_pair_block end-to-end per batch: device fast_merge,
host lane compaction, device two-phase map_read (vote gate -> compacted
mask/segments), host assembly of matches. Prints ONE JSON line.

Baseline derivation (BASELINE.md row 5: reference binary, hg19 +
testdata/cancer.csv, 18.41 s on 8 cores): the reference's bench fastqs are
the OpenGene GeneFuse demo pair (~1.34M read pairs); 1.34e6/18.41 s ≈
72.8k pairs/s on a Ryzen 5800X. vs_baseline = our pairs/s / 72,800.

All heavy artifacts (panel fasta/csv, built index, packed tables) are
cached under .bench_cache/ after the first run.
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

# Always-on compile/cache accounting (VERDICT r4 items 1+7): every XLA
# compile and persistent-cache hit in the process is captured here and
# summarized into the bench JSON, so cold-start cost is attributable on
# the driver record (compile vs first-execution program load vs scan).
COMPILE_LOG = {"compiles": [], "hits": 0, "block_cache": "n/a"}


def install_compile_capture():
    import logging

    class _Cap(logging.Handler):
        def emit(self, rec):
            try:
                m = rec.getMessage()
            except Exception:
                return
            if "Finished XLA compilation of" in m:
                mt = re.search(
                    r"Finished XLA compilation of (\S+?)[) ].* in ([0-9.]+) sec", m
                )
                if mt:
                    COMPILE_LOG["compiles"].append(
                        (mt.group(1).replace("jit(", ""), float(mt.group(2)))
                    )
            elif "compilation cache hit" in m:
                COMPILE_LOG["hits"] += 1

    h = _Cap()
    h.setLevel(logging.DEBUG)
    for name in ("jax._src.dispatch", "jax._src.compiler"):
        lg = logging.getLogger(name)
        lg.setLevel(logging.DEBUG)
        lg.addHandler(h)
        if not os.environ.get("GENEFUSE_BENCH_DEBUG_COMPILES"):
            lg.propagate = False


def provenance(args=None):
    """Config/environment fields for the bench record: cross-round deltas
    (drift vs config vs regression) are not attributable without these
    (VERDICT r4 weak #6)."""
    import subprocess

    try:
        rev = subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        rev = ""
    jc = os.path.join(CACHE, "jaxcache")
    try:
        n_jc = len(os.listdir(jc))
    except OSError:
        n_jc = 0
    p = {
        "git_rev": rev,
        "host_cores": os.cpu_count(),
        "parallel_compile": os.environ.get("GENEFUSE_PARALLEL_COMPILE", "4"),
        "jaxcache_entries_before": n_jc,
        "block_cache": COMPILE_LOG["block_cache"],
    }
    if args is not None:
        p["layout"] = args.layout
        p["kv_load"] = args.kv_load
    return p


def compile_summary(warmup_s=None):
    cs = COMPILE_LOG["compiles"]
    out = {
        "programs_compiled": len(cs),
        "compile_s": round(sum(t for _, t in cs), 1),
        "cache_hits": COMPILE_LOG["hits"],
        # list only the substantive programs (tiny probe/setup dispatches
        # like broadcast_in_dim clutter the record; their time is in
        # compile_s regardless)
        "programs": sorted({n for n, t in cs if t >= 1.0}),
    }
    if warmup_s is not None:
        # residual = first-execution program loads + the warmup scan itself
        out["load_exec_s"] = round(max(0.0, warmup_s - out["compile_s"]), 1)
    return out


def measure_upload_mbps():
    """~64 MB H2D probe: the tunnel's effective upload bandwidth swings
    >100x between sessions; recording it makes slow-warmup runs
    attributable to the link rather than the engine."""
    import jax.numpy as jnp

    x = np.random.default_rng(0).integers(
        0, 2**31, size=16_000_000, dtype=np.int32
    )
    t0 = time.time()
    jnp.asarray(x).block_until_ready()
    return round(64.0 / max(time.time() - t0, 1e-3), 1)


def measure_exec_rtt_ms():
    """Median round trip of a tiny content-varied dispatch: the tunnel's
    EXECUTION latency drifts independently of upload bandwidth (measured
    2026-08-21: 590 MB/s upload while executions ran ~2x slower than the
    same morning), so the bench record needs both."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: (x * 3 + 1).sum())
    ts = []
    for salt in range(6):
        x = jnp.full((128, 128), salt, jnp.int32)  # content-varied: the
        t0 = time.time()  # tunnel memoizes same-content executions
        f(x).block_until_ready()
        ts.append(time.time() - t0)
    return round(float(np.median(ts[1:])) * 1e3, 1)


def panel_files(panel_mbp: float, seed: int = 1):
    """Write (once) and return paths of the synthetic panel ref.fa/panel.csv."""
    from genefuserust_tpu.utils.synthetic import random_seq

    os.makedirs(CACHE, exist_ok=True)
    fa = os.path.join(CACHE, f"ref_{panel_mbp:g}.fa")
    csv = os.path.join(CACHE, f"panel_{panel_mbp:g}.csv")
    if os.path.exists(fa) and os.path.exists(csv):
        return fa, csv
    rng = np.random.default_rng(seed)
    genes = []
    for line in open("/root/reference/testdata/cancer.csv"):
        if line.startswith(">"):
            m = re.match(r">(\S+?),(\S+?):(\d+)-(\d+)", line.strip())
            genes.append((m.group(1), int(m.group(4)) - int(m.group(3))))
    total = 0
    with open(fa, "w") as ffa, open(csv, "w") as fcsv:
        for i, (name, span) in enumerate(genes):
            if total / 1e6 >= panel_mbp:
                break
            cn = f"c{i:03d}"
            seq = random_seq(rng, span + 100)
            ffa.write(f">{cn}\n")
            for j in range(0, len(seq), 80):
                ffa.write(seq[j : j + 80] + "\n")
            fcsv.write(f">{name},{cn}:50-{50 + span}\n")
            step = max(1000, span // 20)
            eid = 1
            pos = 60
            while pos + 300 < span and eid <= 40:
                fcsv.write(f"{eid},{50 + pos},{50 + pos + 300}\n")
                eid += 1
                pos += step
            total += span
    return fa, csv


def get_mapper(panel_mbp: float):
    from genefuserust_tpu.config import Settings
    from genefuserust_tpu.core.mapper import FusionMapper
    from genefuserust_tpu.io import fasta

    fa, csv = panel_files(panel_mbp)
    contigs = fasta.read_all(fa, force_upper_case=False)
    return FusionMapper(
        contigs, csv, Settings(), index_cache_dir=CACHE, ref_file=fa
    )


# per-layout (cache-suffix, the load the bare suffix was cached at, the
# load used when --kv-load is not given). Load semantics are the packer's
# native target_load: keys/(buckets*slots) for kv8/kv4, keys/bucket for
# the single-probe layouts.
_LAYOUTS = {
    # v8/v6 cache-suffix bump: round-5 shape bucketing (pow4 nb grid,
    # dupe-row floor, pow2 pos_bias) changed the packed layouts
    "kv8": ("v5kv", 0.7, 0.9),
    "kv4": ("v7kv4", 0.6, 0.6),
    "kv2": ("v8kv2", 0.5, 0.5),
    "kvs": ("v6kvs", 1.0, 1.0),
    "kv16": ("v6kv16", 4.0, 4.0),
}


def get_packed(mapper, panel_mbp: float, layout: str = "kv8",
               kv_load: float = None):
    """Device table (PackedIndexKV 2-gather rows by default; kv4 narrow
    rows / kvs / kv16 single-probe layouts for --layout / --ab runs),
    mmap-cached. `kv_load` tunes the table's load factor (smaller table =
    faster gathers; None = the layout's default)."""
    import functools

    from genefuserust_tpu.ops.hashtable import (
        PackedIndexKV, PackedIndexKV16, PackedIndexKVS,
        pack_index_kv, pack_index_kv16, pack_index_kvs,
    )

    cls, fn = {
        "kv16": (PackedIndexKV16, pack_index_kv16),
        "kvs": (PackedIndexKVS, pack_index_kvs),
        "kv8": (PackedIndexKV, pack_index_kv),
        "kv4": (PackedIndexKV, functools.partial(pack_index_kv, slots=2)),
        "kv2": (PackedIndexKV, functools.partial(pack_index_kv, slots=1)),
    }[layout]
    base_suffix, cache_default, layout_default = _LAYOUTS[layout]
    load = kv_load if kv_load is not None else layout_default
    suffix = base_suffix if load == cache_default else f"{base_suffix}_l{load:g}"
    builder = functools.partial(fn, target_load=load)
    base = os.path.join(CACHE, f"packed_{panel_mbp:g}_{suffix}")
    if os.path.exists(base + "_meta.npy"):
        meta = np.load(base + "_meta.npy")
        return cls(
            np.load(base + "_kv.npy", mmap_mode="r"),
            np.load(base + "_dupes.npy", mmap_mode="r"),
            int(meta[0]), int(meta[1]), int(meta[2]),
            int(meta[3]), int(meta[4]), int(meta[5]),
        )
    t0 = time.time()
    packed = builder(mapper.indexer)
    assert packed is not None, "bench panel must fit the KV payload budget"
    print(
        f"# pack: {time.time() - t0:.1f}s, {packed.nbytes / 1e6:.0f} MB",
        file=sys.stderr,
    )
    np.save(base + "_kv.npy", packed.kv_tbl)
    np.save(base + "_dupes.npy", packed.dupes)
    np.save(
        base + "_meta.npy",
        np.array(
            [
                packed.n_buckets,
                packed.shift,
                packed.cbits,
                packed.pos_bias,
                packed.max_dupe,
                packed.empty_key,
            ],
            np.int64,
        ),
    )
    return packed


class _BenchBlock:
    """ReadBlock-shaped adapter over prebuilt matrices."""

    def __init__(self, seq, qual, lens, tag):
        self.seq = seq
        self.qual = qual
        self.lens = lens
        self.tag = tag

    def __len__(self):
        return len(self.lens)

    def name(self, i):
        return f"@bench:{self.tag}:{i}"

    def read_obj(self, i):
        from genefuserust_tpu.core.read import SequenceRead

        n = self.lens[i]
        return SequenceRead(
            self.name(i),
            self.seq[i, :n].tobytes().decode("latin-1"),
            "+",
            self.qual[i, :n].tobytes().decode("latin-1"),
        )


class _BenchPairBlock:
    def __init__(self, left, right):
        self.left = left
        self.right = right

    def __len__(self):
        return min(len(self.left), len(self.right))


def gen_block_cached(mapper, panel_mbp: float, n: int, read_len: int,
                     profile: str, seed: int = 2):
    """mmap-cached gen_block: workload synthesis costs ~28 s per process
    at 524k pairs — pure fixed cost on the driver record. Arrays are
    cached per (panel, n, read_len, profile, seed) and memory-mapped."""
    base = os.path.join(
        CACHE, f"block_{panel_mbp:g}_{n}_{read_len}_{profile}_{seed}_v1"
    )
    names = ("b1", "q1", "l1", "b2", "q2", "l2")
    paths = [f"{base}_{x}.npy" for x in names]
    if all(os.path.exists(p) for p in paths):
        b1, q1, l1, b2, q2, l2 = (np.load(p, mmap_mode="r") for p in paths)
        COMPILE_LOG["block_cache"] = "hit"
        return _BenchPairBlock(
            _BenchBlock(b1, q1, l1, "L"), _BenchBlock(b2, q2, l2, "R")
        )
    blk = gen_block(mapper, n, read_len, seed=seed, profile=profile)
    os.makedirs(CACHE, exist_ok=True)
    for p, a in zip(
        paths,
        (blk.left.seq, blk.left.qual, blk.left.lens,
         blk.right.seq, blk.right.qual, blk.right.lens),
    ):
        np.save(p, a)
    COMPILE_LOG["block_cache"] = "miss"
    return blk


def gen_block(mapper, n: int, read_len: int = 150, seed: int = 2,
              profile: str = "real"):
    """Read-pair workload as matrices.

    Composition in both profiles: 70% on-target single-gene, ~30%
    off-target, 0.1% fusion-junction pairs.

    profile='real' — calibrated to the reference's shipped test reads
    (reference testdata/R1.fq + R2.fq: 151bp reads, merged lengths
    161-178bp, ~5.7% sub-Q20 bases): variable insert sizes N(168,8)
    clipped to [152,200], NextSeq-like quality profile, 0.3%/base
    substitution errors (80% of them low-qual, as base-call errors
    are), 0.05% N bases. This exercises the realistic mix of merge
    outcomes — most pairs merge via the <=2 low-qual-diff tolerance,
    ~15% fail merge (a high-qual error in the overlap) and take the
    two-lane unmerged path — instead of the all-clean all-merge
    round-1 workload (VERDICT r1 weak #7).

    profile='clean' — error-free fixed-length fragments (read_len+40),
    the round-1 workload, kept for perf A/B comparisons.
    """
    from genefuserust_tpu.core.sequence import COMPLEMENT_LUT
    from genefuserust_tpu.utils.synthetic import random_seq

    gene_seqs = [s for s in mapper.indexer.fusion_seq if s]
    rng = np.random.default_rng(seed)
    if profile == "real":
        return _gen_block_real(gene_seqs, n, read_len, rng)
    frag_len = read_len + 40
    frags = []
    n_on = int(n * 0.70)
    n_junc = max(1, int(n * 0.001))
    n_off = n - n_on - n_junc
    offtarget = random_seq(rng, 200000)
    for _ in range(n_on):
        s = gene_seqs[int(rng.integers(len(gene_seqs)))]
        off = int(rng.integers(0, max(1, len(s) - frag_len)))
        frags.append(s[off : off + frag_len])
    for _ in range(n_off):
        off = int(rng.integers(0, len(offtarget) - frag_len))
        frags.append(offtarget[off : off + frag_len])
    for _ in range(n_junc):
        s1 = gene_seqs[int(rng.integers(len(gene_seqs)))]
        s2 = gene_seqs[int(rng.integers(len(gene_seqs)))]
        o1 = int(rng.integers(0, len(s1) - frag_len))
        o2 = int(rng.integers(0, len(s2) - frag_len))
        frags.append(s1[o1 : o1 + frag_len // 2] + s2[o2 : o2 + frag_len // 2])
    order = rng.permutation(n)
    frags = [frags[i] for i in order]
    buf = np.frombuffer("".join(frags).encode(), np.uint8).reshape(n, frag_len)
    b1 = buf[:, :read_len].copy()
    r2span = buf[:, frag_len - read_len :]
    b2 = COMPLEMENT_LUT[r2span][:, ::-1].copy()  # raw R2
    q1 = rng.integers(ord("5"), ord("J"), size=(n, read_len)).astype(np.uint8)
    q2 = rng.integers(ord("5"), ord("J"), size=(n, read_len)).astype(np.uint8)
    lens = np.full(n, read_len, np.int32)
    return _BenchPairBlock(
        _BenchBlock(b1, q1, lens.copy(), "L"), _BenchBlock(b2, q2, lens.copy(), "R")
    )


# 'real'-profile constants (see gen_block docstring for calibration)
_INSERT_MEAN, _INSERT_SD = 168.0, 8.0
_SUB_ERR_RATE = 0.003          # per base per read
_ERR_LOWQ_FRAC = 0.8           # errors that get a low-qual ('/'=Q14) call
_N_RATE = 0.0005               # no-call rate ('N' base, '#' qual)
_QUAL_CHARS = np.frombuffer(b"EA</6", np.uint8)   # Q36 Q32 Q27 Q14 Q21
_QUAL_P = np.array([0.80, 0.10, 0.04, 0.05, 0.01])


def _gen_block_real(gene_seqs, n: int, read_len: int, rng):
    from genefuserust_tpu.core.sequence import COMPLEMENT_LUT
    from genefuserust_tpu.utils.synthetic import random_seq

    ins_lo, ins_hi = read_len + 1, 200
    lens = np.clip(
        np.rint(rng.normal(_INSERT_MEAN, _INSERT_SD, n)), ins_lo, ins_hi
    ).astype(np.int64)
    lmax = int(lens.max())

    n_on = int(n * 0.70)
    n_junc = max(1, int(n * 0.001))
    n_off = n - n_on - n_junc
    offtarget = random_seq(rng, 200000)
    frags = []
    for i in range(n_on):
        L = int(lens[i])
        s = gene_seqs[int(rng.integers(len(gene_seqs)))]
        off = int(rng.integers(0, max(1, len(s) - L)))
        frags.append(s[off : off + L].ljust(lmax, "A"))
    for i in range(n_on, n_on + n_off):
        L = int(lens[i])
        off = int(rng.integers(0, len(offtarget) - L))
        frags.append(offtarget[off : off + L].ljust(lmax, "A"))
    for i in range(n_on + n_off, n):
        L = int(lens[i])
        s1 = gene_seqs[int(rng.integers(len(gene_seqs)))]
        s2 = gene_seqs[int(rng.integers(len(gene_seqs)))]
        o1 = int(rng.integers(0, len(s1) - L))
        o2 = int(rng.integers(0, len(s2) - L))
        frags.append((s1[o1 : o1 + L // 2] + s2[o2 : o2 + L - L // 2]).ljust(lmax, "A"))
    order = rng.permutation(n)
    frags = [frags[i] for i in order]
    lens = lens[order]

    buf = np.frombuffer("".join(frags).encode(), np.uint8).reshape(n, lmax)
    b1 = buf[:, :read_len].copy()
    # R2 = reverse complement of the fragment's last read_len bases
    idx2 = lens[:, None] - read_len + np.arange(read_len)[None, :]
    b2 = COMPLEMENT_LUT[np.take_along_axis(buf, idx2, 1)][:, ::-1].copy()

    base_idx = np.zeros(256, np.uint8)
    base_idx[np.frombuffer(b"ACGT", np.uint8)] = np.arange(4, dtype=np.uint8)
    bases = np.frombuffer(b"ACGT", np.uint8)

    def corrupt(b):
        q = rng.choice(_QUAL_CHARS, p=_QUAL_P, size=b.shape)
        err = rng.random(b.shape) < _SUB_ERR_RATE
        sub = rng.integers(1, 4, b.shape).astype(np.uint8)
        b2_ = np.where(err, bases[(base_idx[b] + sub) % 4], b)
        q = np.where(err & (rng.random(b.shape) < _ERR_LOWQ_FRAC), ord("/"), q)
        nmask = rng.random(b.shape) < _N_RATE
        b2_ = np.where(nmask, ord("N"), b2_)
        q = np.where(nmask, ord("#"), q)
        return np.ascontiguousarray(b2_), np.ascontiguousarray(q.astype(np.uint8))

    b1, q1 = corrupt(b1)
    b2, q2 = corrupt(b2)
    rl = np.full(n, read_len, np.int32)
    return _BenchPairBlock(
        _BenchBlock(b1, q1, rl.copy(), "L"), _BenchBlock(b2, q2, rl.copy(), "R")
    )


def split_panel_csvs(panel_mbp: float, n_csv: int):
    """Split the synthetic panel's genes into n_csv sub-panel CSVs
    (multi-CSV batch-mode workload, reference bench_res.md:79-92)."""
    fa, csv = panel_files(panel_mbp)
    lines = open(csv).read().splitlines(keepends=False)
    genes = []  # list of [header, exon lines...]
    for line in lines:
        if line.startswith(">"):
            genes.append([line])
        elif genes:
            genes[-1].append(line)
    paths = []
    for k in range(n_csv):
        part = genes[k::n_csv]
        p = os.path.join(CACHE, f"panel_{panel_mbp:g}_part{k}of{n_csv}.csv")
        with open(p, "w") as f:
            for g in part:
                f.write("\n".join(g) + "\n")
        paths.append(p)
    return fa, paths


def _multi_csv_mappers(args, n):
    from genefuserust_tpu.config import Settings
    from genefuserust_tpu.core.mapper import FusionMapper
    from genefuserust_tpu.io import fasta

    fa, csv_paths = split_panel_csvs(args.panel_mbp, n)
    contigs = fasta.read_all(fa, force_upper_case=False)
    return [
        FusionMapper(contigs, p, Settings(), True, CACHE, fa) for p in csv_paths
    ]


def run_multi_csv_scale(args):
    """Amortization scaling curve (VERDICT r4 item 5): for N in 2/4/8/16,
    paired single-vs-N-CSV timings in ONE process -> pair-CSV-scans/s and
    speedup-vs-sequential per N. Shows where the shared merge+pack+upload
    amortization saturates. Writes BENCH_MULTICSV_SCALE.json."""
    from genefuserust_tpu.config import Settings
    from genefuserust_tpu.core.scanner import finish_scan
    from genefuserust_tpu.parallel.engine import TpuEngine

    block = gen_block_cached(
        get_mapper(args.panel_mbp), args.panel_mbp, args.pairs, args.read_len,
        args.profile,
    )
    iters = min(args.iters, 3)
    curve = []
    for n in (2, 4, 8, 16):
        t0 = time.time()
        mappers = _multi_csv_mappers(args, n)
        engine = TpuEngine(Settings(), batch_size=args.batch)
        for m in mappers:
            engine._prepare(m)
        setup = time.time() - t0
        t0 = time.time()
        engine.scan_pair_block_multi(mappers, block)
        engine.flush()
        engine.scan_pair_block_multi(mappers[:1], block)
        engine.flush()
        warm = time.time() - t0
        singles, multis = [], []
        for _ in range(iters):
            t0 = time.time()
            engine.scan_pair_block_multi(mappers[:1], block)
            engine.flush()
            singles.append(time.time() - t0)
            t0 = time.time()
            engine.scan_pair_block_multi(mappers, block)
            engine.flush()
            multis.append(time.time() - t0)
        for m in mappers:
            finish_scan(m, "", "", "bench", Settings())
        speedup = float(np.median([n * s / m for s, m in zip(singles, multis)]))
        rate = float(np.median([args.pairs * n / m for m in multis]))
        curve.append(
            {
                "n_csv": n,
                "pair_csv_scans_per_sec": round(rate, 1),
                "speedup_vs_sequential": round(speedup, 2),
                "setup_s": round(setup, 1),
                "warmup_s": round(warm, 1),
                "t_single_s": [round(s, 2) for s in singles],
                "t_multi_s": [round(m, 2) for m in multis],
            }
        )
        print(
            f"# N={n}: {rate:,.0f} pair-csv-scans/s, amortization "
            f"{speedup:.2f}x, warmup {warm:.1f}s",
            file=sys.stderr,
        )
    with open(os.path.join(REPO, "BENCH_MULTICSV_SCALE.json"), "w") as f:
        json.dump(
            {
                "workload": {
                    "panel_mbp": args.panel_mbp,
                    "pairs": args.pairs,
                    "read_len": args.read_len,
                    "profile": args.profile,
                    "iters": iters,
                },
                "curve": curve,
                "warmup": compile_summary(),
                "provenance": provenance(args),
            },
            f,
            indent=1,
        )
    best = max(curve, key=lambda c: c["pair_csv_scans_per_sec"])
    print(
        json.dumps(
            {
                "metric": "pe_multi_csv_scale_best_pair_scans_per_sec",
                "value": best["pair_csv_scans_per_sec"],
                "unit": "pair-csv-scans/s",
                "vs_baseline": round(
                    best["pair_csv_scans_per_sec"] / BASELINE_PAIRS_PER_SEC, 3
                ),
                "curve": [
                    (c["n_csv"], c["pair_csv_scans_per_sec"],
                     c["speedup_vs_sequential"])
                    for c in curve
                ],
            }
        )
    )


def run_multi_csv(args):
    """Multi-CSV batch-mode throughput: one shared device pass (upload +
    merge + per-panel vote/mask pipelines) serves N panel CSVs at once —
    the reference's flagship workload (bench_res.md:79-92: 16 CSVs, hg38,
    its headline 3797% vs GeneFuse_Plus).

    Reports TWO metrics, medians over paired per-iteration timings
    (single-CSV and N-CSV alternate within one process, so tunnel drift
    hits both arms):
      - pe_multi{N}_csv_pair_scans_per_sec: pairs x CSVs / s — the batch
        mode's real unit of work (each pair is scanned against every CSV).
        vs_baseline compares against the 72.8k single-CSV bar, i.e. the
        value a user gets over running N independent single-CSV jobs on
        the reference.
      - pe_multi{N}_csv_speedup_vs_sequential: N*t_single/t_multi — how
        much the shared upload+merge amortization buys over our own
        sequential per-CSV scans.
    Persists both (plus the per-iter record) to BENCH_MULTICSV.json.
    """
    from genefuserust_tpu.config import Settings
    from genefuserust_tpu.core.scanner import finish_scan
    from genefuserust_tpu.parallel.engine import TpuEngine

    n = args.multi_csv
    t0 = time.time()
    mappers = _multi_csv_mappers(args, n)
    print(f"# {n} mappers ready: {time.time() - t0:.1f}s", file=sys.stderr)
    engine = TpuEngine(Settings(), batch_size=args.batch)
    for m in mappers:
        engine._prepare(m)
    print(f"# tables packed+uploaded: {time.time() - t0:.1f}s", file=sys.stderr)
    block = gen_block_cached(
        get_mapper(args.panel_mbp), args.panel_mbp, args.pairs, args.read_len,
        args.profile,
    )

    # warmup (compiles; covers every distinct per-CSV table shape)
    t0 = time.time()
    engine.scan_pair_block_multi(mappers, block)
    engine.flush()
    warmup_s = time.time() - t0
    wsum = compile_summary(warmup_s)
    print(
        f"# warmup: {warmup_s:.1f}s = compile {wsum['compile_s']}s "
        f"({wsum['programs_compiled']} programs, {wsum['cache_hits']} cache "
        f"hits) + load/exec {wsum['load_exec_s']}s", file=sys.stderr,
    )
    engine.scan_pair_block_multi(mappers[:1], block)
    engine.flush()

    singles, multis = [], []
    for _ in range(args.iters):
        t0 = time.time()
        engine.scan_pair_block_multi(mappers[:1], block)
        engine.flush()
        singles.append(time.time() - t0)
        t0 = time.time()
        engine.scan_pair_block_multi(mappers, block)
        engine.flush()
        multis.append(time.time() - t0)
    n_matches = sum(sum(len(b) for b in m.fusion_matches) for m in mappers)
    for m in mappers:
        finish_scan(m, "", "", "bench", Settings())
    speedups = [n * s / m for s, m in zip(singles, multis)]
    rates = [args.pairs * n / m for m in multis]
    speedup = float(np.median(speedups))
    rate = float(np.median(rates))
    print(
        f"# paired iters: single {[f'{s:.2f}' for s in singles]}s; "
        f"{n}-CSV {[f'{m:.2f}' for m in multis]}s; "
        f"speedups {[f'{x:.2f}' for x in speedups]}x; matches={n_matches}",
        file=sys.stderr,
    )
    records = [
        {
            "metric": f"pe_multi{n}_csv_pair_scans_per_sec",
            "value": round(rate, 1),
            "unit": "pair-csv-scans/s",
            "vs_baseline": round(rate / BASELINE_PAIRS_PER_SEC, 3),
        },
        {
            "metric": f"pe_multi{n}_csv_speedup_vs_sequential",
            "value": round(speedup, 2),
            "unit": "x",
            "vs_baseline": round(rate / BASELINE_PAIRS_PER_SEC, 3),
        },
    ]
    with open(os.path.join(REPO, "BENCH_MULTICSV.json"), "w") as f:
        json.dump(
            {
                "workload": {
                    "panel_mbp": args.panel_mbp,
                    "n_csv": n,
                    "pairs": args.pairs,
                    "read_len": args.read_len,
                    "profile": args.profile,
                    "iters": args.iters,
                    "comparison_basis": "pairs*CSVs/s vs the 72.8k pairs/s "
                    "single-CSV reference bar (BASELINE.md row 5)",
                },
                "per_iter": {"t_single_s": singles, "t_multi_s": multis},
                "matches": n_matches,
                "metrics": records,
                "warmup_s": round(warmup_s, 1),
                "warmup": wsum,
                "provenance": provenance(args),
            },
            f,
            indent=1,
        )
    for r in records:
        print(json.dumps(r))


def fastq_files(args, mapper):
    """Write (once) the bench workload as real gzip-free FASTQ files so the
    --from-fastq mode exercises the PRODUCT input path (block FASTQ reader
    -> engine), not prebuilt matrices."""
    base = os.path.join(
        CACHE,
        f"reads_{args.panel_mbp:g}_{args.profile}_{args.pairs}_{args.read_len}",
    )
    r1p, r2p = base + "_R1.fq", base + "_R2.fq"
    if os.path.exists(r1p) and os.path.exists(r2p):
        return r1p, r2p
    block = gen_block_cached(mapper, args.panel_mbp, args.pairs,
                              args.read_len, args.profile)

    def dump(path, b):
        n = len(b)
        names = [b.name(i) for i in range(n)]
        seqs = [
            b.seq[i, : b.lens[i]].tobytes().decode("latin-1") for i in range(n)
        ]
        quals = [
            b.qual[i, : b.lens[i]].tobytes().decode("latin-1") for i in range(n)
        ]
        with open(path, "w") as f:
            f.write(
                "".join(
                    f"{nm}\n{sq}\n+\n{ql}\n"
                    for nm, sq, ql in zip(names, seqs, quals)
                )
            )

    dump(r1p, block.left)
    dump(r2p, block.right)
    return r1p, r2p


def run_from_fastq(args):
    """Product-path throughput: stream the workload from REAL FASTQ files
    through the block reader and engine (closes the 'bench bypasses FASTQ
    parsing' gap: this is what `python -m genefuserust_tpu` does, minus
    argparse)."""
    from genefuserust_tpu.config import Settings
    from genefuserust_tpu.core.scanner import finish_scan
    from genefuserust_tpu.io.fastq_block import (
        coalesce_pair_blocks, stream_pair_blocks,
    )
    from genefuserust_tpu.parallel.engine import TpuEngine

    mapper = get_mapper(args.panel_mbp)
    packed = get_packed(mapper, args.panel_mbp, args.layout, args.kv_load)
    r1p, r2p = fastq_files(args, mapper)
    engine = TpuEngine(Settings(), batch_size=args.batch)
    engine.use_packed(packed, mapper)

    def one_pass():
        t0 = time.time()
        n = 0
        blocks = coalesce_pair_blocks(
            stream_pair_blocks(r1p, r2p), args.batch
        )
        for block in blocks:
            n += len(block)
            engine.scan_pair_block(mapper, block)
        engine.flush(mapper)
        return n, time.time() - t0

    # drift-immune pairing: the tunnel's latency drifts ±40% run to run,
    # so the fastq-vs-cached-pack comparison alternates both arms within
    # one process (same methodology as --ab) and reports the paired ratio
    mem_block = gen_block_cached(mapper, args.panel_mbp, args.pairs,
                                  args.read_len, args.profile)

    def mem_pass():
        t0 = time.time()
        engine.scan_pair_block(mapper, mem_block)
        engine.flush(mapper)
        return args.pairs, time.time() - t0

    n, dt = one_pass()  # warmup: compile + OS page cache
    print(f"# warmup(compile): {dt:.1f}s, {n} pairs", file=sys.stderr)
    mem_pass()
    rates, mem_rates = [], []
    for _ in range(args.iters):
        n, dt = mem_pass()
        mem_rates.append(n / dt)
        n, dt = one_pass()
        rates.append(n / dt)
    import contextlib

    with contextlib.redirect_stdout(sys.stderr):
        # fusion text blocks go to stderr: bench stdout is ONE JSON line
        finish_scan(mapper, "", os.path.join(CACHE, "fastq_bench.json"),
                    "bench", Settings())
    pairs_per_sec = float(np.median(rates))
    mem_pps = float(np.median(mem_rates))
    ratios = [f / m for f, m in zip(rates, mem_rates)]
    ratio = float(np.median(ratios))
    print(
        f"# fastq-path: {[f'{r:,.0f}' for r in rates]} "
        f"(median {pairs_per_sec:,.0f})",
        file=sys.stderr,
    )
    print(
        f"# paired in-memory arm: {[f'{r:,.0f}' for r in mem_rates]} "
        f"(median {mem_pps:,.0f}); fastq/mem per-cycle ratios "
        f"{[f'{r:.2f}' for r in ratios]} (median {ratio:.3f})",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "pe_fastq_path_pairs_per_sec_per_chip",
                "value": round(pairs_per_sec, 1),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
                "paired_mem_pairs_per_sec": round(mem_pps, 1),
                "fastq_over_mem_ratio": round(ratio, 3),
            }
        )
    )


def run_ab(args):
    """Interleaved A/B: the tunnel's latency drifts run to run, so
    cross-process layout comparisons are confounded — this mode keeps every
    candidate table resident and alternates iterations A,B,A,B within one
    process, making the pairing drift-immune. Spec: --ab 'kv8,kv8:0.9,kvs'
    (layout[:kv_load] comma-separated)."""
    from genefuserust_tpu.config import Settings
    from genefuserust_tpu.parallel.engine import TpuEngine

    mapper = get_mapper(args.panel_mbp)
    specs = []
    for s in args.ab.split(","):
        layout, _, load = s.partition(":")
        specs.append((layout, float(load) if load else None))
    block = gen_block_cached(mapper, args.panel_mbp, args.pairs,
                              args.read_len, args.profile)
    engines, names, arm_matches = [], [], []
    for layout, load in specs:
        packed = get_packed(mapper, args.panel_mbp, layout, load)
        eng = TpuEngine(Settings(), batch_size=args.batch)
        eng.use_packed(packed, mapper)
        name = f"{layout}:{load:g}" if load is not None else layout
        m0 = sum(len(b) for b in mapper.fusion_matches)
        t0 = time.time()
        eng.scan_pair_block(mapper, block)
        eng.flush(mapper)
        dm = sum(len(b) for b in mapper.fusion_matches) - m0
        print(
            f"# warmup {name} ({packed.nbytes / 1e6:.0f} MB): "
            f"{time.time() - t0:.1f}s, matches={dm}",
            file=sys.stderr,
        )
        engines.append(eng)
        names.append(name)
        arm_matches.append(dm)
    if len(set(arm_matches)) > 1:
        print(
            f"# WARNING: arms disagree on matches: "
            f"{dict(zip(names, arm_matches))}",
            file=sys.stderr,
        )
    rates = [[] for _ in specs]
    for _ in range(args.iters):
        for i, eng in enumerate(engines):
            t0 = time.time()
            eng.scan_pair_block(mapper, block)
            eng.flush(mapper)
            rates[i].append(args.pairs / (time.time() - t0))
    out = {}
    for name, rs in zip(names, rates):
        print(
            f"# {name}: {[f'{r:,.0f}' for r in rs]} "
            f"(median {np.median(rs):,.0f})",
            file=sys.stderr,
        )
        out[name] = round(float(np.median(rs)), 1)
    best = max(out, key=out.get)
    print(
        json.dumps(
            {
                "metric": "pe_ab_pairs_per_sec_per_chip",
                "value": out[best],
                "unit": "pairs/s",
                "vs_baseline": round(out[best] / BASELINE_PAIRS_PER_SEC, 3),
                "arms": out,
            }
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--panel-mbp", type=float, default=15.2)
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--pairs", type=int, default=None,
                    help="default: 1048576 for the single-scan and "
                    "--from-fastq modes (the reference's own bench jobs "
                    "are 1.34M pairs and short blocks leave the per-block "
                    "flush/fill bubble unamortized — PERF.md round 5); "
                    "524288 for the multi-CSV modes (16x work per iter)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--read-len", type=int, default=None,
                    help="default: 151 (real profile) / 150 (clean)")
    ap.add_argument("--profile", choices=["real", "clean"], default="real",
                    help="read workload: 'real' = error/insert-size model "
                    "calibrated to the reference testdata (default); "
                    "'clean' = round-1 error-free fixed-length workload")
    ap.add_argument("--kv-load", type=float, default=None,
                    help="table target load factor (higher = smaller table "
                    "= cheaper gathers; default = the layout's own)")
    ap.add_argument("--layout", choices=["kv2", "kv4", "kv8", "kvs", "kv16"],
                    default="kv2",
                    help="device table layout: kv2 = 2-gather 2-wide rows "
                    "(default, measured fastest), kv4 = 2-gather 4-wide "
                    "rows, kv8/kvs/kv16 = A/B variants")
    ap.add_argument("--from-fastq", action="store_true",
                    help="stream the workload from real FASTQ files through "
                    "the product block reader instead of prebuilt matrices")
    ap.add_argument("--ab", type=str, default="",
                    help="interleaved A/B over table layouts, e.g. "
                    "'kv8,kv8:0.9,kvs' (drift-immune paired comparison)")
    ap.add_argument(
        "--multi-csv",
        type=int,
        default=0,
        help="N>0: run the N-CSV batch-mode bench instead of the single scan",
    )
    ap.add_argument(
        "--multi-csv-scale",
        action="store_true",
        help="run the N=2/4/8/16 amortization scaling curve "
        "(BENCH_MULTICSV_SCALE.json)",
    )
    args = ap.parse_args()
    if args.read_len is None:
        args.read_len = 151 if args.profile == "real" else 150
    if args.pairs is None:
        args.pairs = (
            524288 if (args.multi_csv or args.multi_csv_scale) else 1048576
        )

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(CACHE, "jaxcache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    try:
        # needed for the always-on compile accounting (install_compile_
        # capture): the per-compile elapsed-time lines carry the data
        jax.config.update("jax_log_compiles", True)
    except Exception:
        pass
    install_compile_capture()
    if os.environ.get("GENEFUSE_BENCH_DEBUG_COMPILES"):
        # Cold-start diagnosis mode: log every XLA compile (with elapsed
        # time) and every persistent-cache hit/miss so the warmup cost can
        # be attributed (VERDICT r3 weak #3: 261.5s warmup, unexplained).
        import logging as _logging

        _h = _logging.StreamHandler(sys.stderr)
        _h.setFormatter(_logging.Formatter("# jaxlog %(name)s: %(message)s"))
        for name in ("jax._src.dispatch", "jax._src.compiler",
                     "jax._src.compilation_cache", "jax._src.interpreters.pxla"):
            lg = _logging.getLogger(name)
            lg.setLevel(_logging.DEBUG)
            lg.addHandler(_h)
        try:
            jax.config.update("jax_explain_cache_misses", True)
        except Exception:
            pass

    # Device-availability watchdog: when the axon tunnel is wedged,
    # jax.devices() hangs indefinitely (round-2/3 outages). Fail fast with
    # a parseable diagnostic line instead of eating the driver's timeout.
    import threading

    init_done = threading.Event()
    init_timeout = float(os.environ.get("GENEFUSE_BENCH_INIT_TIMEOUT", 600))

    def _watchdog():
        if not init_done.wait(init_timeout):
            print(
                f"# FATAL: TPU backend init exceeded {init_timeout:.0f}s "
                "(device unavailable / tunnel wedged)",
                file=sys.stderr,
                flush=True,
            )
            print(
                json.dumps(
                    {
                        "metric": "pe_pairs_per_sec_per_chip",
                        "value": 0,
                        "unit": "pairs/s",
                        "vs_baseline": 0,
                        "error": "device unavailable: backend init timeout",
                    }
                ),
                flush=True,
            )
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    proc_t0 = time.time()
    jax.devices()  # blocks here if the device is wedged
    init_done.set()
    init_s = time.time() - proc_t0

    import jax.numpy as jnp

    from genefuserust_tpu.config import Settings
    from genefuserust_tpu.parallel.engine import TpuEngine

    if args.multi_csv_scale:
        run_multi_csv_scale(args)
        return
    if args.multi_csv > 0:
        run_multi_csv(args)
        return
    if args.ab:
        run_ab(args)
        return
    if args.from_fastq:
        run_from_fastq(args)
        return

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)
    upload_mbps = measure_upload_mbps()
    exec_rtt_ms = measure_exec_rtt_ms()
    print(
        f"# link: upload {upload_mbps} MB/s, exec rtt {exec_rtt_ms} ms",
        file=sys.stderr,
    )

    t0 = time.time()
    mapper = get_mapper(args.panel_mbp)
    packed = get_packed(mapper, args.panel_mbp, args.layout, args.kv_load)
    block = gen_block_cached(
        mapper, args.panel_mbp, args.pairs, args.read_len, args.profile
    )
    setup_s = time.time() - t0
    print(f"# mapper+index+block ready: {setup_s:.1f}s", file=sys.stderr)

    engine = TpuEngine(Settings(), batch_size=args.batch)
    engine.use_packed(packed, mapper)

    # warmup: scan the WHOLE block once so every per-batch shape variant
    # (lane pads, width buckets, exception pads) is compiled/loaded before
    # the timed iterations — a fresh process pays executable reload per
    # variant otherwise, polluting the first iteration
    t0 = time.time()
    engine.scan_pair_block(mapper, block)
    engine.flush(mapper)
    warmup_s = time.time() - t0
    wsum = compile_summary(warmup_s)
    print(
        f"# warmup: {warmup_s:.1f}s = compile {wsum['compile_s']}s "
        f"({wsum['programs_compiled']} programs, {wsum['cache_hits']} cache "
        f"hits) + load/exec {wsum['load_exec_s']}s", file=sys.stderr,
    )

    n_matches0 = sum(len(b) for b in mapper.fusion_matches)
    # per-iteration timing, report the median: the dev-tunnel round-trip
    # latency varies ±40% run to run (environment noise, not engine perf)
    rates = []
    for _ in range(args.iters):
        t0 = time.time()
        engine.scan_pair_block(mapper, block)
        engine.flush(mapper)
        rates.append(args.pairs / (time.time() - t0))
    n_matches = sum(len(b) for b in mapper.fusion_matches) - n_matches0
    pairs_per_sec = float(np.median(rates))
    print(
        f"# steady: {args.iters}x{args.pairs} pairs, per-iter "
        f"{[f'{r:,.0f}' for r in rates]} pairs/s "
        f"(median {pairs_per_sec:,.0f}), matches={n_matches}",
        file=sys.stderr,
    )
    wall_s = time.time() - proc_t0
    print(
        f"# wall: total {wall_s:.1f}s = init {init_s:.1f}s + setup "
        f"{setup_s:.1f}s + warmup {warmup_s:.1f}s + timed iters "
        f"{wall_s - init_s - setup_s - warmup_s:.1f}s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "pe_pairs_per_sec_per_chip",
                "value": round(pairs_per_sec, 1),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
                "pairs_per_iter": args.pairs,
                "wall_s": round(wall_s, 1),
                "init_s": round(init_s, 1),
                "setup_s": round(setup_s, 1),
                "warmup_s": round(warmup_s, 1),
                "warmup": wsum,
                "upload_mbps": upload_mbps,
                "exec_rtt_ms": exec_rtt_ms,
                "provenance": provenance(args),
            }
        )
    )


if __name__ == "__main__":
    main()
