"""Phase breakdown of Indexer.make_index at genome scale.

Round-3 follow-up to the hugepage fix (commit 2a26268): SCALE.md's 1171s
at 256 Mbp was mostly THP page-fault time; post-fix 64 Mbp measured ~74s.
This script attributes the remainder: Python string slicing/upper/RC,
encode, native rolling entries, concat, native record radix sort, grouping.

Usage: python tools/profiling/profile_make_index.py [mbp_total] [n_genes]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import genefuserust_tpu  # noqa: F401  (hugepage fix on import)
from genefuserust_tpu import native
from genefuserust_tpu.core.sequence import encode_bases, reverse_complement
from genefuserust_tpu.utils.synthetic import random_seq


def main():
    mbp = float(sys.argv[1]) if len(sys.argv) > 1 else 64.0
    n_genes = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    gene_len = int(mbp * 1e6 / n_genes)
    rng = np.random.default_rng(11)
    print(f"panel: {n_genes} genes x {gene_len/1e6:.1f} Mbp = {mbp:.0f} Mbp")

    t0 = time.time()
    chroms = [random_seq(rng, gene_len + 200) for _ in range(n_genes)]
    print(f"[gen]      {time.time()-t0:7.2f}s")

    T = dict(slice=0.0, rc=0.0, encode=0.0, roll=0.0)
    all_entries = []
    for ctg, chrom in enumerate(chroms):
        t = time.time()
        s = chrom[100 : 100 + gene_len].upper()
        T["slice"] += time.time() - t
        t = time.time()
        rc = reverse_complement(s)
        T["rc"] += time.time() - t
        for seq, start in ((s, 0), (rc, 1 - len(s))):
            t = time.time()
            codes = encode_bases(seq)
            T["encode"] += time.time() - t
            t = time.time()
            nat = native.rolling_entries(codes, ctg, start, exclude_last=True)
            T["roll"] += time.time() - t
            all_entries.append(nat)
    for k, v in T.items():
        print(f"[{k:8s}] {v:7.2f}s")

    t = time.time()
    kmers_all = np.concatenate([e[0] for e in all_entries])
    ctg_all = np.concatenate([e[1] for e in all_entries])
    pos_all = np.concatenate([e[2] for e in all_entries])
    del all_entries
    print(f"[concat]   {time.time()-t:7.2f}s  n={len(kmers_all):,}")

    t = time.time()
    k_s, c_s, p_s = native.sort_entries_by_kmer(kmers_all, ctg_all, pos_all)
    print(f"[sort]     {time.time()-t:7.2f}s")

    t = time.time()
    n = len(k_s)
    first = np.empty(n, bool)
    first[0] = True
    np.not_equal(k_s[1:], k_s[:-1], out=first[1:])
    starts = np.nonzero(first)[0]
    counts = np.empty(len(starts), np.int64)
    if len(starts) > 1:
        np.subtract(starts[1:], starts[:-1], out=counts[:-1])
    counts[-1] = n - starts[-1]
    print(f"[group]    {time.time()-t:7.2f}s  uniq={len(starts):,}")


if __name__ == "__main__":
    main()
