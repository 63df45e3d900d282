"""On-disk panel index cache.

The reference rebuilds the k-mer index on every run (indexer.rs:122); this
cache (SURVEY §5 "checkpoint/resume" improvement) persists the built index
keyed by (reference identity, fusion CSV content, dup-threshold setting).
Reference identity uses (path, size, mtime) — the standard staleness proxy.
Pure optimization: cached and fresh builds are bit-identical.
"""

from __future__ import annotations

import hashlib
import logging
import os
from typing import Optional

import numpy as np

log = logging.getLogger("genefuse")


def _key(ref_file: str, fusion_file: str, dup_threshold: int) -> str:
    h = hashlib.sha256()
    st = os.stat(ref_file)
    h.update(f"{os.path.abspath(ref_file)}|{st.st_size}|{st.st_mtime_ns}".encode())
    with open(fusion_file, "rb") as f:
        h.update(f.read())
    h.update(str(dup_threshold).encode())
    return h.hexdigest()[:24]


def load(cache_dir: str, ref_file: str, fusion_file: str, indexer) -> bool:
    """Populate `indexer` from cache; True on hit."""
    try:
        path = os.path.join(
            cache_dir,
            f"index_{_key(ref_file, fusion_file, indexer.settings.skip_key_dup_threshold)}.npz",
        )
        if not os.path.exists(path):
            return False
        z = np.load(path, allow_pickle=True)
        indexer.se_kmer = z["se_kmer"]
        indexer.se_contig = z["se_contig"]
        indexer.se_pos = z["se_pos"]
        indexer.uniq_keys = z["uniq_keys"]
        indexer.group_start = z["group_start"]
        indexer.group_count = z["group_count"]
        indexer.fusion_seq = list(z["fusion_seq"])
        indexer.unique_pos = int(z["unique_pos"])
        indexer.dupe_pos = int(z["dupe_pos"])
        log.info("index cache hit: %s", path)
        return True
    except Exception as e:
        log.warning("index cache load failed (%s); rebuilding", e)
        return False


def save(cache_dir: str, ref_file: str, fusion_file: str, indexer) -> None:
    try:
        os.makedirs(cache_dir, exist_ok=True)
        path = os.path.join(
            cache_dir,
            f"index_{_key(ref_file, fusion_file, indexer.settings.skip_key_dup_threshold)}.npz",
        )
        np.savez(
            path,
            se_kmer=indexer.se_kmer,
            se_contig=indexer.se_contig,
            se_pos=indexer.se_pos,
            uniq_keys=indexer.uniq_keys,
            group_start=indexer.group_start,
            group_count=indexer.group_count,
            fusion_seq=np.array(indexer.fusion_seq, dtype=object),
            unique_pos=indexer.unique_pos,
            dupe_pos=indexer.dupe_pos,
        )
        log.info("index cached: %s", path)
    except Exception as e:  # cache failures must never fail the run
        log.warning("index cache save failed: %s", e)
