"""Synthetic data generation: genomes, panels, and planted-fusion reads.

Used by the end-to-end tests and bench.py. The reference validates e2e
behavior manually against hg19/hg38 (SURVEY §4); those references are not
available here, so we synthesize deterministic genomes with planted fusion
junctions whose expected detections are known by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np

from ..core.read import SequenceRead, SequenceReadPair
from ..core.sequence import reverse_complement

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_seq(rng: np.random.Generator, n: int) -> str:
    return rng.choice(_BASES, size=n).tobytes().decode()


@dataclasses.dataclass
class SyntheticPanel:
    contigs: Dict[str, str]
    csv_text: str
    # per gene: (name, chrom, start, end)
    genes: List[Tuple[str, str, int, int]]


def make_panel(
    seed: int = 7,
    chrom_len: int = 30000,
    n_genes: int = 2,
    gene_len: int = 10000,
) -> SyntheticPanel:
    """Two-chromosome genome with one forward gene per chromosome, each with
    evenly spaced exons (exon 500bp / intron 500bp)."""
    rng = np.random.default_rng(seed)
    contigs = {}
    genes = []
    lines = []
    # Poly-A decoy: real genomes contain abundant poly-A runs, which give the
    # quirky Matcher's 1-base query keys (0..3) more than skip_threshold=50
    # index positions so they are skipped (matcher.rs:397,426-429). Without
    # this, tiny random genomes drive the reference binary into its
    # inverted-membership panic (matcher.rs:486-491) — see core/matcher.py.
    decoy = ("A" * 16 + "T" + "A" * 16 + "C" + "A" * 16 + "G") * 60
    for gi in range(n_genes):
        chrom = f"chr{gi + 1}"
        seq = random_seq(rng, chrom_len)
        if gi == 0:
            pos = chrom_len - len(decoy) - 100
            seq = seq[:pos] + decoy + seq[pos + len(decoy) :]
        contigs[chrom] = seq
        start = 5000
        end = start + gene_len
        name = f"GENE{gi + 1}"
        genes.append((name, chrom, start, end))
        lines.append(f">{name},{chrom}:{start}-{end}")
        eid = 1
        pos = start
        while pos + 500 <= end:
            lines.append(f"{eid},{pos},{pos + 500}")
            eid += 1
            pos += 1000
    return SyntheticPanel(contigs, "\n".join(lines) + "\n", genes)


def plant_fusion_pairs(
    panel: SyntheticPanel,
    n_support: int = 6,
    n_background: int = 50,
    read_len: int = 150,
    seed: int = 13,
) -> List[SequenceReadPair]:
    """Paired-end reads: `n_support` spanning a junction between GENE1 and
    GENE2 (left break at gene1-relative 5000, right at gene2-relative 6000),
    plus background pairs sampled from the genome."""
    rng = np.random.default_rng(seed)
    g1_name, g1_chr, g1_start, _ = panel.genes[0]
    g2_name, g2_chr, g2_start, _ = panel.genes[1]
    left_break = g1_start + 5000  # chrom coords; gene-relative 5000
    right_break = g2_start + 6000
    fused = (
        panel.contigs[g1_chr][left_break - 400 : left_break + 1]
        + panel.contigs[g2_chr][right_break : right_break + 400]
    )
    pairs = []
    for k in range(n_support):
        off = 400 - read_len + 25 + 7 * k  # junction near middle of R1
        r1 = fused[off : off + read_len]
        r2_span = fused[off + 40 : off + 40 + read_len]
        name = f"@SYNTH:fusion:{k} 1:N:0:ACGT"
        qual = "I" * read_len
        pairs.append(
            SequenceReadPair(
                SequenceRead(name, r1, "+", qual),
                SequenceRead(name, reverse_complement(r2_span), "+", qual),
            )
        )
    chroms = list(panel.contigs)
    for k in range(n_background):
        chrom = chroms[int(rng.integers(len(chroms)))]
        s = panel.contigs[chrom]
        off = int(rng.integers(0, len(s) - read_len - 60))
        r1 = s[off : off + read_len]
        r2_span = s[off + 40 : off + 40 + read_len]
        name = f"@SYNTH:bg:{k} 1:N:0:ACGT"
        qual = "I" * read_len
        pairs.append(
            SequenceReadPair(
                SequenceRead(name, r1, "+", qual),
                SequenceRead(name, reverse_complement(r2_span), "+", qual),
            )
        )
    return pairs


def write_panel_files(panel: SyntheticPanel, tmpdir: str) -> Tuple[str, str]:
    """-> (fasta_path, csv_path)"""
    import os

    fasta_path = os.path.join(tmpdir, "ref.fa")
    with open(fasta_path, "w") as f:
        for name, seq in panel.contigs.items():
            f.write(f">{name}\n")
            for i in range(0, len(seq), 80):
                f.write(seq[i : i + 80] + "\n")
    csv_path = os.path.join(tmpdir, "panel.csv")
    with open(csv_path, "w") as f:
        f.write(panel.csv_text)
    return fasta_path, csv_path


def write_fastq_files(pairs: List[SequenceReadPair], tmpdir: str) -> Tuple[str, str]:
    import os

    r1 = os.path.join(tmpdir, "R1.fq")
    r2 = os.path.join(tmpdir, "R2.fq")
    with open(r1, "w") as f1, open(r2, "w") as f2:
        for p in pairs:
            f1.write(f"{p.left.name}\n{p.left.seq}\n+\n{p.left.quality}\n")
            f2.write(f"{p.right.name}\n{p.right.seq}\n+\n{p.right.quality}\n")
    return r1, r2
