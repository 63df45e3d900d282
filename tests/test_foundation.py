"""Golden tests for the foundation layer, mirroring the reference's unit
tests (SURVEY §4): reverse_complement, fast_merge, edit_distance, fusion CSV
pos2str, FASTA/FASTQ parsing."""

import numpy as np
import pytest

from genefuserust_tpu.core.sequence import (
    dis_connected_count,
    encode_bases,
    reverse_complement,
)
from genefuserust_tpu.core.read import SequenceRead, SequenceReadPair
from genefuserust_tpu.core.edit_distance import edit_distance
from genefuserust_tpu.models.fusion import Fusion
from genefuserust_tpu.io import fasta
from genefuserust_tpu.io.fastq import FastqReader, FastqReaderPair


def test_reverse_complement():
    # reference: src/core/sequence.rs:66-70
    assert reverse_complement("ATGCGGGTT") == "AACCCGCAT"
    assert reverse_complement("CGAANTAG") == "CTANTTCG"


def test_dis_connected_count():
    assert dis_connected_count("AAAA") == 0
    assert dis_connected_count("ATAT") == 3
    assert dis_connected_count("A") == 0


def test_encode_bases():
    codes = encode_bases("ATCGN")
    assert list(codes) == [0, 1, 2, 3, 255]


def test_fast_merge_golden():
    # reference: src/core/read.rs:450-486
    left = SequenceRead(
        "@NS500713:64:HFKJJBGXY:1:11101:20469:1097 1:N:0:TATAGCCT+GGTCCCGA",
        "TTTTTTCTCTTGGACTCTAACACTGTTTTTTCTTATGAAAACACAGGAGTGATGACTAGTTGAGTGCATTCTTATGAGACTCATAGTCATTCTATGATGTAG",
        "+",
        "AAAAA6EEEEEEEEEEEEEEEEE#EEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEAEEEAEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEE",
    )
    right = SequenceRead(
        "@NS500713:64:HFKJJBGXY:1:11101:20469:1097 1:N:0:TATAGCCT+GGTCCCGA",
        "AAAAAACTACACCATAGAATGACTATGAGTCTCATAAGAATGCACTCAACTAGTCATCACTCCTGTGTTTTCATAAGAAAAAACAGTGTTAGAGTCCAAGAG",
        "+",
        "AAAAA6EEEEE/EEEEEEEEEEE#EEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEAEEEAEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEE",
    )
    merged = SequenceReadPair(left, right).fast_merge()
    assert merged is not None
    assert (
        merged.seq
        == "TTTTTTCTCTTGGACTCTAACACTGTTTTTTCTTATGAAAACACAGGAGTGATGACTAGTTGAGTGCATTCTTATGAGACTCATAGTCATTCTATGATGTAGTTTTTT"
    )
    assert merged.name.endswith("merged_diff_0") or "merged_diff_" in merged.name
    assert merged.strand == "+"


def test_edit_distance_golden():
    # reference: src/core/edit_distance.rs:221-261
    s1 = [
        "CCTATCAGGGAGCTGTGGGCCAGCCAGGAGGCAGCACATGCCCAATCCCAGGCCCCTCCCGTTGTAAGTTCCCGTTCTACCCGACAGGGACCTGCTGACAAAAGACAGGGCTGGAGAGCCAGCCTGAAGGCCCTGGGACCCTTCTATCCAC",
        "ACTTATGTTTTTAAATGAGGATTATTGATAGTACTCTTGGTTTTTATACCATTCAGATCACTGAATTTATAAAGTACCCATCTAGTACTTCAAAAAGTAAAGTGTTCTGCCAGATCTTAGGTATAGAGGACCCTAACACAGTAAGATCGGA",
        "TAGGGGTATGAGTAGAGCTGAGCTGGGGGAAAAGAGGGAAATTCCCAGGGGTGGAGGAAGAGTCAAGTCCCCCTCTACACCTAGAGGATGAACTTAAGGAAGGAGTGAAGGTCATATGTGTTGTTCCTGAGGAAAAGGCCGCTGTAGAAAA",
    ]
    s2 = [
        "CCTATCAGGGAGCTGTGGGCCAGCCAGGAGGCAGCACATGCCCAATCCCAGGCCCCTCCCGTTGTAAGTTCCCGTTCTACCCGACAGGGACCTGCTGACAAAAGACAGGGCTGGAGAGCCAGCCTGAAGGCCCTGGGACCCTTCTATCCAC",
        "ACTTATGTTTTTAAATGAGGATTATTGATAGTACTCTTGGTTTTTATACCATTCAGATCACTGAATTTATAAAGTACCCATCTAGTACTTGAAAAAGTAAAGTGTTCTGCCAGATCTTAGGTATAGAGGACCCTAACACAGTAAGATCGGA",
        "CCTGGGCCTGGCCCTTGTCTAAAACTGACTCTTTTGAGGGTGATTTTGGATGTTCTTAGTAGAGTCTCTCACCTGTACTTTCCTTGCCTAAGGTGCTGTCTTCTCTTGCAGGTTGCCTACACGTTCCTCACATGCCCTAAGAACCATGGGA",
    ]
    expect = [0, 1, 90]
    for a, b, e in zip(s1, s2, expect):
        assert edit_distance(a, b) == e
    # basics
    assert edit_distance("", "abc") == 3
    assert edit_distance("abc", "") == 3
    assert edit_distance("kitten", "sitting") == 3


def test_fusion_csv_pos2str(refdata):
    # reference: src/core/fusion.rs:115-149
    fusions = Fusion.parse_csv(str(refdata / "fusions.csv"))
    by_name = {f.gene.name: f.gene for f in fusions}
    assert set(by_name) == {"ALK", "ROS1", "RET", "EML4"}
    alk = by_name["ALK"]
    assert alk.pos2str(-30582) == "ALK:exon:20|-chr2:29446222"
    assert alk.pos2str(31060) == "ALK:intron:19|+chr2:29446700"
    eml4 = by_name["EML4"]
    assert eml4.pos2str(95365) == "EML4:exon:6|+chr2:42491855"
    assert eml4.pos2str(95346) == "EML4:intron:5|+chr2:42491836"
    # ALK is a reversed gene (exons descending)
    assert alk.is_reversed()
    assert not eml4.is_reversed()


def test_fasta_reader(refdata):
    # reference: src/core/fasta_reader.rs:232-255
    contig1 = "GATCACAGGTCTATCACCCTATTAATTGGTATTTTCGTCTGGGGGGTGTGGAGCCGGAGCACCCTATGTCGCAGT"
    contig2 = "GTCTGCACAGCCGCTTTCCACACAGAACCCCCCCCTCCCCCCGCTTCTGGCAAACCCCAAAAACAAAGAACCCTA"
    for name in ("tinyref.fa", "tinyref.fa.gz"):
        contigs = fasta.read_all(str(refdata / name), force_upper_case=True)
        assert contigs["contig1"] == contig1
        assert contigs["contig2"] == contig2


def test_fastq_reader(refdata):
    # reference: src/core/fastq_reader.rs:271-293
    plain = list(FastqReader(str(refdata / "R1.fq")))
    gz = list(FastqReader(str(refdata / "R1.fq.gz")))
    assert len(plain) == len(gz) == 3
    for a, b in zip(plain, gz):
        assert a.seq == b.seq
        assert a.name == b.name
        assert a.quality == b.quality
    assert plain[0].name.startswith("@NB551106:23:")
    pairs = list(FastqReaderPair(str(refdata / "R1.fq"), str(refdata / "R2.fq")))
    assert len(pairs) == 3


def test_read_reverse_complement():
    r = SequenceRead("@x", "ATGCN", "+", "ABCDE")
    rc = r.reverse_complement()
    assert rc.seq == "NGCAT"
    assert rc.quality == "EDCBA"
    assert rc.strand == "-"
    assert rc.reverse_complement().strand == "+"
