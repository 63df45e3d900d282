"""Block FASTQ reader must agree with the scalar reader; block scan path
must equal the object scan path."""

import numpy as np

from genefuserust_tpu.config import Settings
from genefuserust_tpu.core.scanner import Scanner, HostEngine
from genefuserust_tpu.io.fastq import FastqReader
from genefuserust_tpu.io.fastq_block import read_fastq_block, read_pair_block
from genefuserust_tpu.parallel.engine import TpuEngine
from genefuserust_tpu.utils.synthetic import (
    make_panel,
    plant_fusion_pairs,
    write_fastq_files,
    write_panel_files,
)


def test_block_reader_matches_scalar(refdata):
    for name in ("R1.fq", "R1.fq.gz", "R2.fq"):
        scalar = list(FastqReader(str(refdata / name)))
        block = read_fastq_block(str(refdata / name))
        assert len(block) == len(scalar)
        for i, r in enumerate(scalar):
            assert block.name(i) == r.name
            assert block.seq_str(i) == r.seq
            assert block.qual_str(i) == r.quality


def test_block_reader_edge_cases(tmp_path):
    # no trailing newline; varying lengths; incomplete trailing record
    p = tmp_path / "x.fq"
    p.write_text("@a\nACGTACGTACGTACGTAC\n+\nIIIIIIIIIIIIIIIIII\n@b\nACGT\n+\nJJJJ\n@c\nAC")
    block = read_fastq_block(str(p))
    assert len(block) == 2  # incomplete record dropped (scalar: None)
    assert block.seq_str(0) == "ACGTACGTACGTACGTAC"
    assert block.seq_str(1) == "ACGT"
    assert block.qual_str(1) == "JJJJ"
    scalar = list(FastqReader(str(p)))
    assert len(scalar) == 2


def test_block_scan_equals_object_scan(tmp_path):
    panel = make_panel()
    pairs = plant_fusion_pairs(panel, n_support=6, n_background=50)
    r1, r2 = write_fastq_files(pairs, str(tmp_path))
    _, csv_path = write_panel_files(panel, str(tmp_path))

    def run_block(engine, name):
        sc = Scanner(
            csv_path, panel.contigs, "", str(tmp_path / name), Settings(),
            engine=engine, command="blk",
        )
        return (
            sc.scan_pair_block(read_pair_block(r1, r2)),
            (tmp_path / name).read_text(),
        )

    def run_obj(engine, name):
        sc = Scanner(
            csv_path, panel.contigs, "", str(tmp_path / name), Settings(),
            engine=engine, command="blk",
        )
        return sc.scan_pairs(pairs), (tmp_path / name).read_text()

    strip = lambda s: "\n".join(
        l for l in s.splitlines() if not l.startswith('\t"time"')
    )
    m1, j1 = run_obj(HostEngine(), "a.json")
    m2, j2 = run_block(TpuEngine(Settings(), batch_size=32), "b.json")
    m3, j3 = run_block(HostEngine(), "c.json")
    assert strip(j1) == strip(j2) == strip(j3)
    assert [f.title for f in m1.fusion_results] == [
        f.title for f in m2.fusion_results
    ]


def test_streamed_blocks_equal_whole_file(tmp_path):
    from genefuserust_tpu.io.fastq_block import (
        read_pair_block,
        stream_pair_blocks,
    )

    panel = make_panel()
    pairs = plant_fusion_pairs(panel, n_support=4, n_background=30)
    r1, r2 = write_fastq_files(pairs, str(tmp_path))
    whole = read_pair_block(r1, r2)
    # tiny chunks force many block boundaries
    streamed = list(stream_pair_blocks(r1, r2, chunk_bytes=1024))
    assert len(streamed) > 3
    tot = sum(len(b) for b in streamed)
    assert tot == len(whole)
    k = 0
    for blk in streamed:
        for i in range(len(blk)):
            assert blk.left.name(i) == whole.left.name(k)
            assert blk.left.seq_str(i) == whole.left.seq_str(k)
            assert blk.right.qual_str(i) == whole.right.qual_str(k)
            k += 1
    # full streamed scan equals whole-block scan
    _, csv_path = write_panel_files(panel, str(tmp_path))
    sA = Scanner(csv_path, panel.contigs, "", str(tmp_path / "a.json"), Settings(),
                 engine=TpuEngine(Settings(), batch_size=16), command="s")
    mA = sA.scan_pair_stream(stream_pair_blocks(r1, r2, chunk_bytes=2048))
    sB = Scanner(csv_path, panel.contigs, "", str(tmp_path / "b.json"), Settings(),
                 engine=TpuEngine(Settings(), batch_size=64), command="s")
    mB = sB.scan_pair_block(read_pair_block(r1, r2))
    strip = lambda s: "\n".join(
        l for l in s.splitlines() if not l.startswith('\t"time"')
    )
    assert strip((tmp_path / "a.json").read_text()) == strip(
        (tmp_path / "b.json").read_text()
    )
