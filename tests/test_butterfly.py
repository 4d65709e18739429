"""Butterfly + microexon searches (pipeline/butterfly.py; reference:
segment_juncs.cpp pair_covered_sites :4178, align_microexon_segs :3737)."""

import numpy as np
import pytest

from tophat_tpu.index.fasta import Genome, decode_seq, encode_seq


def _mk_genome(rng, n=4000):
    codes = rng.integers(0, 4, n).astype(np.int8)
    return Genome(codes=codes, offsets=np.array([0, n]), names=["chrT"])


def _plant_junction(genome, left, right):
    """Make genome[left+1:left+3] = GT and genome[right-2:right] = AG so a
    junction (left, right) has canonical motifs (left = last exon base,
    right = first right-exon base, our event convention)."""
    genome.codes[left + 1] = 2  # G
    genome.codes[left + 2] = 3  # T
    genome.codes[right - 2] = 0  # A
    genome.codes[right - 1] = 2  # G


def _spliced_read(genome, left, right, pre, post):
    return np.concatenate([genome.codes[left - pre + 1:left + 1],
                           genome.codes[right:right + post]])


def test_mer_table_and_extend_checker():
    from tophat_tpu.pipeline.butterfly import ExtendChecker, build_mer_table

    rng = np.random.default_rng(11)
    genome = _mk_genome(rng)
    left, right = 1000, 1600
    _plant_junction(genome, left, right)

    # a read spanning the junction with 20bp on each side
    read = _spliced_read(genome, left, right, 20, 20)
    check = ExtendChecker(genome.codes, build_mer_table([read]))
    assert check(left, right)
    # reverse-complemented read supports the same junction
    from tophat_tpu.index.fasta import revcomp
    check_rc = ExtendChecker(genome.codes, build_mer_table([revcomp(read)]))
    assert check_rc(left, right)
    # a junction elsewhere is not extendable by this read
    assert not check(left + 200, right + 500)
    # too-short extension (< 7bp on both sides): spanning mer present but
    # not extendable
    short = _spliced_read(genome, left, right, 8, 8)
    check_s = ExtendChecker(genome.codes, build_mer_table([short]))
    assert not check_s(left, right)


def test_butterfly_pipeline_discovers_junction(tmp_path):
    """Reads with anchors too short for split-segment search pair up via
    butterfly's island+extendability scan."""
    from tophat_tpu.io.fastq import batch_reads
    from tophat_tpu.pipeline.params import Params
    from tophat_tpu.pipeline.run import run_pipeline

    rng = np.random.default_rng(7)
    genome = _mk_genome(rng)
    left, right = 1000, 1600
    _plant_junction(genome, left, right)

    reads = []
    # spliced reads: 36bp with a 10bp overhang (too short for a 12bp
    # segment to map on the short side)
    for i in range(6):
        reads.append(("spl%d" % i,
                      decode_seq(_spliced_read(genome, left, right,
                                               10 + i, 26 - i)), b"I" * 36))
    # contiguous reads covering both islands (so coverage exists)
    for i in range(8):
        s = left - 60 + 4 * i
        reads.append(("l%d" % i, decode_seq(genome.codes[s:s + 30]), b"I" * 30))
        s2 = right + 4 * i
        reads.append(("r%d" % i, decode_seq(genome.codes[s2:s2 + 30]),
                      b"I" * 30))
    batch = batch_reads(reads)
    params = Params(segment_length=12, butterfly_search=True,
                    min_coverage_intron=50, max_coverage_intron=20000)
    out = run_pipeline(genome, batch, params, str(tmp_path),
                       log=lambda *a: None)
    juncs = open(tmp_path / "junctions.bed").read()
    assert f"\t{left + 1 - 10}\t" in juncs or "chrT" in juncs
    ev = out["events"]
    hit = [(int(l), int(r)) for l, r in zip(ev["left"], ev["right"])]
    assert (left, right) in hit


def test_microexon_pipeline(tmp_path):
    """A read whose first segment spans a junction (unmappable) while the
    rest maps: the microexon window search recovers the junction."""
    from tophat_tpu.io.fastq import batch_reads
    from tophat_tpu.pipeline.params import Params
    from tophat_tpu.pipeline.run import run_pipeline

    rng = np.random.default_rng(5)
    genome = _mk_genome(rng)
    left, right = 1400, 1800
    _plant_junction(genome, left, right)

    # 36bp reads, segment length 12: 11bp before the junction => the first
    # segment straddles the break and cannot map contiguously, the
    # remaining two segments map
    reads = []
    for i in range(5):
        reads.append(("m%d" % i,
                      decode_seq(_spliced_read(genome, left, right,
                                               11, 25)), b"I" * 36))
    batch = batch_reads(reads)
    params = Params(segment_length=12, microexon_search=True,
                    coverage_search=False)
    out = run_pipeline(genome, batch, params, str(tmp_path),
                       log=lambda *a: None)
    ev = out["events"]
    hit = [(int(l), int(r)) for l, r in zip(ev["left"], ev["right"])]
    assert (left, right) in hit
    # and the read aligns across it
    sam = open(tmp_path / "accepted_hits.sam").read()
    assert f"{right - left - 1}N" in sam


def test_butterfly_requires_extendability():
    """Motif pairs without read support are rejected (the extendability
    gate is what separates butterfly from blind motif pairing)."""
    from tophat_tpu.pipeline.butterfly import ExtendChecker, build_mer_table

    rng = np.random.default_rng(3)
    genome = _mk_genome(rng)
    left, right = 900, 1500
    _plant_junction(genome, left, right)
    # table from unrelated reads
    other = [rng.integers(0, 4, 40).astype(np.int8) for _ in range(10)]
    check = ExtendChecker(genome.codes, build_mer_table(other))
    assert not check(left, right)
