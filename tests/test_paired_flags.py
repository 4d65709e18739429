"""Paired-end grading + flag wiring: --v2-sam (proper pair, TLEN, MAPQ),
--no-mixed, --no-discordant, -M prefilter, --library-type.
(reference: inserts.h:33 InsertAlignmentGrade; tophat_reports.cpp:734 MAPQ;
tophat.py:3995 prefilter; segment_juncs.cpp:2110 library types)."""

import numpy as np
import pytest

from tophat_tpu.index.fasta import Genome, decode_seq, revcomp
from tophat_tpu.io.fastq import batch_reads
from tophat_tpu.pipeline.params import Params


@pytest.fixture(scope="module")
def genome():
    rng = np.random.default_rng(23)
    codes = rng.integers(0, 4, 6000).astype(np.int8)
    return Genome(codes=codes, offsets=np.array([0, 6000]), names=["chrP"])


def _pairs(genome, n=6, rl=40, inner=50):
    """Concordant FR pairs: mate1 fwd at p, mate2 revcomp at p+rl+inner."""
    recs1, recs2 = [], []
    for i in range(n):
        p = 300 + 97 * i
        m1 = genome.codes[p:p + rl]
        m2 = revcomp(genome.codes[p + rl + inner:p + rl + inner + rl])
        recs1.append((f"p{i}", decode_seq(m1), b"I" * rl))
        recs2.append((f"p{i}", decode_seq(m2), b"I" * rl))
    return batch_reads(recs1), batch_reads(recs2)


def test_v2_sam_fields(genome, tmp_path):
    from tophat_tpu.pipeline.paired import run_pipeline_paired

    b1, b2 = _pairs(genome)
    params = Params(v2_sam=True, inner_dist_mean=50, inner_dist_std_dev=20,
                    coverage_search=False)
    run_pipeline_paired(genome, b1, b2, params, str(tmp_path),
                        log=lambda *a: None)
    lines = [l.split("\t") for l in open(tmp_path / "accepted_hits.sam")]
    assert lines, "no alignments"
    for t in lines:
        flag = int(t[1])
        assert flag & 0x2, "concordant pair must carry the proper-pair flag"
        tlen = int(t[8])
        assert abs(tlen) == 40 + 50 + 40
        assert t[4] == "50"  # v2 MAPQ for unique placements


def test_no_mixed_drops_half_mapped(genome, tmp_path):
    from tophat_tpu.pipeline.paired import run_pipeline_paired

    b1, b2 = _pairs(genome, n=3)
    # corrupt mate2 of pair 1 so it cannot map
    rng = np.random.default_rng(5)
    junk = decode_seq(rng.integers(0, 4, 40).astype(np.int8))
    recs2 = [(b2.names[i],
              junk if i == 1 else decode_seq(b2.codes[i][:40]),
              b"I" * 40) for i in range(3)]
    b2 = batch_reads(recs2)
    out1 = tmp_path / "mixed"
    run_pipeline_paired(genome, b1, b2, Params(coverage_search=False),
                        str(out1), log=lambda *a: None)
    names_mixed = {l.split("\t")[0] for l in open(out1 / "accepted_hits.sam")}
    assert "p1" in names_mixed  # half-mapped kept by default

    out2 = tmp_path / "nomixed"
    run_pipeline_paired(genome, b1, b2,
                        Params(no_mixed=True, coverage_search=False),
                        str(out2), log=lambda *a: None)
    names = {l.split("\t")[0] for l in open(out2 / "accepted_hits.sam")}
    assert "p1" not in names
    assert "p0" in names and "p2" in names


def test_no_discordant(genome, tmp_path):
    from tophat_tpu.pipeline.paired import run_pipeline_paired

    rl = 40
    # discordant pair: both mates same strand (no revcomp on mate2)
    recs1 = [("d0", decode_seq(genome.codes[500:540]), b"I" * rl)]
    recs2 = [("d0", decode_seq(genome.codes[630:670]), b"I" * rl)]
    out = tmp_path / "nodisc"
    run_pipeline_paired(genome, batch_reads(recs1), batch_reads(recs2),
                        Params(no_discordant=True, coverage_search=False),
                        str(out), log=lambda *a: None)
    assert open(out / "accepted_hits.sam").read() == ""


def test_prefilter_multihits(tmp_path):
    from tophat_tpu.pipeline.run import run_pipeline

    # a genome with one 40bp sequence repeated 30 times
    rng = np.random.default_rng(3)
    unit = rng.integers(0, 4, 40).astype(np.int8)
    codes = np.concatenate(
        [np.concatenate([unit, rng.integers(0, 4, 60).astype(np.int8)])
         for _ in range(30)])
    genome = Genome(codes=codes, offsets=np.array([0, len(codes)]),
                    names=["chrR"])
    recs = [("rep", decode_seq(unit), b"I" * 40),
            ("uniq", decode_seq(codes[40:80]), b"I" * 40)]
    batch = batch_reads(recs)
    out1 = tmp_path / "plain"
    run_pipeline(genome, batch, Params(max_multihits=20, hits_per_seed=64,
                                       max_alignments=64,
                                       coverage_search=False),
                 str(out1), log=lambda *a: None)
    names = {l.split("\t")[0] for l in open(out1 / "accepted_hits.sam")}
    assert "rep" in names  # 30 placements capped at 20, still reported

    out2 = tmp_path / "prefilter"
    run_pipeline(genome, batch,
                 Params(max_multihits=20, hits_per_seed=64,
                        max_alignments=64, prefilter_multihits=True,
                        coverage_search=False),
                 str(out2), log=lambda *a: None)
    names = {l.split("\t")[0] for l in open(out2 / "accepted_hits.sam")}
    assert "rep" not in names  # -M drops >20-hit reads entirely
    assert "uniq" in names


def test_library_type_firststrand(tmp_path):
    """fr-firststrand: a forward-aligned single read may only support
    antisense junctions, so a GT-AG (sense) intron is not discovered."""
    from tophat_tpu.pipeline.run import run_pipeline

    rng = np.random.default_rng(13)
    codes = rng.integers(0, 4, 4000).astype(np.int8)
    genome = Genome(codes=codes, offsets=np.array([0, 4000]),
                    names=["chrT"])
    left, right = 1000, 1600
    genome.codes[left + 1:left + 3] = [2, 3]   # GT
    genome.codes[right - 2:right] = [0, 2]     # AG
    recs = []
    for i in range(4):
        seq = np.concatenate([genome.codes[left - 17 - i:left + 1],
                              genome.codes[right:right + 18 + i]])
        recs.append((f"r{i}", decode_seq(seq), b"I" * len(seq)))
    batch = batch_reads(recs)

    out1 = tmp_path / "unstranded"
    run_pipeline(genome, batch, Params(segment_length=12,
                                       coverage_search=False),
                 str(out1), log=lambda *a: None)
    assert "JUNC" in open(out1 / "junctions.bed").read()

    out2 = tmp_path / "firststrand"
    run_pipeline(genome, batch,
                 Params(segment_length=12, coverage_search=False,
                        library_type="fr-firststrand"),
                 str(out2), log=lambda *a: None)
    # forward rows may only support antisense junctions under
    # fr-firststrand; the sense GT-AG junction survives only via the
    # reads' reverse-complement rows, which for these reads do not map —
    # so the junction disappears
    assert "JUNC" not in open(out2 / "junctions.bed").read()
