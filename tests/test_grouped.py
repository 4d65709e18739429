"""Contig-group partitioned pipeline: a multi-group run must produce
byte-identical outputs to the single-index pipeline — the int32-safe path
to whole-genome (>2.1 Gbp) scale (VERDICT r2 item 2)."""

import os

import numpy as np
import pytest


def _fixture(seed=41):
    """4-contig genome (~12 kb each); contigs 0 and 2 carry a GT-AG intron
    and contig 1 a 2 bp deletion. Reads: contiguous + junction-spanning +
    deletion-crossing across all contigs, plus junk."""
    from tophat_tpu.index.fasta import Genome, decode_seq

    rng = np.random.default_rng(seed)
    K = 12_000
    contigs = [rng.integers(0, 4, K).astype(np.int8) for _ in range(4)]
    juncs = {}
    for ci in (0, 2):
        c = contigs[ci]
        a, il = 4_000, 300          # exon1 ends at a-1... junction at a
        c[a] = 2
        c[a + 1] = 3
        c[a + il - 2] = 0
        c[a + il - 1] = 2
        juncs[ci] = (a - 1, a + il)  # (last exonic, first next)
    del_at = 6_000                   # contig 1: 2bp deletion
    codes = np.concatenate(contigs)
    offsets = np.concatenate([[0], np.cumsum([len(c) for c in contigs])])
    genome = Genome(codes=codes, offsets=offsets.astype(np.int64),
                    names=[f"chr{i}" for i in range(4)])

    L = 76
    recs = []
    # contiguous reads on every contig
    for ci in range(4):
        for k in range(6):
            s = 1000 + 700 * k
            seq = contigs[ci][s: s + L].copy()
            seq[10 + k] = (seq[10 + k] + 1) % 4
            recs.append((f"c{ci}_{k}", decode_seq(seq), b"I" * L))
    # junction-spanning reads on contigs 0 and 2
    for ci in (0, 2):
        l, r = juncs[ci]
        for k in range(8):
            t = 20 + 4 * k
            seq = np.concatenate([contigs[ci][l - t + 1: l + 1],
                                  contigs[ci][r: r + L - t]])
            recs.append((f"j{ci}_{k}", decode_seq(seq), b"I" * L))
    # deletion reads on contig 1
    for k in range(6):
        s = del_at - 30 - 2 * k
        seq = np.concatenate([contigs[1][s: del_at],
                              contigs[1][del_at + 2: s + L + 2]])[:L]
        recs.append((f"d{k}", decode_seq(seq), b"I" * L))
    # junk
    for k in range(4):
        recs.append((f"x{k}", decode_seq(rng.integers(0, 4, L)), b"I" * L))
    return genome, recs, juncs


def test_grouped_matches_single(tmp_path):
    from tophat_tpu.index.grouped import build_grouped_fm
    from tophat_tpu.io.fastq import batch_reads
    from tophat_tpu.pipeline.grouped import run_pipeline_grouped
    from tophat_tpu.pipeline.params import Params
    from tophat_tpu.pipeline.run import run_pipeline

    genome, recs, juncs = _fixture()
    batch = batch_reads(recs)
    params = Params(coverage_search=False)

    out_s = tmp_path / "single"
    run_pipeline(genome, batch, params, str(out_s), log=lambda *a: None)

    # force 2 contigs per group -> 2 groups
    gfm = build_grouped_fm(genome, max_bases=25_000)
    assert gfm.n_groups == 2
    out_g = tmp_path / "grouped"
    run_pipeline_grouped(genome, batch, params, str(out_g), gfm,
                         log=lambda *a: None)

    for f in ("accepted_hits.sam", "junctions.bed", "deletions.bed",
              "insertions.bed", "align_summary.txt"):
        a = (out_s / f).read_text()
        b = (out_g / f).read_text()
        assert a == b, f"{f} differs between single and grouped runs"
    # sanity: the junctions really are there, with correct per-contig coords
    bed = (out_s / "junctions.bed").read_text()
    assert "chr0" in bed and "chr2" in bed


def test_group_ranges_and_errors():
    from tophat_tpu.index.fasta import Genome
    from tophat_tpu.index.grouped import contig_group_ranges

    g = Genome(codes=np.zeros(100, np.int8),
               offsets=np.array([0, 40, 70, 100]),
               names=["a", "b", "c"])
    assert contig_group_ranges(g, max_bases=1000) == [range(0, 3)]
    assert contig_group_ranges(g, max_bases=70) == [range(0, 2),
                                                    range(2, 3)]
    assert contig_group_ranges(g, max_bases=40) == [range(0, 1),
                                                    range(1, 2),
                                                    range(2, 3)]
    with pytest.raises(SystemExit):
        contig_group_ranges(g, max_bases=30)


def test_grouped_fm_cache(tmp_path):
    from tophat_tpu.index.grouped import build_grouped_fm
    from tophat_tpu.index.fasta import Genome

    rng = np.random.default_rng(3)
    g = Genome(codes=rng.integers(0, 4, 3000).astype(np.int8),
               offsets=np.array([0, 1500, 3000]), names=["a", "b"])
    prefix = str(tmp_path / "idx")
    g1 = build_grouped_fm(g, max_bases=1600, cache_prefix=prefix)
    assert g1.n_groups == 2
    assert os.path.exists(prefix + ".g0.tt.npz")
    msgs = []
    g2 = build_grouped_fm(g, max_bases=1600, cache_prefix=prefix,
                          log=msgs.append)
    assert sum("reusing" in m for m in msgs) == 2
    assert np.array_equal(np.asarray(g2.fms[0].sa),
                          np.asarray(g1.fms[0].sa))
