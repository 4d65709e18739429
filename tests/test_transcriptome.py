"""Transcriptome mapping stage (_reads_vs_T): reads spanning several
ANNOTATED junctions align contiguously in transcript space and come back as
genomic multi-N alignments (reference: src/tophat.py:3286-3326 map2gtf,
src/map2gtf.cpp:234 trans_to_genomic_coords)."""

import os

import numpy as np
import pytest


def _fixture(tmp_path, seed=23):
    """Random 30 kb genome, 4-exon gene with 12 bp middle exons — too short
    for 25 bp segments to map, so the junctions are NOT discoverable without
    annotation. Returns (genome, gtf_path, transcript_codes, exons)."""
    from tophat_tpu.index.fasta import Genome

    rng = np.random.default_rng(seed)
    N = 30_000
    codes = rng.integers(0, 4, N).astype(np.int8)
    exon_lens = [40, 12, 12, 40]
    intron_lens = [200, 180, 160]
    p = 9_000
    exons = []
    for i, el in enumerate(exon_lens):
        exons.append((p, p + el))
        p += el + (intron_lens[i] if i < 3 else 0)
    genome = Genome(codes=codes, offsets=np.array([0, N]), names=["chrV"])
    gtf = tmp_path / "genes.gtf"
    with open(gtf, "w") as f:
        for s, e in exons:
            f.write(f'chrV\ttest\texon\t{s + 1}\t{e}\t.\t+\t.\t'
                    f'gene_id "g1"; transcript_id "t1";\n')
    transcript = np.concatenate([codes[s:e] for s, e in exons])
    return genome, str(gtf), transcript, exons


def test_three_annotated_junctions_need_G(tmp_path):
    from tophat_tpu.index.fasta import decode_seq
    from tophat_tpu.io.fastq import batch_reads
    from tophat_tpu.io.gtf import gtf_junctions, parse_gtf
    from tophat_tpu.pipeline.params import Params
    from tophat_tpu.pipeline.run import run_pipeline
    from tophat_tpu.pipeline.transcriptome import build_transcriptome_index

    genome, gtf, transcript, exons = _fixture(tmp_path)
    L = 100
    recs = [("r0", decode_seq(transcript[:L]), b"I" * L),
            ("r2", decode_seq(transcript[2: 2 + L]), b"I" * L)]
    batch = batch_reads(recs)
    params = Params(coverage_search=False)

    # without -G: the 12 bp middle exons are invisible to segment discovery
    out0 = run_pipeline(genome, batch, params,
                        str(tmp_path / "noG"), log=lambda *a: None)
    for i in range(2):
        for c in out0["selected"].get(i, []):
            assert sum(1 for op, _ in c.cigar(L) if op == "N") < 3, \
                "fixture broken: 3-junction read aligned without -G"

    # with -G: transcriptome mapping places both reads across 3 junctions
    transcripts = parse_gtf(gtf)
    ev, accept = gtf_junctions(genome, transcripts)
    trans = build_transcriptome_index(genome, transcripts)
    out1 = run_pipeline(genome, batch, params, str(tmp_path / "withG"),
                        known_events=ev, gtf_accept=accept, trans=trans,
                        log=lambda *a: None)
    il = [exons[i + 1][0] - exons[i][1] for i in range(3)]
    expects = {
        0: [("M", 40), ("N", il[0]), ("M", 12), ("N", il[1]), ("M", 12),
            ("N", il[2]), ("M", 36)],
        1: [("M", 38), ("N", il[0]), ("M", 12), ("N", il[1]), ("M", 12),
            ("N", il[2]), ("M", 38)],
    }
    for i, expect in expects.items():
        sel = out1["selected"].get(i, [])
        got = [c.cigar(L) for c in sel]
        assert expect in got, f"read {i}: {got} != {expect}"
        c = [c for c in sel if c.cigar(L) == expect][0]
        assert c.pos == exons[0][0] + (0 if i == 0 else 2)
        assert c.mm == 0

    # the BED track carries all three annotated junctions
    bed = (tmp_path / "withG" / "junctions.bed").read_text().splitlines()
    assert len(bed) - 1 >= 3


def test_isoform_dedup_and_reverse_reads(tmp_path):
    """The same genomic placement reachable via two isoforms reports once;
    reverse-complement reads map with strand 1."""
    from tophat_tpu.index.fasta import decode_seq, revcomp
    from tophat_tpu.io.fastq import batch_reads
    from tophat_tpu.io.gtf import gtf_junctions, parse_gtf
    from tophat_tpu.pipeline.params import Params
    from tophat_tpu.pipeline.run import run_pipeline
    from tophat_tpu.pipeline.transcriptome import build_transcriptome_index

    genome, gtf, transcript, exons = _fixture(tmp_path, seed=29)
    # add a second isoform with identical exons (different id)
    with open(gtf, "a") as f:
        for s, e in exons:
            f.write(f'chrV\ttest\texon\t{s + 1}\t{e}\t.\t+\t.\t'
                    f'gene_id "g1"; transcript_id "t2";\n')
    L = 100
    fwd = transcript[:L]
    recs = [("f", decode_seq(fwd), b"I" * L),
            ("r", decode_seq(revcomp(fwd)), b"I" * L)]
    batch = batch_reads(recs)
    transcripts = parse_gtf(gtf)
    assert len(transcripts) == 2
    ev, accept = gtf_junctions(genome, transcripts)
    trans = build_transcriptome_index(genome, transcripts)
    out = run_pipeline(genome, batch, Params(coverage_search=False),
                       str(tmp_path / "out"), known_events=ev,
                       gtf_accept=accept, trans=trans, log=lambda *a: None)
    sel_f = out["selected"].get(0, [])
    assert len(sel_f) == 1 and sel_f[0].strand == 0   # isoforms deduped
    sel_r = out["selected"].get(1, [])
    assert len(sel_r) == 1 and sel_r[0].strand == 1
    assert sel_r[0].pos == sel_f[0].pos
    assert sel_r[0].cigar(L) == sel_f[0].cigar(L)


def test_tt_index_persistence(tmp_path):
    from tophat_tpu.io.gtf import parse_gtf
    from tophat_tpu.pipeline.transcriptome import build_transcriptome_index

    genome, gtf, transcript, exons = _fixture(tmp_path, seed=31)
    transcripts = parse_gtf(gtf)
    prefix = str(tmp_path / "tix" / "genes")
    os.makedirs(tmp_path / "tix")
    t1 = build_transcriptome_index(genome, transcripts, prefix=prefix)
    assert os.path.exists(prefix + ".tt.npz")
    msgs = []
    t2 = build_transcriptome_index(genome, transcripts, prefix=prefix,
                                   log=msgs.append)
    assert any("reusing" in m for m in msgs)
    assert t2.fm.n == t1.fm.n
    assert np.array_equal(np.asarray(t2.fm.sa), np.asarray(t1.fm.sa))
