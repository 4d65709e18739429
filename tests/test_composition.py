"""Composition test: contig-group partitioned genome x active multi-device
mesh x streamed paired-end input — the configuration a real whole-genome
multi-chip paired run uses (round-3 review weak #8). Output must be
byte-identical to the plain single-index, single-device, single-chunk run."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def paired_grouped_fixture():
    from tophat_tpu.index.fasta import Genome, decode_seq, revcomp

    rng = np.random.default_rng(23)
    K = 12_000
    contigs = [rng.integers(0, 4, K).astype(np.int8) for _ in range(4)]
    juncs = {}
    for ci in (0, 2):
        c = contigs[ci]
        a, il = 4_000, 300
        c[a] = 2
        c[a + 1] = 3
        c[a + il - 2] = 0
        c[a + il - 1] = 2
        juncs[ci] = (a, il)
    codes = np.concatenate(contigs)
    offsets = np.concatenate([[0], np.cumsum([len(c) for c in contigs])])
    genome = Genome(codes=codes, offsets=offsets.astype(np.int64),
                    names=[f"chr{i}" for i in range(4)])

    L = 60
    recs1, recs2 = [], []
    for ci in range(4):
        for k in range(10):
            s = 800 + 700 * k
            m1 = contigs[ci][s: s + L]
            m2 = revcomp(contigs[ci][s + L + 50: s + 2 * L + 50])
            recs1.append((f"c{ci}_{k}", decode_seq(m1), b"I" * L))
            recs2.append((f"c{ci}_{k}", decode_seq(m2), b"I" * L))
    # spliced mate-1 reads crossing each intron-bearing contig
    for ci in (0, 2):
        a, il = juncs[ci]
        for k in range(6):
            t = 18 + 3 * k
            m1 = np.concatenate([contigs[ci][a - t: a],
                                 contigs[ci][a + il: a + il + L - t]])
            s2 = a + il + 90
            m2 = revcomp(contigs[ci][s2: s2 + L])
            recs1.append((f"s{ci}_{k}", decode_seq(m1), b"I" * L))
            recs2.append((f"s{ci}_{k}", decode_seq(m2), b"I" * L))
    return genome, recs1, recs2


def test_grouped_mesh_streaming_paired_matches_plain(
        paired_grouped_fixture, tmp_path):
    from tophat_tpu.index.grouped import build_grouped_fm
    from tophat_tpu.io.fastq import batch_reads
    from tophat_tpu.parallel import auto
    from tophat_tpu.pipeline.paired import (run_pipeline_paired,
                                            run_pipeline_paired_streaming)
    from tophat_tpu.pipeline.params import Params

    genome, recs1, recs2 = paired_grouped_fixture
    params = Params(coverage_search=False)

    auto.deactivate()
    out_plain = tmp_path / "plain"
    run_pipeline_paired(genome, batch_reads(recs1), batch_reads(recs2),
                        params, str(out_plain), log=lambda *a: None)

    gfm = build_grouped_fm(genome, max_bases=25_000)
    assert gfm.n_groups == 2

    def pair_iter():
        for s in range(0, len(recs1), 20):
            yield (batch_reads(recs1[s: s + 20]),
                   batch_reads(recs2[s: s + 20]))

    out_comp = tmp_path / "composed"
    auto.auto_activate()
    assert auto.active() is not None, "virtual mesh failed to activate"
    try:
        run_pipeline_paired_streaming(genome, pair_iter(), params,
                                      str(out_comp), gfm=gfm,
                                      log=lambda *a: None)
    finally:
        auto.deactivate()

    for f in ("accepted_hits.sam", "junctions.bed", "deletions.bed",
              "insertions.bed", "align_summary.txt"):
        a = (out_plain / f).read_text()
        b = (out_comp / f).read_text()
        assert a == b, (f"{f} differs between plain and "
                        f"grouped+mesh+streaming-paired runs")
    sam = (out_plain / "accepted_hits.sam").read_text()
    assert any("N" in ln.split("\t")[5] for ln in sam.splitlines()), \
        "fixture produced no spliced alignments"
    assert "chr2" in (out_plain / "junctions.bed").read_text()
