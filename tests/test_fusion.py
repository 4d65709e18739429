"""Fusion search recall on the reference's fusion_test data."""

import os

import pytest

FT = "/root/reference/fusion_test"


@pytest.mark.skipif(not os.path.exists(FT), reason="reference unavailable")
def test_fusion_inter_recall(tmp_path):
    from tophat_tpu.index.fasta import read_fasta
    from tophat_tpu.io.fastq import batch_reads, read_all
    from tophat_tpu.pipeline.params import Params
    from tophat_tpu.pipeline.run import run_pipeline

    genome = read_fasta(os.path.join(FT, "testcases", "test.fa"))
    batch = batch_reads(list(read_all(
        os.path.join(FT, "test_fusion_inter.fasta"))))
    params = Params(max_intron_length=500, fusion_search=True,
                    fusion_min_dist=500)
    out = run_pipeline(genome, batch, params, str(tmp_path),
                       log=lambda *a: None)
    n_aligned = sum(1 for v in out["selected"].values() if v)
    assert n_aligned >= 0.8 * batch.size, f"recall {n_aligned}/{batch.size}"

    sam = open(tmp_path / "accepted_hits.sam").read()
    assert "XF:Z:" in sam
    assert os.path.exists(tmp_path / "fusions.out")
    fus = open(tmp_path / "fusions.out").read()
    assert "Scchr01-Scchr02" in fus and "\tff\t" in fus

    # full print_fusions format (reference: fusions.cpp:347-431): 7
    # @-separated sections — stats, diffs, two 50+50bp flank sequence
    # pairs, left/right per-base support histograms, pair support
    for line in fus.splitlines():
        sec = line.split("\t@\t")
        assert len(sec) == 7
        lead = sec[0].split("\t")
        assert len(lead) == 11  # chr-chr l r dir cnt pc pcf uc lext rext symm
        assert lead[3] in ("ff", "fr", "rf", "rr")
        assert len(sec[1].split()) == 5          # diffs at 5 window sizes
        f1 = sec[2].split()
        f2 = sec[3].split()
        assert len(f1) == 2 and len(f1[0]) == 50 and len(f1[1]) == 50
        assert len(f2) == 2 and len(f2[0]) == 50 and len(f2[1]) == 50
        assert len(sec[4].split()) == 50         # left_bases histogram
        assert len(sec[5].split()) == 50         # right_bases histogram
