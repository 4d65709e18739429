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
