"""Chunked (streaming) pipeline vs single-batch equivalence."""

import os

import pytest

CASE = ("/root/reference/tests/regression_tests/test_cases/"
        "test_SimpleSplicing")


@pytest.mark.skipif(not os.path.exists(CASE), reason="reference unavailable")
def test_streaming_matches_single_batch(tmp_path):
    from tophat_tpu.index.fasta import read_fasta
    from tophat_tpu.index.fm import build_fm_index
    from tophat_tpu.io.fastq import batch_reads, read_all
    from tophat_tpu.pipeline.params import Params
    from tophat_tpu.pipeline.run import (iter_read_batches, run_pipeline,
                                         run_pipeline_streaming)

    genome = read_fasta(
        os.path.dirname(CASE) + "/common_genomes/fake.fa")
    fm = build_fm_index(genome)
    reads = os.path.join(CASE, "input", "fakeReads.fq")
    params = Params(segment_length=12, quals_scale="phred64")

    d1 = tmp_path / "single"
    batch = batch_reads(list(read_all(reads, "phred64")))
    run_pipeline(genome, batch, params, str(d1), fm=fm, log=lambda *a: None)

    d2 = tmp_path / "chunked"
    run_pipeline_streaming(
        genome, iter_read_batches([reads], "phred64", 256), params,
        str(d2), fm=fm, log=lambda *a: None)

    for fname in ("accepted_hits.sam", "junctions.bed", "insertions.bed",
                  "deletions.bed"):
        a = (d1 / fname).read_text()
        b = (d2 / fname).read_text()
        assert a == b, f"{fname} differs between single and chunked runs"
