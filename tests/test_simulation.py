"""Accuracy on the reference's simulation fixture: simulated reads with a
truth SAM (tests/simulation/tiny_multihit)."""

import os
import re

import numpy as np
import pytest

SIM = "/root/reference/tests/simulation/tiny_multihit"


@pytest.mark.skipif(not os.path.exists(SIM), reason="reference unavailable")
def test_simulated_reads_accuracy(tmp_path):
    """>= 90% of simulated mate-1 reads must align, and >= 90% of the
    aligned ones at a truth position (multi-mapped reads count as correct
    if any reported placement matches truth)."""
    from tophat_tpu.index.fasta import read_fasta
    from tophat_tpu.io.fastq import batch_reads, read_all
    from tophat_tpu.io.gtf import gtf_junctions, parse_gtf
    from tophat_tpu.pipeline.params import Params
    from tophat_tpu.pipeline.run import run_pipeline

    genome = read_fasta(os.path.join(SIM, "reference.fa"))
    ev, accept = gtf_junctions(
        genome, parse_gtf(os.path.join(SIM, "ref_genes.gtf")))

    # truth: name -> set of (ref, pos0) for mate-1 records (flag & 64 or
    # unpaired-style first record per name)
    truth = {}
    with open(os.path.join(SIM, "tiny_sim.sam")) as f:
        for line in f:
            t = line.split("\t")
            if len(t) < 4:
                continue
            flag = int(t[1])
            if flag & 0x80:  # mate 2
                continue
            truth.setdefault(t[0], set()).add((t[2], int(t[3]) - 1))

    batch = batch_reads(list(read_all(os.path.join(SIM, "tiny_sim_1.fq"))))
    params = Params(segment_length=18)
    out = run_pipeline(genome, batch, params, str(tmp_path),
                       known_events=ev, gtf_accept=accept,
                       log=lambda *a: None)

    aligned = correct = 0
    name2id = genome.name_to_id()
    for r, clist in out["selected"].items():
        if not clist:
            continue
        aligned += 1
        name = batch.names[r]
        got = set()
        for c in clist:
            cid, local = genome.global_to_contig(np.int64(c.pos))
            got.add((genome.names[int(cid)], int(local)))
        if truth.get(name) and (got & truth[name]):
            correct += 1
    assert aligned >= 0.9 * batch.size, f"only {aligned}/{batch.size} aligned"
    assert correct >= 0.9 * aligned, f"{correct}/{aligned} truth-consistent"
