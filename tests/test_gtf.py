"""GTF parsing + GTF-guided alignment on the reference's simulation
fixture (tests/simulation/tiny_multihit: 2-contig genome, Cufflinks-style
GTF, simulated paired reads with truth SAM)."""

import os

import numpy as np
import pytest

SIM = "/root/reference/tests/simulation/tiny_multihit"


@pytest.fixture(scope="module")
def sim_genome():
    from tophat_tpu.index.fasta import read_fasta

    if not os.path.exists(SIM):
        pytest.skip("simulation fixture unavailable")
    return read_fasta(os.path.join(SIM, "reference.fa"))


def test_parse_gtf(sim_genome):
    from tophat_tpu.io.gtf import gtf_junctions, parse_gtf

    transcripts = parse_gtf(os.path.join(SIM, "ref_genes.gtf"))
    assert len(transcripts) >= 2
    tr = transcripts["isoformB"]
    assert tr.chrom == "reference_1" and tr.strand == "+"
    assert tr.exons[0] == (49, 100)      # GTF 50-100 -> 0-based [49, 100)
    ev, accept = gtf_junctions(sim_genome, transcripts)
    assert len(ev["left"]) > 0
    # first isoformB junction: exon ends 100 (1-based) -> left = 99;
    # next exon starts 151 -> right = 150 (global coordinates)
    off = int(sim_genome.offsets[sim_genome.name_to_id()["reference_1"]])
    assert (off + 99, off + 150, False) in accept


def test_gtf_guided_pipeline(sim_genome, tmp_path):
    """Reads simulated from the transcriptome must align, most of them
    spliced across the GTF junctions even without novel discovery."""
    from tophat_tpu.io.fastq import batch_reads, read_all
    from tophat_tpu.io.gtf import gtf_junctions, parse_gtf
    from tophat_tpu.pipeline.params import Params
    from tophat_tpu.pipeline.run import run_pipeline

    transcripts = parse_gtf(os.path.join(SIM, "ref_genes.gtf"))
    ev, accept = gtf_junctions(sim_genome, transcripts)
    batch = batch_reads(list(read_all(os.path.join(SIM, "tiny_sim_1.fq"))))
    params = Params(segment_length=18)
    out = run_pipeline(sim_genome, batch, params, str(tmp_path),
                       known_events=ev, gtf_accept=accept, log=lambda *a: None)
    n_aligned = sum(1 for v in out["selected"].values() if v)
    assert n_aligned >= 0.9 * batch.size
    sam = open(tmp_path / "accepted_hits.sam").read()
    assert "N" in sam.split("\n")[0] or "XS:A:" in sam  # spliced records exist
