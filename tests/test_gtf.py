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


def test_transcriptome_index_files(sim_genome, tmp_path):
    """gtf_to_fasta artifact set: .fa/.fa.tlst/.gff/.ver round trip +
    map2gtf coordinate conversion (reference: GTFToFasta.cpp:60,
    map2gtf.cpp:234, tophat.py:3821 validate_transcriptome)."""
    from tophat_tpu.io.gtf import (load_tlst, parse_gtf, trans_to_genomic,
                                   transcript_sequence,
                                   validate_transcriptome,
                                   write_transcriptome_files)

    gtf = os.path.join(SIM, "ref_genes.gtf")
    transcripts = parse_gtf(gtf)
    prefix = str(tmp_path / "known")
    fa = write_transcriptome_files(prefix, sim_genome, transcripts, gtf)
    assert validate_transcriptome(prefix)
    # corrupting the .ver must invalidate
    open(prefix + ".ver", "w").write("1 0 0\n")
    assert not validate_transcriptome(prefix)
    open(prefix + ".ver", "w").write(
        "209 %d %d\n" % (os.path.getsize(prefix + ".gff"),
                         os.path.getsize(fa)))
    assert validate_transcriptome(prefix)

    back = load_tlst(prefix + ".fa.tlst")
    assert len(back) == len([t for t in transcripts.values() if t.exons])
    by_key = {(t.tid, t.chrom): t for t in back}
    for tr in transcripts.values():
        assert by_key[(tr.tid, tr.chrom)].exons == tr.exons

    # FASTA record sequence == concatenated exons
    from tophat_tpu.index.fasta import decode_seq
    recs = {}
    key = None
    for line in open(fa):
        if line.startswith(">"):
            parts = line[1:].split()
            key = (parts[1], parts[2][:-1])  # (tid, chrom)
            recs[key] = []
        else:
            recs[key].append(line.strip())
    for tr in transcripts.values():
        assert "".join(recs[(tr.tid, tr.chrom)]) == decode_seq(
            transcript_sequence(sim_genome, tr))

    # coordinate conversion: a read spanning the first junction of isoformB
    tr = transcripts["isoformB"]
    exon0_len = tr.exons[0][1] - tr.exons[0][0]
    pos = exon0_len - 10  # last 10 bases of exon 0
    gpos, cig = trans_to_genomic(tr.exons, pos, [("M", 20)])
    assert gpos == tr.exons[0][1] - 10
    intron = tr.exons[1][0] - tr.exons[0][1]
    assert cig == [("M", 10), ("N", intron), ("M", 10)]


def test_map2gtf_utility(sim_genome, tmp_path):
    from tophat_tpu.cli.utils import gtf_to_fasta, map2gtf

    gtf = os.path.join(SIM, "ref_genes.gtf")
    out_fa = str(tmp_path / "trans.fa")
    gtf_to_fasta(gtf, os.path.join(SIM, "reference.fa"), out_fa)
    assert os.path.exists(out_fa + ".tlst")

    # a transcriptome-space SAM line against numeric record 0
    from tophat_tpu.io.gtf import load_tlst
    trs = load_tlst(out_fa + ".tlst")
    tr = trs[0]
    exon0_len = tr.exons[0][1] - tr.exons[0][0]
    sam_in = tmp_path / "trans.sam"
    seq = "A" * 20
    sam_in.write_text(
        f"r1\t0\t0\t{exon0_len - 9}\t255\t20M\t*\t0\t0\t{seq}\t"
        f"{'I' * 20}\tNM:i:0\n"
        f"r1\t256\t0\t{exon0_len - 9}\t255\t20M\t*\t0\t0\t{seq}\t"
        f"{'I' * 20}\tNM:i:0\n")  # duplicate (secondary) must dedup
    out_sam = tmp_path / "genome.sam"
    n = map2gtf(out_fa + ".tlst", str(sam_in), str(out_sam),
                os.path.join(SIM, "reference.fa"))
    assert n == 1
    lines = [l for l in out_sam.read_text().splitlines()
             if not l.startswith("@")]
    t = lines[0].split("\t")
    assert t[2] == tr.chrom
    assert int(t[3]) == tr.exons[0][1] - 10 + 1
    intron = tr.exons[1][0] - tr.exons[0][1]
    assert t[5] == f"10M{intron}N10M"
    assert f"XS:A:{tr.strand}" in lines[0]
