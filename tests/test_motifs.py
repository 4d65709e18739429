"""Non-canonical splice motif classes GC-AG and AT-AC (reference runs
juncs_from_ref_segs once per class in the split-segment search,
segment_juncs.cpp:3618-3648), plus the antisense variants."""

import numpy as np
import pytest

from tophat_tpu.index.fasta import Genome, decode_seq


def _mk_genome(rng, n=4000):
    codes = rng.integers(0, 4, n).astype(np.int8)
    return Genome(codes=codes, offsets=np.array([0, n]), names=["chrT"])


def _plant(genome, left, right, donor, acceptor):
    """Set intron-start dinucleotide (genome[left+1:left+3]) and intron-end
    dinucleotide (genome[right-2:right])."""
    code = {"A": 0, "C": 1, "G": 2, "T": 3}
    genome.codes[left + 1] = code[donor[0]]
    genome.codes[left + 2] = code[donor[1]]
    genome.codes[right - 2] = code[acceptor[0]]
    genome.codes[right - 1] = code[acceptor[1]]


def _run(genome, left, right, tmp_path):
    from tophat_tpu.io.fastq import batch_reads
    from tophat_tpu.pipeline.params import Params
    from tophat_tpu.pipeline.run import run_pipeline

    reads = []
    for i in range(4):
        seq = np.concatenate([genome.codes[left - 17 - i:left + 1],
                              genome.codes[right:right + 18 + i]])
        reads.append((f"r{i}", decode_seq(seq), b"I" * len(seq)))
    batch = batch_reads(reads)
    params = Params(segment_length=12, coverage_search=False)
    return run_pipeline(genome, batch, params, str(tmp_path),
                        log=lambda *a: None)


@pytest.mark.parametrize("donor,acceptor,antisense", [
    ("GC", "AG", False),   # GC-AG sense
    ("AT", "AC", False),   # AT-AC sense
    ("CT", "GC", True),    # GC-AG antisense (revcomp)
    ("GT", "AT", True),    # AT-AC antisense (revcomp)
])
def test_noncanonical_motif_junction(donor, acceptor, antisense, tmp_path):
    rng = np.random.default_rng(13)
    genome = _mk_genome(rng)
    left, right = 1000, 1600
    _plant(genome, left, right, donor, acceptor)
    out = _run(genome, left, right, tmp_path)
    ev = out["events"]
    hits = {(int(l), int(r)): bool(a)
            for l, r, a in zip(ev["left"], ev["right"], ev["antisense"])}
    assert (left, right) in hits, "junction not discovered"
    assert hits[(left, right)] == antisense
    sam = open(tmp_path / "accepted_hits.sam").read()
    want = "XS:A:-" if antisense else "XS:A:+"
    assert want in sam
    bed = open(tmp_path / "junctions.bed").read()
    strand = "-" if antisense else "+"
    assert f"\t{strand}\t" in bed
