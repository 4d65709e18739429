"""Bowtie2-mode initial alignment (--b2): direct gapped alignment of IUM
reads under the driver's score floor 6*mm + 5 + 3*gap <= 6*read_edit_dist + 2
(reference: src/tophat.py:2253-2337 bowtie2 option assembly; rdg/rfg 5,3 and
mp 6,2 defaults).

The fixture reads carry an indel placed so that the segment-pair discovery
path CANNOT recover it (the indel-bearing segment has no ungapped hit, so no
adjacent-segment pair forms) — only the direct gapped aligner finds these
reads, and the read-gap-length/read-edit-dist flags gate it.
"""

import numpy as np
import pytest

from tophat_tpu.index.fasta import Genome, decode_seq
from tophat_tpu.io.fastq import batch_reads
from tophat_tpu.pipeline.params import Params
from tophat_tpu.pipeline.run import run_pipeline


def _fixture(rng, indel):
    """Reads of 40bp over a 6000bp genome; with segment_length 20 the read
    splits 20+20. The event sits 10bp into the SECOND segment: the first
    segment maps clean, the second has no ungapped placement."""
    n = 6000
    codes = rng.integers(0, 4, n).astype(np.int8)
    genome = Genome(codes=codes, offsets=np.array([0, n]), names=["chrT"])
    reads = []
    for i in range(4):
        s = 1000 + 97 * i                  # prefix [s, s+30)
        if indel > 0:                      # deletion of `indel` genome bases
            seq = np.concatenate([codes[s:s + 30],
                                  codes[s + 30 + indel:s + 40 + indel]])
        else:                              # insertion of |indel| read bases
            ins = rng.integers(0, 4, -indel).astype(np.int8)
            seq = np.concatenate([codes[s:s + 30], ins,
                                  codes[s + 30:s + 40 + indel]])
        assert len(seq) == 40
        reads.append((f"r{i}", decode_seq(seq), b"I" * 40))
    return genome, batch_reads(reads)


def _run(genome, batch, tmp_path, **kw):
    params = Params(segment_length=20, coverage_search=False, **kw)
    return run_pipeline(genome, batch, params, str(tmp_path),
                        log=lambda *a: None)


@pytest.mark.parametrize("indel,op", [(2, "D"), (-2, "I")])
def test_b2_recovers_indel_without_segment_search(indel, op, tmp_path):
    rng = np.random.default_rng(7)
    genome, batch = _fixture(rng, indel)

    out = _run(genome, batch, tmp_path / "off")
    n_off = sum(len(v) for v in out["selected"].values())
    assert n_off == 0, "fixture leak: segment path recovered the indel"

    out = _run(genome, batch, tmp_path / "on", bowtie2=True)
    n_on = sum(len(v) for v in out["selected"].values())
    assert n_on == 4, "bowtie2 mode must align all 4 indel reads"
    sam = open(tmp_path / "on" / "accepted_hits.sam").read()
    assert f"2{op}" in sam.replace("\t", " ")
    bed = open(tmp_path / "on" /
               ("deletions.bed" if op == "D" else "insertions.bed")).read()
    assert len(bed.splitlines()) >= 2, "event missing from BED track"


def test_b2_score_floor_flags_gate_the_path(tmp_path):
    rng = np.random.default_rng(7)
    genome, batch = _fixture(rng, 2)

    # read-edit-dist 0 -> floor 2 < minimum gap penalty 5+3: nothing aligns
    out = _run(genome, batch, tmp_path / "strict", bowtie2=True,
               read_edit_dist=0)
    assert sum(len(v) for v in out["selected"].values()) == 0

    # read-gap-length 1 -> a 2bp deletion is out of reach
    out = _run(genome, batch, tmp_path / "nogap", bowtie2=True,
               read_gap_length=1)
    assert sum(len(v) for v in out["selected"].values()) == 0


def test_b2_multihit_gapped_nh(tmp_path):
    """Repetitive region: a gapped read whose indel placement exists at TWO
    genome copies must report both (NH=2) — the bowtie2 -k multi-hit
    contract (reference: src/tophat.py:2286-2353 runs bowtie2 in -k K
    end-to-end mode; round-3 review task 5)."""
    rng = np.random.default_rng(13)
    n = 8000
    codes = rng.integers(0, 4, n).astype(np.int8)
    # two identical 60bp copies far apart
    unit = rng.integers(0, 4, 60).astype(np.int8)
    codes[1000:1060] = unit
    codes[5000:5060] = unit
    genome = Genome(codes=codes, offsets=np.array([0, n]), names=["chrT"])
    # read = unit prefix 30 + deletion of 2 + next 10 of unit
    seq = np.concatenate([unit[:30], unit[32:42]])
    batch = batch_reads([("m0", decode_seq(seq), b"I" * 40)])

    out = _run(genome, batch, tmp_path / "multi", bowtie2=True,
               report_secondary=False)
    sel = out["selected"].get(0, [])
    assert len(sel) == 2, f"expected NH=2 tied gapped placements, got " \
        f"{[(c.pos, c.gap) for c in sel]}"
    assert {c.pos for c in sel} == {1000, 5000}
    sam = (tmp_path / "multi" / "accepted_hits.sam").read_text()
    assert sam.count("NH:i:2") == 2 and "2D" in sam


def test_b2_tuning_surface_changes_admission(tmp_path):
    """--b2-mp / --b2-rdg / --b2-score-min reshape the score model and
    gate admission (VERDICT r4 item 7; reference option assembly
    src/tophat.py:2250-2337)."""
    rng = np.random.default_rng(9)
    genome, batch = _fixture(rng, 1)   # 1bp deletion, 0 mismatches

    def aligned(tmp, **kw):
        out = _run(genome, batch, tmp_path / tmp, bowtie2=True,
                   read_gap_length=3, **kw)
        return sum(1 for v in out["selected"].values()
                   if any(any(o == "D" for o, _ in c.cigar(40))
                          for c in v))

    # default model: penalty 5 + 3 = 8 <= floor 6*2+2 = 14 -> admitted
    assert aligned("dflt") == 4
    # heavier read-gap penalties push the deletion over the floor
    assert aligned("rdg", b2_rdg="20,10") == 0
    # a tightened constant score floor rejects the default-penalty gap
    assert aligned("smin", b2_score_min="C,-7,0") == 0
    # a linear floor scales with read length: -(-0.2*40) = 8 -> admitted
    assert aligned("lin", b2_score_min="L,0,-0.2") == 4

    # mismatch penalty: add 1 mm to each read -> default 6*1+8 = 14 <= 14
    # admitted; --b2-mp 12,4 -> 12+8 = 20 > fixed floor 14 -> rejected
    recs = []
    for i, name in enumerate(batch.names):
        codes = batch.codes[i][:40].copy()
        codes[5] = (codes[5] + 1) % 4
        recs.append((name, decode_seq(codes), b"I" * 40))
    from tophat_tpu.io.fastq import batch_reads as _br

    batch_mm = _br(recs)

    def aligned_mm(tmp, **kw):
        out = _run(genome, batch_mm, tmp_path / tmp, bowtie2=True,
                   read_gap_length=3, **kw)
        return sum(1 for v in out["selected"].values()
                   if any(any(o == "D" for o, _ in c.cigar(40))
                          for c in v))

    assert aligned_mm("mm_dflt", b2_score_min="C,-14,0") == 4
    assert aligned_mm("mm_mp", b2_score_min="C,-14,0", b2_mp="12,4") == 0
