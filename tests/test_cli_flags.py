"""CLI surface completing the reference flag set (VERDICT r4 items 5/6):
read groups, --integer-quals, --read-realign-edit-dist, -T/-x
transcriptome modes, --no-gtf-juncs, fusion filters.
Reference: src/tophat.py:30-152 usage text."""

import os

import numpy as np
import pytest

CASES = "/root/reference/tests/regression_tests/test_cases"
FAKE = os.path.join(CASES, "common_genomes", "fake.fa")
READS = os.path.join(CASES, "test_SimpleSplicing", "input", "fakeReads.fq")


def _cli(args):
    from tophat_tpu.cli.main import main
    from tophat_tpu.parallel import auto

    os.environ["TOPHAT_TPU_DEVICES"] = "1"
    try:
        return main(args)
    finally:
        os.environ.pop("TOPHAT_TPU_DEVICES", None)
        auto.deactivate()


@pytest.mark.skipif(not os.path.exists(FAKE), reason="reference unavailable")
def test_read_groups(tmp_path):
    """--rg-*: @RG header line (ID/SM + optional fields, reference
    src/tophat.py:1476-1491) and RG:Z on every record
    (tophat_reports.cpp:744)."""
    out = str(tmp_path / "rg")
    _cli(["-o", out, "--segment-length", "12", "--solexa1.3-quals",
          "--rg-id", "RG7", "--rg-sample", "S1", "--rg-library", "L2",
          "--rg-platform", "ILLUMINA", "--rg-center", "C9",
          FAKE, READS])
    sam = open(os.path.join(out, "accepted_hits.sam")).read().splitlines()
    assert sam and all(ln.endswith("RG:Z:RG7") for ln in sam)
    from tophat_tpu.io.bam import read_bam

    hd, _, _, recs = read_bam(os.path.join(out, "accepted_hits.bam"))
    rg = [ln for ln in hd.splitlines() if ln.startswith("@RG")]
    assert rg == ["@RG\tID:RG7\tSM:S1\tLB:L2\tCN:C9\tPI:50\tPL:ILLUMINA"]
    assert ("RG", "Z", "RG7") in recs[0].tags
    # header order: @HD, @RG, @SQ..., @PG (reference get_index_sam_header)
    lines = hd.splitlines()
    assert lines[0].startswith("@HD") and lines[1].startswith("@RG")


def test_rg_id_requires_sample(tmp_path):
    with pytest.raises(SystemExit):
        _cli(["-o", str(tmp_path), "--rg-id", "X", FAKE, READS])


def test_integer_quals(tmp_path):
    """--integer-quals: space-delimited numeric quality lines
    (reference: ReadParams.integer_quals, src/tophat.py:346)."""
    from tophat_tpu.io.fastq import read_all

    fq = tmp_path / "iq.fq"
    fq.write_text("@r1\nACGTACGT\n+\n40 40 35 2 0 30 30 30\n")
    recs = list(read_all(str(fq), "phred33", integer_quals=True))
    assert recs[0][0] == "r1"
    assert recs[0][2] == bytes([73, 73, 68, 35, 33, 63, 63, 63])


def test_read_realign_edit_dist(tmp_path):
    """--read-realign-edit-dist 0: reads that DID map contiguously are
    still pushed through the spliced stages and a better spliced
    placement wins selection (reference usage src/tophat.py:62)."""
    from tophat_tpu.index.fasta import Genome, decode_seq
    from tophat_tpu.io.fastq import batch_reads
    from tophat_tpu.pipeline.params import Params
    from tophat_tpu.pipeline.run import run_pipeline

    rng = np.random.default_rng(41)
    N = 60_000
    codes = rng.integers(0, 4, N).astype(np.int8)
    don, acc = 20_000, 20_300
    codes[don:don + 2] = [2, 3]
    codes[acc - 2:acc] = [0, 2]
    L = 100
    t = 50   # 4 segments, junction on the segment cut -> all segments map
    spliced = np.concatenate([codes[don - t:don], codes[acc:acc + L - t]])
    # plant a 2-mm contiguous decoy of the spliced sequence far away
    decoy = spliced.copy()
    decoy[10] = (decoy[10] + 1) % 4
    decoy[40] = (decoy[40] + 1) % 4
    codes[50_000:50_000 + L] = decoy
    genome = Genome(codes=codes, offsets=np.array([0, N]), names=["chrR"])
    batch = batch_reads([("r0", decode_seq(spliced), b"I" * L)])

    def spliced_sel(params):
        out = run_pipeline(genome, batch, params,
                           str(tmp_path / f"rre{params.read_realign_edit_dist}"),
                           log=lambda *a: None)
        return [c for c in out["selected"].get(0, [])
                if any(op == "N" for op, _ in c.cigar(L))]

    # default: the contiguous 2-mm decoy placement satisfies the mapper,
    # the read never reaches the spliced stages
    assert not spliced_sel(Params(coverage_search=False))
    # realign-edit-dist 2: best alignment has mm >= 2 -> realign; the
    # 0-mm spliced placement wins
    sel = spliced_sel(Params(coverage_search=False,
                             read_realign_edit_dist=2))
    assert sel and sel[0].mm == 0


def _gtf_fixture(tmp_path, two_copies=False):
    from tophat_tpu.index.fasta import Genome

    rng = np.random.default_rng(23)
    N = 30_000
    codes = rng.integers(0, 4, N).astype(np.int8)
    exons = [(9_000, 9_040), (9_240, 9_252), (9_432, 9_444),
             (9_604, 9_644)]
    if two_copies:
        # duplicate the exon sequences at a second locus + 2nd transcript
        src = np.concatenate([codes[s:e] for s, e in exons])
        exons2 = [(19_000, 19_040), (19_240, 19_252), (19_432, 19_444),
                  (19_604, 19_644)]
        o = 0
        for s, e in exons2:
            codes[s:e] = src[o:o + e - s]
            o += e - s
    genome = Genome(codes=codes, offsets=np.array([0, N]), names=["chrV"])
    gtf = tmp_path / "genes.gtf"
    with open(gtf, "w") as f:
        for s, e in exons:
            f.write(f'chrV\ttest\texon\t{s + 1}\t{e}\t.\t+\t.\t'
                    f'gene_id "g1"; transcript_id "t1";\n')
        if two_copies:
            for s, e in exons2:
                f.write(f'chrV\ttest\texon\t{s + 1}\t{e}\t.\t+\t.\t'
                        f'gene_id "g2"; transcript_id "t2";\n')
    transcript = np.concatenate([codes[s:e] for s, e in exons])
    return genome, gtf, transcript


def test_transcriptome_only(tmp_path):
    """-T: only transcriptome placements are reported; purely genomic
    reads come out unmapped (reference usage src/tophat.py:96)."""
    from tophat_tpu.index.fasta import decode_seq

    genome, gtf, transcript = _gtf_fixture(tmp_path)
    fa = tmp_path / "g.fa"
    with open(fa, "w") as f:
        f.write(">chrV\n" + decode_seq(genome.codes) + "\n")
    fq = tmp_path / "r.fq"
    L = 80
    genomic = decode_seq(genome.codes[2_000:2_000 + L])
    with open(fq, "w") as f:
        f.write(f"@t\n{decode_seq(transcript[:L])}\n+\n{'I' * L}\n")
        f.write(f"@g\n{genomic}\n+\n{'I' * L}\n")
    out = str(tmp_path / "T")
    _cli(["-o", out, "-T", "-G", str(gtf), str(fa), str(fq)])
    sam = open(os.path.join(out, "accepted_hits.sam")).read().splitlines()
    names = {ln.split("\t")[0] for ln in sam}
    assert "t" in names, "transcript read must report in -T mode"
    assert "g" not in names, "-T must not genome-map reads"
    assert any("N" in ln.split("\t")[5] for ln in sam
               if ln.split("\t")[0] == "t")


def test_transcriptome_max_hits(tmp_path):
    """-x 1: a read placing on two transcripts is discarded
    (reference usage src/tophat.py:97)."""
    from tophat_tpu.index.fasta import decode_seq
    from tophat_tpu.io.fastq import batch_reads
    from tophat_tpu.io.gtf import parse_gtf
    from tophat_tpu.pipeline.params import Params
    from tophat_tpu.pipeline.run import run_pipeline
    from tophat_tpu.pipeline.transcriptome import build_transcriptome_index

    from tophat_tpu.io.gtf import gtf_junctions

    genome, gtf, transcript = _gtf_fixture(tmp_path, two_copies=True)
    transcripts = parse_gtf(str(gtf))
    trans = build_transcriptome_index(genome, transcripts)
    gtf_ev, gtf_accept = gtf_junctions(genome, transcripts)
    L = 80
    batch = batch_reads([("t", decode_seq(transcript[:L]), b"I" * L)])
    base = dict(coverage_search=False, transcriptome_only=True)
    kw = dict(trans=trans, known_events=gtf_ev, gtf_accept=gtf_accept,
              log=lambda *a: None)
    out = run_pipeline(genome, batch, Params(**base),
                       str(tmp_path / "x60"), **kw)
    assert out["selected"].get(0), "read places on the duplicated gene"
    out1 = run_pipeline(genome, batch,
                        Params(transcriptome_max_hits=1, **base),
                        str(tmp_path / "x1"), **kw)
    assert not out1["selected"].get(0), "-x 1 must discard the multihit"


def test_no_gtf_juncs(tmp_path):
    """--no-gtf-juncs: annotated junctions lose their automatic
    acceptance — a weakly-supported GTF junction (anchor below
    min_anchor_len) reports with -G but not with -G --no-gtf-juncs
    (reference: skips gtf_juncs, src/tophat.py:94)."""
    from tophat_tpu.index.fasta import decode_seq

    genome, gtf, transcript = _gtf_fixture(tmp_path)
    fa = tmp_path / "g.fa"
    with open(fa, "w") as f:
        f.write(">chrV\n" + decode_seq(genome.codes) + "\n")
    fq = tmp_path / "r.fq"
    # anchors of 5 bp < min_anchor 8 over the first junction only:
    # read = last 5 bases of exon 1 + 59 following transcript bases
    L = 64
    seq = decode_seq(transcript[35:35 + L])
    with open(fq, "w") as f:
        f.write(f"@w\n{seq}\n+\n{'I' * L}\n")
    out_g = str(tmp_path / "withG")
    _cli(["-o", out_g, "-G", str(gtf), str(fa), str(fq)])
    juncs_g = open(os.path.join(out_g, "junctions.bed")).read().splitlines()
    out_n = str(tmp_path / "noGJ")
    _cli(["-o", out_n, "-G", str(gtf), "--no-gtf-juncs", str(fa), str(fq)])
    juncs_n = open(os.path.join(out_n, "junctions.bed")).read().splitlines()
    assert len(juncs_g) > len(juncs_n), (
        "auto-accepted GTF junction must disappear with --no-gtf-juncs")


def test_fusion_ignore_chromosomes_and_multireads(tmp_path):
    """--fusion-ignore-chromosomes filters fusions.out rows by contig;
    --fusion-multireads drops multi-mapped reads from support counts
    (reference usage src/tophat.py:124-126)."""
    from tophat_tpu.index.fasta import Genome
    from tophat_tpu.pipeline.fusion_stats import FusionStat, FusionTable
    from tophat_tpu.pipeline.params import Params
    from tophat_tpu.pipeline.juncs import empty_events

    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, 4000).astype(np.int8)
    genome = Genome(codes=codes, offsets=np.array([0, 2000, 4000]),
                    names=["chr1", "chrM"])
    ev = empty_events()

    def table(params):
        ft = FusionTable(genome, ev, params)
        for g1, g2 in ((100, 2_500), (300, 1_200)):
            st = ft.stats[(g1, g2, "ff")] = FusionStat()
            st.count = 3
        return ft

    p_all = Params(fusion_search=True)
    table(p_all).write(str(tmp_path / "all.out"))
    rows = open(tmp_path / "all.out").read().splitlines()
    assert len(rows) == 2
    p_ign = Params(fusion_search=True, fusion_ignore_chromosomes="chrM")
    table(p_ign).write(str(tmp_path / "ign.out"))
    rows = open(tmp_path / "ign.out").read().splitlines()
    assert len(rows) == 1 and "chrM" not in rows[0]

    # multireads: a read with 3 placements must not add support
    from tophat_tpu.pipeline.fusion_stats import build_fusion_table
    from tophat_tpu.io.fastq import batch_reads

    batch = batch_reads([("m", b"A" * 30, b"I" * 30)])

    class _C:  # minimal candidate stub the support path inspects
        kind = -1
        pos = 100
        strand = 0
        t = 0
        chain_ops = ()

    sel = {0: [_C(), _C(), _C()]}
    ft = build_fusion_table(genome, ev, Params(fusion_search=True,
                                               fusion_multireads=2),
                            [(batch, sel)])
    assert not ft.stats, "3-hit read counted despite --fusion-multireads 2"
