"""tophat-fusion-post equivalent (cli/fusion_post.py): filtering,
annotation, scoring and report emission."""

import os

import pytest

FT = "/root/reference/fusion_test"


@pytest.fixture(scope="module")
def fusion_run(tmp_path_factory):
    """One fusion-search pipeline run laid out as tophat_<sample>/."""
    from tophat_tpu.index.fasta import read_fasta
    from tophat_tpu.io.fastq import batch_reads, read_all
    from tophat_tpu.pipeline.params import Params
    from tophat_tpu.pipeline.run import run_pipeline

    root = tmp_path_factory.mktemp("fpost")
    genome = read_fasta(os.path.join(FT, "testcases", "test.fa"))
    batch = batch_reads(list(read_all(
        os.path.join(FT, "test_fusion_inter.fasta"))))
    params = Params(max_intron_length=500, fusion_search=True,
                    fusion_min_dist=500)
    run_pipeline(genome, batch, params, str(root / "tophat_s1"),
                 log=lambda *a: None)
    return root


@pytest.mark.skipif(not os.path.exists(FT), reason="reference unavailable")
def test_fusion_post_end_to_end(fusion_run, monkeypatch):
    from tophat_tpu.cli.fusion_post import main

    monkeypatch.chdir(fusion_run)
    rc = main(["--no-filter-by-annotation", "--num-fusion-reads", "1",
               "--num-fusion-pairs", "0",
               os.path.join(FT, "testcases", "test.fa")])
    assert rc == 0
    out = fusion_run / "tophatfusion_out"
    assert (out / "sample_list.txt").read_text().strip() == "s1"

    # potential_fusion.txt: 6-line blocks (reference format,
    # tophat-fusion-post:884-897)
    lines = (out / "potential_fusion.txt").read_text().splitlines()
    assert len(lines) % 6 == 0 and len(lines) > 0
    head = lines[0].split(" ")
    assert head[0] == "s1" and "-" in head[1]
    assert head[4] in ("ff", "fr", "rf", "rr")
    assert len(lines[1].split(" ")) == 2  # flank with break marker space
    assert len(lines[1].replace(" ", "")) == 100
    depth_l, depth_r = lines[3].split(" ")
    assert len(depth_l) == 50 and len(depth_r) == 50
    assert len(lines[4].split()) == 4  # gene1 where1 gene2 where2

    # kmer map: every 23-mer placed at least once (flanks come from the
    # genome, so self-placement must exist)
    kmap = (out / "fusion_seq.map").read_text().splitlines()
    assert kmap and all("\t" in ln and ":" in ln for ln in kmap)

    # read alignments panels exist for reported fusions
    panels = os.listdir(out / "read_alignments")
    assert panels

    # result.txt: sample gene1 chr1 left gene2 chr2 right reads pairs
    # pairs_fusion score (reference :2302-2313)
    raw = (out / "result.txt").read_text().splitlines()
    # no blastn in this env: the skip must be asserted loudly in the
    # result file itself, not only in a log line
    assert raw and raw[0].startswith("# WARNING: blastn re-check stage")
    res = [ln for ln in raw if not ln.startswith("#")]
    assert res
    t = res[0].split("\t")
    assert len(t) == 11 and t[0] == "s1"
    int(t[3]), int(t[6]), int(t[7])
    float(t[10])
    html = (out / "result.html").read_text()
    assert "<TABLE" in html and "Candidate fusion list" in html


def test_gene_annotation_lookup(tmp_path):
    """gene_at classification (reference gene_exists :604-652) and
    load_gene_list overlap pruning."""
    from tophat_tpu.cli.fusion_post import gene_at, load_gene_list

    # refGene.txt row: bin name chrom strand txStart txEnd cdsStart cdsEnd
    # exonCount exonStarts exonEnds score name2 ...
    rows = [
        "0\tNM_1\tchr1\t+\t100\t500\t100\t500\t2\t100,300,\t200,500,\t0"
        "\tGENEA\tcmpl\tcmpl\t0,0,",
        "0\tNM_2\tchr1\t+\t120\t400\t120\t400\t1\t120,\t400,\t0"
        "\tGENEB\tcmpl\tcmpl\t0,",   # contained in GENEA: pruned
        "0\tNM_3\tchr2\t-\t50\t90\t50\t90\t1\t50,\t90,\t0"
        "\tGENEC\tcmpl\tcmpl\t0,",
    ]
    path = tmp_path / "refGene.txt"
    path.write_text("\n".join(rows) + "\n")
    chr_order = {"chr1": 0, "chr2": 1}
    genes = load_gene_list(str(path), chr_order)
    assert [g[4] for g in genes] == ["GENEA", "GENEC"]

    name, name2, where, belong, sense = gene_at(
        genes, chr_order, "chr1", 199, "f", True)
    assert name2 == "GENEA" and where.startswith("exon1") and belong
    _, _, where, _, _ = gene_at(genes, chr_order, "chr1", 250, "f", True)
    assert where.startswith("intron")
    assert gene_at(genes, chr_order, "chr2", 5000, "f", True)[0] == "N/A"


def test_seq_divergence():
    """how_diff DP semantics (reference :654-700): identical sequences
    score 0, unrelated ones score high."""
    from tophat_tpu.cli.fusion_post import seq_divergence

    assert seq_divergence("ACGTACGTACGTACGTACGT",
                          "ACGTACGTACGTACGTACGT") == 0
    assert seq_divergence("AAAAAAAAAAAAAAAAAAAA",
                          "CCCCCCCCCCCCCCCCCCCC") >= 15
    # one mismatch costs 1
    assert seq_divergence("ACGTACGTAC", "ACGTTCGTAC") == 1


def test_transcript_distance_shortcuts():
    """Junctions shorten transcript-space distances
    (compute_transcript_map :439-487)."""
    from tophat_tpu.cli.fusion_post import _TMap

    juncs = {"chr1": [(1000, 2001, "+")]}  # intron 1000..2000
    tm = _TMap(juncs, "chr1", 500, 2500, "+", 2400)
    # upstream of the intron: distance skips it (length-1 shortcut)
    genomic = 2400 - 800
    transcript = abs(tm.at(800))
    assert transcript < genomic - 900  # ~1000bp intron collapsed
    # downstream (no junction crossed): genomic distance
    assert abs(tm.at(2450)) == 50
