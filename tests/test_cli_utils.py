"""CLI utilities + resume."""

import io
import os

from tophat_tpu.cli.utils import bed_to_juncs, sam_juncs


def test_bed_to_juncs_bed12(tmp_path):
    bed = ('track name=junctions description="TopHat junctions"\n'
           "fake\t45\t154\tJUNC00000001\t64\t+\t45\t154\t255,0,0\t2\t"
           "19,16\t0,93\n")
    out = io.StringIO()
    n = bed_to_juncs(io.StringIO(bed), out)
    assert n == 1
    # left = 45 + 0 + 19 - 1 = 63, right = 45 + 93 = 138
    assert out.getvalue() == "fake\t63\t138\t+\n"


def test_sam_juncs(tmp_path):
    sam = ("read1\t0\tfake\t46\t255\t19M74N5M\t*\t0\t0\tACGT\tIIII\t"
           "NM:i:0\tXS:A:+\tNH:i:1\n")
    p = tmp_path / "a.sam"
    p.write_text(sam)
    out = io.StringIO()
    n = sam_juncs(str(p), out)
    assert n == 1
    # pos0 = 45, 19M ends at 64 -> junction left 63, right 63+1+74 = 138
    assert out.getvalue() == "fake\t63\t138\t+\n"


def test_resume(tmp_path):
    from tophat_tpu.cli.main import main

    out = tmp_path / "out"
    args = ["-o", str(out), "--segment-length", "12", "--solexa1.3-quals",
            "/root/reference/tests/regression_tests/test_cases/"
            "common_genomes/fake",
            "/root/reference/tests/regression_tests/test_cases/"
            "test_SimpleSplicing/input/fakeReads.fq"]
    if not os.path.exists(args[-1]):
        import pytest

        pytest.skip("reference unavailable")
    main(args)
    assert (out / "accepted_hits.sam").exists()
    # resume on a completed run is a fast no-op
    assert main(["-R", str(out)]) == 0


def test_sra_to_solid(tmp_path, capsys):
    from tophat_tpu.cli.utils import main

    fq = tmp_path / "in.fastq"
    fq.write_text("@r1\nT01230\n+\n!IIIII\n@r2\nT11111\n+\n!ABCDE\n")
    assert main(["sra_to_solid", str(fq)]) == 0
    out = capsys.readouterr().out
    assert out == "@r1\nT01230\n+\nIIIII\n@r2\nT11111\n+\nABCDE\n"


def test_contig_to_chr_coords_bed(tmp_path, capsys):
    """Parity with reference src/contig_to_chr_coords -b: contig-relative
    BED intervals shift by the seq_contig.md contig start."""
    from tophat_tpu.cli.utils import main

    md = tmp_path / "seq_contig.md"
    md.write_text(
        "#tax_id\tchr\tstart\tstop\tori\tfeature\tid\ttype\tgroup\tw\n"
        "9606\t1\t10000\t50000\t+\tNT_0001\tGI1\tcontig\tref\t1\n"
        "9606\t2\t2000\t9000\t+\tNT_0002\tGI2\tcontig\tref\t1\n")
    bed = tmp_path / "junctions.bed"
    bed.write_text(
        'track name=junctions description="TopHat junctions"\n'
        "gi|1|ref|NT_0001|\t100\t300\tJUNC1\t5\t+\t100\t300\t255,0,0\t2\t"
        "10,10\t0,190\n"
        "gi|2|ref|NT_0002|\t50\t80\tJUNC2\t3\t-\t50\t80\t255,0,0\t2\t"
        "5,5\t0,25\n")
    assert main(["contig_to_chr_coords", "-b", str(md), str(bed)]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0].startswith("track")
    assert out[1] == ("chr1\t10100\t10300\tJUNC1\t0\t+\t10100\t10300\t"
                      "255,0,0\t2\t1,1\t0,190")
    assert out[2] == ("chr2\t2050\t2080\tJUNC2\t0\t-\t2050\t2080\t"
                      "255,0,0\t2\t1,1\t0,25")


def test_contig_to_chr_coords_gff(tmp_path, capsys):
    from tophat_tpu.cli.utils import main

    md = tmp_path / "seq_contig.md"
    md.write_text(
        "9606\t3\t500\t900\t+\tNT_0003\tGI3\tcontig\tref\t1\n")
    gff = tmp_path / "islands.gff"
    gff.write_text(
        "##gff-version 2\n"
        "gi|3|ref|NT_0003|\tsrc\tisland\t10\t40\t7.5\t+\t.\tgene_x\n")
    assert main(["contig_to_chr_coords", "-g", str(md), str(gff)]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out[1] == "chr3\tTopHat\tisland\t510\t540\t7.5\t.\t.\tgene_x"


def test_contig_to_chr_coords_flag_validation(capsys):
    from tophat_tpu.cli.utils import main

    assert main(["contig_to_chr_coords", "x", "y"]) == 2
    assert main(["contig_to_chr_coords", "-b", "-g", "x", "y"]) == 2
