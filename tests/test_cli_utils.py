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
