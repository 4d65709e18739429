"""Fusion harness recall — the FULL 16-set matrix (reference:
fusion_test/run_test.sh; every synthetic read is designed to be recoverable
in accepted_hits). Round-2 result 2904/2904 is asserted exactly: each set
must recover every read (VERDICT r2 weak item 7 — no subset floors)."""

import os
import tempfile

import pytest

FT = "/root/reference/fusion_test"

# set -> total reads (recall must be 100%: found == total)
TOTALS = {
    "test_fusion_inter.fasta": 211,
    "test_fusion_inter2.fasta": 211,
    "test_fusion_intra.fasta": 211,
    "test_fusion_intra2.fasta": 211,
    "test_indel_inter.fasta": 76,
    "test_indel_inter2.fasta": 76,
    "test_indel_intra.fasta": 76,
    "test_indel_intra2.fasta": 76,
    "test_junction_inter.fasta": 76,
    "test_junction_inter2.fasta": 76,
    "test_junction_intra.fasta": 76,
    "test_junction_intra2.fasta": 76,
    "test_total_inter.fasta": 363,
    "test_total_inter2.fasta": 363,
    "test_total_intra.fasta": 363,
    "test_total_intra2.fasta": 363,
}
assert sum(TOTALS.values()) == 2904


@pytest.mark.parametrize("name", sorted(TOTALS))
def test_fusion_recall_full(name):
    if not os.path.isdir(FT):
        pytest.skip("reference fusion_test unavailable")
    from tophat_tpu.cli.main import main

    fasta = os.path.join(FT, name)
    out = os.path.join(tempfile.mkdtemp(prefix="fusion_recall_"), name)
    main(["-o", out, "--fusion-search", "--bowtie1",
          "--fusion-do-not-resolve-conflicts", "--max-intron-length", "500",
          "--fusion-min-dist", "500",
          os.path.join(FT, "testcases", "test.fa"), fasta])
    names_all = [l[1:].strip() for l in open(fasta) if l.startswith(">")]
    found = set()
    with open(os.path.join(out, "accepted_hits.sam")) as f:
        for line in f:
            if not line.startswith("@"):
                found.add(line.split("\t", 1)[0])
    n_found = sum(1 for n in names_all if n in found)
    assert len(names_all) == TOTALS[name]
    assert n_found == TOTALS[name], (
        f"{name}: recall {n_found}/{TOTALS[name]} — fusion recall "
        "regressed below 100%")
