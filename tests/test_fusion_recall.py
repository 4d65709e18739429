"""Fusion harness recall floors (reference: fusion_test/run_test.sh — every
synthetic read is designed to be recoverable in accepted_hits).

One set per family keeps runtime bounded; scripts/fusion_recall.py runs all
16 (currently 2904/2904)."""

import os
import tempfile

import pytest

FT = "/root/reference/fusion_test"

# set -> (min_found, total)
FLOORS = {
    "test_fusion_intra.fasta": (207, 211),
    "test_junction_intra.fasta": (74, 76),
    "test_indel_intra.fasta": (74, 76),
    "test_total_inter.fasta": (356, 363),
}


@pytest.mark.parametrize("name", sorted(FLOORS))
def test_fusion_recall_floor(name):
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
    floor, total = FLOORS[name]
    assert total == len(names_all)
    assert n_found >= floor, (
        f"{name}: recall {n_found}/{total} below floor {floor}")
