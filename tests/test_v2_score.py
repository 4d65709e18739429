"""--v2-sam AlignStatus rescoring (reference: src/align_status.cpp:37-250):
junction penalties arbitrate ties the v1 edit-distance ranking cannot — a
GTF-matched junction (penalty 2) outranks an equally-clean novel junction
(penalty up to 8), so a read placeable across either reports only the
annotated one under --v2-sam while v1 reports both."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    from tophat_tpu.index.fasta import Genome, decode_seq
    from tophat_tpu.io.fastq import batch_reads
    from tophat_tpu.ops.events import MAX_INS
    from tophat_tpu.ops.splice import KIND_JUNCTION
    from tophat_tpu.pipeline.params import Params
    from tophat_tpu.pipeline.run import run_pipeline

    tmp_path = tmp_path_factory.mktemp("v2")
    rng = np.random.default_rng(71)
    N = 40_000
    codes = rng.integers(0, 4, N).astype(np.int8)
    L = 60
    X = rng.integers(0, 4, L).astype(np.int8)

    def plant(a, il):
        codes[a - 30: a] = X[:30]
        codes[a + il: a + il + 30] = X[30:]
        codes[a] = 2
        codes[a + 1] = 3
        codes[a + il - 2] = 0
        codes[a + il - 1] = 2

    a1, il1 = 10_000, 300        # novel junction locus
    a2, il2 = 28_000, 400        # GTF-annotated junction locus
    plant(a1, il1)
    plant(a2, il2)
    genome = Genome(codes=codes, offsets=np.array([0, N]), names=["chrS"])

    recs = [("probe", decode_seq(X), b"I" * L)]
    # support reads unique to locus 1 (suffix flank beyond X) so the novel
    # junction is discovered + accepted with support >= 5; splits sit near
    # the 25 bp segment boundary so the 2-segment pair window finds them
    for k in range(8):
        t = 16 + 2 * k
        seq = np.concatenate([codes[a1 - t: a1],
                              codes[a1 + il1: a1 + il1 + L - t]])
        recs.append((f"s{k}", decode_seq(seq), b"I" * L))
    batch = batch_reads(recs)

    known = dict(left=np.array([a2 - 1], np.int32),
                 right=np.array([a2 + il2], np.int32),
                 kind=np.array([KIND_JUNCTION], np.int8),
                 antisense=np.zeros(1, bool),
                 ins_len=np.zeros(1, np.int8),
                 ins_seq=np.full((1, MAX_INS), -1, np.int8))
    accept = {(a2 - 1, a2 + il2, False)}

    outs = {}
    for mode in ("v1", "v2"):
        params = Params(coverage_search=False, v2_sam=(mode == "v2"))
        out = run_pipeline(genome, batch, params,
                           str(tmp_path / mode), known_events=known,
                           gtf_accept=accept, log=lambda *a: None)
        outs[mode] = out["selected"].get(0, [])
    return outs, a1, a2


def test_v1_ties_both_junctions(built):
    outs, a1, a2 = built
    poses = {c.pos for c in outs["v1"]}
    assert poses == {a1 - 30, a2 - 30}, \
        f"v1 edit-distance ranking should tie both placements: {poses}"


def test_v2_prefers_gtf_junction(built):
    outs, a1, a2 = built
    poses = {c.pos for c in outs["v2"]}
    assert poses == {a2 - 30}, \
        f"v2 must keep only the GTF-matched junction placement: {poses}"


def test_v2_sam_gold_composition(tmp_path):
    """--v2-sam on a full gold regression case: v2 scores rank the
    candidates but admission stays the (v1) acceptance path, so junction
    discovery must be unchanged — junctions.bed byte-identical to gold and
    the mapped read set identical to the default-mode run (ties may
    reorder; the aligned set may not change)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import regress as R

    case = "test_SimpleSplicing"
    case_dir = os.path.join(R.CASES_DIR, case)
    args = R.parse_command(case_dir)
    cwd = os.getcwd()
    os.chdir(case_dir)
    try:
        from tophat_tpu.cli.main import main
        main(["-o", str(tmp_path / "v2"), "--v2-sam"] + args)
        main(["-o", str(tmp_path / "v1")] + args)
    finally:
        os.chdir(cwd)

    gold = open(os.path.join(case_dir, "tophat_out",
                             "junctions.bed")).read()
    assert open(tmp_path / "v2" / "junctions.bed").read() == gold

    def mapped(d):
        return {ln.split("\t", 1)[0]
                for ln in open(d / "accepted_hits.sam")
                if not ln.startswith("@")}

    assert mapped(tmp_path / "v2") == mapped(tmp_path / "v1")
    # v2 records must still be calmd-consistent (bases/CIGAR/NM vs genome)
    bad = R.check_nm_consistency(
        str(tmp_path / "v2" / "accepted_hits.sam"),
        os.path.join(R.CASES_DIR, "common_genomes", "fake.fa"))
    assert not bad, bad
