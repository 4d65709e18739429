"""Default-mode (non-fusion) multi-event chain stitching: reads crossing
two or three introns must align with multi-N CIGARs in a plain run — the
reference's dfs_seg_hits / merge_chain join works for every read by default
(reference: src/long_spanning_reads.cpp:2222, :805)."""

import numpy as np
import pytest


def _make_multi_junction_fixture(seed=11):
    """Random 40 kb genome with a 4-exon gene (60/30/30/60 bp exons,
    GT-AG introns of 150-250 bp). Returns (genome, junctions, transcript),
    junctions as [(left_global, right_global)] with left = last exonic base
    and right = first base of the next exon."""
    from tophat_tpu.index.fasta import Genome

    rng = np.random.default_rng(seed)
    N = 40_000
    codes = rng.integers(0, 4, N).astype(np.int8)
    exon_lens = [60, 30, 30, 60]
    intron_lens = [180, 150, 220]
    start = 5_000
    exons = []
    p = start
    for i, el in enumerate(exon_lens):
        exons.append((p, p + el))
        if i < len(intron_lens):
            il = intron_lens[i]
            # GT...AG motif so split-segment discovery admits the junction
            codes[p + el] = 2       # G
            codes[p + el + 1] = 3   # T
            codes[p + el + il - 2] = 0  # A
            codes[p + el + il - 1] = 2  # G
            p = p + el + il
    juncs = [(exons[i][1] - 1, exons[i + 1][0]) for i in range(3)]
    transcript = np.concatenate([codes[a:b] for a, b in exons])
    genome = Genome(codes=codes, offsets=np.array([0, N]), names=["chrT"])
    return genome, juncs, transcript, exons


def _expected_cigar(read_start, read_len, exon_lens, intron_lens):
    """CIGAR of a read starting at transcript offset read_start."""
    bounds = np.cumsum(exon_lens)
    ops = []
    pos = read_start
    left = read_len
    for i, b in enumerate(bounds):
        if pos >= b:
            continue
        take = min(b - pos, left)
        ops.append(("M", take))
        pos += take
        left -= take
        if left == 0:
            break
        ops.append(("N", intron_lens[i]))
    return ops


@pytest.mark.parametrize("coverage", [False])
def test_multi_junction_reads_align_default_mode(tmp_path, coverage):
    from tophat_tpu.index.fasta import decode_seq
    from tophat_tpu.io.fastq import batch_reads
    from tophat_tpu.pipeline.params import Params
    from tophat_tpu.pipeline.run import run_pipeline

    genome, juncs, transcript, exons = _make_multi_junction_fixture()
    exon_lens = [60, 30, 30, 60]
    intron_lens = [180, 150, 220]
    L = 100
    T = len(transcript)

    recs = []
    starts = list(range(0, T - L + 1, 2))
    for s in starts:
        seq = transcript[s: s + L]
        recs.append((f"r{s}", decode_seq(seq), b"I" * L))
    batch = batch_reads(recs)

    params = Params(coverage_search=coverage)
    out = run_pipeline(genome, batch, params, str(tmp_path),
                       log=lambda *a: None)

    # which reads span >= 2 junctions (with >= 5 bp in the outer exons)?
    jbounds = np.cumsum(exon_lens)[:-1]  # transcript coords 60, 90, 120
    n_multi = n_multi_ok = 0
    for i, s in enumerate(starts):
        n_cross = int(np.sum((jbounds > s + 4) & (jbounds < s + L - 4)))
        if n_cross < 2:
            continue
        n_multi += 1
        expect = _expected_cigar(s, L, exon_lens, intron_lens)
        sel = out["selected"].get(i, [])
        got = [c.cigar(L) for c in sel if c.strand == 0]
        if expect in got:
            n_multi_ok += 1
    assert n_multi >= 20, f"fixture broken: only {n_multi} multi-junc reads"
    # every multi-junction read must align with the exact multi-N CIGAR
    assert n_multi_ok == n_multi, (
        f"only {n_multi_ok}/{n_multi} multi-junction reads aligned with the "
        f"correct multi-N CIGAR")

    # and the BED track must contain all three junctions
    bed = (tmp_path / "junctions.bed").read_text().splitlines()[1:]
    got_juncs = set()
    for ln in bed:
        t = ln.split("\t")
        block = t[10].split(",")
        lpos = int(t[1]) + int(block[0])   # BED thickStart + left block
        rpos = int(t[2]) - int(block[1])
        got_juncs.add((lpos - 1, rpos))    # back to (last exonic, first next)
    for (l, r) in juncs:
        assert (l, r) in got_juncs, f"junction {(l, r)} missing from BED"


def test_junction_plus_deletion_chain(tmp_path):
    """A read crossing one intron AND a small deletion chains both events."""
    from tophat_tpu.index.fasta import Genome, decode_seq
    from tophat_tpu.io.fastq import batch_reads
    from tophat_tpu.pipeline.params import Params
    from tophat_tpu.pipeline.run import run_pipeline

    rng = np.random.default_rng(7)
    N = 30_000
    codes = rng.integers(0, 4, N).astype(np.int8)
    # exon1 [8000, 8040), intron 200 (GT..AG), exon2 at 8240
    e1, il = 8_000, 200
    j_left = e1 + 40 - 1
    codes[e1 + 40] = 2
    codes[e1 + 41] = 3
    codes[e1 + 40 + il - 2] = 0
    codes[e1 + 40 + il - 1] = 2
    r0 = e1 + 40 + il            # first base of exon2
    # deletion of 2 bases 30 bp into exon2
    del_at = r0 + 30             # genome bases [del_at, del_at+2) deleted
    genome = Genome(codes=codes, offsets=np.array([0, N]), names=["chrT"])

    L = 100
    recs = []
    for s in range(0, 30, 2):    # read starts inside exon1
        pre = codes[e1 + s: e1 + 40]                   # 40-s exon1 bases
        mid = codes[r0: del_at]                        # 30 exon2 bases
        rest = L - len(pre) - len(mid)
        post = codes[del_at + 2: del_at + 2 + rest]
        seq = np.concatenate([pre, mid, post])
        recs.append((f"d{s}", decode_seq(seq), b"I" * L))
    # support reads for the deletion alone (contig reads crossing it)
    for s in range(0, 40, 4):
        a = del_at - 50 + s
        seq = np.concatenate([codes[a: del_at], codes[del_at + 2:
                                                      a + L + 2]])
        recs.append((f"s{s}", decode_seq(seq[:L]), b"I" * L))
    batch = batch_reads(recs)

    out = run_pipeline(genome, batch, Params(coverage_search=False),
                       str(tmp_path), log=lambda *a: None)
    n_ok = 0
    for i in range(15):
        s = 2 * i
        if s >= 30:
            break
        sel = out["selected"].get(i, [])
        for c in sel:
            cig = c.cigar(L)
            kinds = [op for op, _ in cig]
            # N then D (the deletion may sit at its leftmost-equivalent
            # coordinate, so only the op structure + spans are fixed)
            if (kinds == ["M", "N", "M", "D", "M"] and c.pos == e1 + s
                    and cig[1][1] == il and cig[3][1] == 2
                    and sum(n for op, n in cig if op == "M") == L):
                n_ok += 1
                break
    assert n_ok >= 13, f"only {n_ok}/15 junction+deletion reads chained"
