"""FM-index build + backward search vs brute force (SURVEY.md §7 step 1)."""

import numpy as np
import pytest

from tophat_tpu.index.fasta import (Genome, decode_seq, encode_seq,
                                    genome_from_seqs, read_fasta, revcomp)
from tophat_tpu.index.fm import build_fm_index, pack_2bit
from tophat_tpu.index.suffix import bwt_from_sa, suffix_array_doubling
from tophat_tpu.ops.search import backward_search, search_and_resolve


def brute_positions(text: np.ndarray, query: np.ndarray):
    """All exact occurrence positions of query in text (N never matches)."""
    n, l = len(text), len(query)
    if l == 0 or l > n or np.any(query > 3):
        return np.zeros(0, np.int64)
    windows = np.lib.stride_tricks.sliding_window_view(text, l)
    ok = np.all((windows == query) & (windows <= 3), axis=1)
    return np.nonzero(ok)[0]


def test_suffix_array_matches_naive(rng):
    for n in [1, 2, 5, 33, 200]:
        codes = rng.integers(0, 4, n).astype(np.int8)
        sa = suffix_array_doubling(codes)
        # naive: sort suffixes of T$ lexicographically ($ smallest)
        s = decode_seq(codes).replace("N", "A") + "!"  # '!' < 'ACGT'
        naive = sorted(range(n + 1), key=lambda i: s[i:])
        assert sa.tolist() == naive


def test_bwt_roundtrip(rng):
    codes = rng.integers(0, 4, 101).astype(np.int8)
    sa = suffix_array_doubling(codes)
    bwt, primary = bwt_from_sa(codes, sa)
    assert bwt.shape[0] == 102
    assert sa[primary] == 0


def test_pack_2bit():
    codes = np.array([0, 1, 2, 3] * 9, np.int8)  # 36 codes -> 3 words
    packed = pack_2bit(codes)
    assert packed.shape == (3,)
    for i, c in enumerate(codes):
        assert (packed[i // 16] >> (2 * (i % 16))) & 3 == c


@pytest.mark.parametrize("n,nq", [(200, 50), (1000, 100)])
def test_backward_search_random(rng, n, nq):
    codes = rng.integers(0, 4, n).astype(np.int8)
    fm = build_fm_index(codes)
    L = 20
    queries = np.full((nq, L), -1, np.int32)
    expected_counts = []
    for i in range(nq):
        ql = int(rng.integers(4, L + 1))
        if i % 3 == 0:  # planted queries guaranteed to occur
            start = int(rng.integers(0, n - ql))
            q = codes[start:start + ql]
        else:
            q = rng.integers(0, 4, ql).astype(np.int8)
        queries[i, L - ql:] = q
        expected_counts.append(len(brute_positions(codes, q)))

    lo, hi = backward_search(fm, queries)
    np.testing.assert_array_equal(np.asarray(hi - lo), expected_counts)

    pos, valid, counts, trunc = search_and_resolve(fm, queries, max_hits=32)
    for i in range(nq):
        ql = int(np.sum(queries[i] >= 0)) + int(np.sum(queries[i] == -1) == 0) * 0
        q = queries[i][queries[i] != -1]
        got = np.sort(np.asarray(pos[i])[np.asarray(valid[i])])
        exp = brute_positions(codes, q)
        if not trunc[i]:
            np.testing.assert_array_equal(got, exp)


def test_search_with_n_in_query(rng):
    codes = rng.integers(0, 4, 300).astype(np.int8)
    fm = build_fm_index(codes)
    q = np.concatenate([codes[10:20], [4], codes[21:30]]).astype(np.int32)
    lo, hi = backward_search(fm, q[None, :])
    assert int(hi[0] - lo[0]) == 0


def test_search_n_region_genome_is_searchable_but_flagged():
    # Ns in the genome become A in the FM text; fm.genome keeps the 4s
    g = genome_from_seqs([("c1", "ACGTNNNNACGT")])
    fm = build_fm_index(g)
    assert (np.asarray(fm.genome) == 4).sum() == 4


def test_fake_genome_search(fake_genome):
    fm = build_fm_index(fake_genome)
    codes = fake_genome.codes
    # every 24-mer of the genome must be found at its own position
    starts = np.arange(0, fake_genome.n - 24, 7)
    queries = np.stack([codes[s:s + 24] for s in starts]).astype(np.int32)
    pos, valid, counts, trunc = search_and_resolve(fm, queries, max_hits=8)
    for row, s in enumerate(starts):
        got = np.asarray(pos[row])[np.asarray(valid[row])]
        assert s in got


def test_revcomp():
    q = encode_seq("ACGTN")
    assert decode_seq(revcomp(q)) == "NACGT"


def test_multi_contig_coords():
    g = genome_from_seqs([("a", "ACGT" * 5), ("b", "GGGG" * 3)])
    assert g.num_contigs == 2 and g.n == 32
    cid, local = g.global_to_contig(np.array([0, 19, 20, 31]))
    np.testing.assert_array_equal(cid, [0, 0, 1, 1])
    np.testing.assert_array_equal(local, [0, 19, 0, 11])


def test_kmer_seed_table_equivalence(rng):
    codes = rng.integers(0, 4, 2000).astype(np.int8)
    fm0 = build_fm_index(codes)
    fm6 = build_fm_index(codes, kmer_k=6)
    L = 14
    queries = np.full((64, L), -1, np.int32)
    for i in range(64):
        ql = int(rng.integers(4, L + 1))  # some shorter than k
        if i % 2:
            s = int(rng.integers(0, 2000 - ql))
            q = codes[s:s + ql]
        else:
            q = rng.integers(0, 4, ql)
        queries[i, L - ql:] = q
    lo0, hi0 = (np.asarray(x) for x in backward_search(fm0, queries))
    lo6, hi6 = (np.asarray(x) for x in backward_search(fm6, queries))
    # empty intervals may collapse at different rows; compare match sets
    np.testing.assert_array_equal(np.maximum(hi0 - lo0, 0),
                                  np.maximum(hi6 - lo6, 0))
    nonempty = hi0 > lo0
    np.testing.assert_array_equal(lo0[nonempty], lo6[nonempty])
    np.testing.assert_array_equal(hi0[nonempty], hi6[nonempty])


def test_sampled_sa_equivalence(rng):
    codes = rng.integers(0, 4, 3000).astype(np.int8)
    fm_full = build_fm_index(codes)
    from tophat_tpu.ops.search import resolve_sa

    for rate in (4, 16):
        fm_s = build_fm_index(codes, sa_rate=rate)
        assert fm_s.sa.shape[0] == 0
        idx = rng.integers(0, 3001, 256)
        full = np.asarray(resolve_sa(fm_full, np.asarray(idx, np.int32)))
        samp = np.asarray(resolve_sa(fm_s, np.asarray(idx, np.int32)))
        np.testing.assert_array_equal(full, samp)


def test_dual_pack_verify_equivalence():
    """The appended 8-shifted genome pack (FMIndex.pg_dual) must give
    bit-identical mismatch counts to the plain W+1-gather path, at every
    window alignment and for N bases."""
    import numpy as np
    import jax.numpy as jnp

    from tophat_tpu.index.fm import build_fm_index, ensure_dual_pack
    from tophat_tpu.ops.verify import count_mismatches_packed, pack_reads

    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, 40_000).astype(np.int8)
    codes[rng.integers(0, 40_000, 50)] = 4          # sprinkle Ns
    fm = build_fm_index(codes, kmer_k=8)
    assert fm.pg_dual
    nwp = (fm.n + 15) // 16
    legacy_pg = np.asarray(fm.packed_genome)[:nwp]  # strip the copy

    for L in (25, 24, 31, 44, 100):
        B = 64
        reads = np.full((B, L), -1, np.int8)
        lens = np.zeros(B, np.int32)
        pos = np.zeros((B, 4), np.int32)
        for b in range(B):
            p = int(rng.integers(0, 40_000 - L - 20))
            seg = codes[p:p + L].copy()
            if b % 3 == 1:
                seg[int(rng.integers(0, L))] = (seg[0] + 1) % 4
            reads[b] = seg
            lens[b] = L
            pos[b] = [p, p + int(rng.integers(1, 9)), p - 3, p + 15]
        rp, be, le = pack_reads(jnp.asarray(reads), jnp.asarray(lens))
        plain = count_mismatches_packed(legacy_pg, fm.n_mask,
                                        jnp.asarray(pos), rp, be, le, L)
        dual = count_mismatches_packed(fm.packed_genome, fm.n_mask,
                                       jnp.asarray(pos), rp, be, le, L,
                                       dual_nwp=nwp)
        assert np.array_equal(np.asarray(plain), np.asarray(dual)), L

    # legacy-cache upgrade path
    import dataclasses

    legacy = dataclasses.replace(fm, packed_genome=legacy_pg,
                                 pg_dual=False)
    up = ensure_dual_pack(legacy)
    assert up.pg_dual
    assert np.array_equal(np.asarray(up.packed_genome),
                          np.asarray(fm.packed_genome))
