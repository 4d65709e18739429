"""Batched FM backward search and hit resolution.

Semantics mirror Bowtie's exact backward search (the engine TopHat shells out
to, reference: src/tophat.py:2286-2353): a query's SA interval is narrowed one
character at a time from its last base. Everything is fixed-shape: queries are
left-padded with code -1 (skipped), dead intervals collapse to lo==hi, and
hits resolve into a fixed-width (B, H) position table with a validity mask —
the layout downstream stitch/junction stages consume directly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tophat_tpu.ops.rank import lf, rank


def backward_search(fm, queries):
    """Exact-match SA intervals for a batch of queries.

    queries : (B, L) int32/int8 codes, LEFT-padded with -1 (or any code
              outside 0..3) for shorter queries; column L-1 is every query's
              last base. Codes 4 (N) make a query unmatchable, like Bowtie
              treating N as a mismatch in every position.

    Returns (lo, hi): int32 (B,) SA interval [lo, hi) of full-query matches.
    """
    q = jnp.asarray(queries).astype(jnp.int32)
    B, L = q.shape
    m = fm.n + 1
    C = jnp.asarray(fm.C)

    # k-mer seed table: initialize the interval from the query's last k
    # characters in one table lookup, skipping the first k scan steps
    k = getattr(fm, "kmer_k", 0)
    if k and fm.kmer_lo.shape[0] > 0 and L >= k:
        lastk = q[:, L - k:]
        seedable = jnp.all((lastk >= 0) & (lastk <= 3), axis=1)
        pw = (4 ** jnp.arange(k - 1, -1, -1, dtype=jnp.int32))
        v = jnp.sum(jnp.clip(lastk, 0, 3) * pw[None, :], axis=1)
        klo = jnp.asarray(fm.kmer_lo)[v]
        khi = jnp.asarray(fm.kmer_hi)[v]
        lo0 = jnp.where(seedable, klo, 0)
        hi0 = jnp.where(seedable, khi, m)
        skip = jnp.where(seedable, k, 0)
        # NOTE: even when L == k the scan below must still run — rows that
        # cannot seed (left-padding or an N inside the k-char window, e.g.
        # the half-split engine's 12/13-char queries in k-wide columns)
        # consume their real characters there; seeded rows skip every step.
    else:
        lo0 = jnp.zeros(B, jnp.int32)
        hi0 = jnp.full(B, m, jnp.int32)
        skip = jnp.zeros(B, jnp.int32)

    def step(carry, ct):
        c, t = ct
        lo, hi = carry
        is_n = c > 3                      # N: unmatchable, kill the interval
        do = ((c >= 0) & ~is_n & (lo < hi)
              & (t >= skip))              # pad (-1)/dead/seeded: untouched
        cc = jnp.clip(c, 0, 3)
        nlo = jnp.where(do, C[cc] + rank(fm, cc, lo), lo)
        nhi = jnp.where(do, C[cc] + rank(fm, cc, hi), hi)
        nhi = jnp.where(is_n & (t >= skip), nlo, nhi)
        return (nlo, nhi), None

    ts = jnp.arange(L, dtype=jnp.int32)
    (lo, hi), _ = jax.lax.scan(step, (lo0, hi0),
                               (q.T[::-1], ts))  # last base first
    return lo, hi


def resolve_sa(fm, idx):
    """SA values for BWT rows `idx` (any shape). With a full SA this is one
    gather; with text-order sampling (fm.sa_rate > 0) it LF-walks each row
    to the nearest marked row (<= sa_rate - 1 steps, statically bounded) —
    the classic FM-index space/time dial, sized so chromosome-scale indexes
    fit one chip's HBM."""
    if fm.sa_rate == 0:
        sa = jnp.asarray(fm.sa)
        return sa[jnp.clip(idx, 0, sa.shape[0] - 1)]

    marks = jnp.asarray(fm.sa_marks)
    ck = jnp.asarray(fm.sa_mark_ck)
    mark_mid = jnp.asarray(fm.sa_mark_mid)
    samples = jnp.asarray(fm.sa_samples)
    packed_bwt = jnp.asarray(fm.packed_bwt)
    occ_ck = jnp.asarray(fm.occ_ck)
    occ_mid = jnp.asarray(fm.occ_mid)
    C = jnp.asarray(fm.C)
    m = fm.n + 1
    fused = occ_mid.shape[0] > 0

    def is_marked(i):
        w = marks[jnp.clip(i >> 5, 0, marks.shape[0] - 1)]
        return ((w >> (i & 31).astype(jnp.uint32)) & 1).astype(bool)

    def rank1(i):
        """#marked rows < i (for a marked row i: its sample index)."""
        if mark_mid.shape[0] > 0:
            # mid-checkpoint path: 1 byte + 1 word instead of 4 words
            sub = i // 32
            base = (ck[jnp.clip(i // 128, 0, ck.shape[0] - 1)]
                    + mark_mid[jnp.clip(sub, 0, mark_mid.shape[0] - 1)]
                    .astype(jnp.int32))
            word = marks[jnp.clip(sub, 0, marks.shape[0] - 1)]
            covered = (i - sub * 32).astype(jnp.uint32)
            mask = jnp.where(covered >= 32, jnp.uint32(0xFFFFFFFF),
                             (jnp.uint32(1) << covered) - jnp.uint32(1))
            return base + jax.lax.population_count(word & mask).astype(
                jnp.int32)
        blk = i // 128
        base = ck[jnp.clip(blk, 0, ck.shape[0] - 1)]
        widx = (blk * 4)[..., None] + jnp.arange(4, dtype=jnp.int32)
        words = marks[jnp.clip(widx, 0, marks.shape[0] - 1)]
        covered = jnp.clip((i - blk * 128)[..., None]
                           - jnp.arange(4) * 32, 0, 32)
        mask = jnp.where(covered >= 32, jnp.uint32(0xFFFFFFFF),
                         (jnp.uint32(1) << covered.astype(jnp.uint32))
                         - jnp.uint32(1))
        return base + jax.lax.population_count(words & mask).sum(-1).astype(
            jnp.int32)

    def lf_fused(i):
        """LF-mapping with one fused word-pair fetch: the symbol word
        (i//16) is one of the two words rank() needs past the 32-base
        mid-checkpoint, so symbol + partial count share the gathers."""
        sub = i // 32
        w0 = packed_bwt[jnp.minimum(sub * 2, packed_bwt.shape[0] - 1)]
        w1 = packed_bwt[jnp.minimum(sub * 2 + 1, packed_bwt.shape[0] - 1)]
        in_hi = (i // 16) & 1
        wsym = jnp.where(in_hi.astype(bool), w1, w0)
        c = ((wsym >> (2 * (i % 16)).astype(jnp.uint32)) & jnp.uint32(3)
             ).astype(jnp.int32)
        base = (occ_ck[jnp.clip(i // 128, 0, occ_ck.shape[0] - 1), c]
                + occ_mid[jnp.clip(sub, 0, occ_mid.shape[0] - 1), c]
                .astype(jnp.int32))
        pat = (c.astype(jnp.uint32) * jnp.uint32(0x55555555))
        j = i - sub * 32
        cnt = jnp.zeros_like(i)
        for w, off in ((w0, 0), (w1, 16)):
            x = w ^ pat
            mbits = ~(x | (x >> 1)) & jnp.uint32(0x55555555)
            covered = jnp.clip(j - off, 0, 16)
            mask = jnp.where(covered >= 16, jnp.uint32(0xFFFFFFFF),
                             (jnp.uint32(1) << (2 * covered).astype(
                                 jnp.uint32)) - jnp.uint32(1))
            cnt = cnt + jax.lax.population_count(mbits & mask).astype(
                jnp.int32)
        sentinel = ((c == 0) & (fm.primary < i)).astype(jnp.int32)
        out = C[c] + base + cnt - sentinel
        return jnp.where(i == fm.primary, 0, out)

    i0 = jnp.clip(idx, 0, m - 1).astype(jnp.int32)

    def body(_, st):
        # walk to the nearest marked row; the sample lookup (rank1 over the
        # mark bits) is deferred until after the loop — it only depends on
        # the final row, so paying it per step wasted ~half the gathers
        i, steps, done = st
        done2 = done | is_marked(i)
        nxt = lf_fused(i) if fused else lf(fm, i)
        i = jnp.where(done2, i, nxt)
        steps = jnp.where(done2, steps, steps + 1)
        return (i, steps, done2)

    st = (i0, jnp.zeros_like(i0), jnp.zeros(i0.shape, bool))
    i_fin, steps, done = jax.lax.fori_loop(0, fm.sa_rate, body, st)
    val = samples[jnp.clip(rank1(i_fin), 0, samples.shape[0] - 1)]
    return val + steps


@partial(jax.jit, static_argnames=("max_hits",))
def resolve_hits(fm, lo, hi, max_hits: int):
    """Expand SA intervals to genomic positions.

    Returns (pos, valid): int32 (B, max_hits) text positions and a bool mask.
    Intervals wider than max_hits are truncated (callers see `truncated`).
    """
    idx = lo[:, None] + jnp.arange(max_hits, dtype=jnp.int32)[None, :]
    valid = idx < hi[:, None]
    pos = resolve_sa(fm, idx)
    truncated = (hi - lo) > max_hits
    return jnp.where(valid, pos, -1), valid, truncated


def search_and_resolve(fm, queries, max_hits: int):
    lo, hi = backward_search(fm, queries)
    pos, valid, truncated = resolve_hits(fm, lo, hi, max_hits)
    return pos, valid, hi - lo, truncated
