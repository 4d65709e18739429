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
        if L == k:
            # pure table lookup — no scan at all. Rows that cannot seed
            # (an N among the k chars, or a query shorter than k) report
            # empty: an N makes exact match impossible anyway, and callers
            # arrange not to hit this path with short valid queries.
            return jnp.where(seedable, lo0, 0), jnp.where(seedable, hi0, 0)
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
    samples = jnp.asarray(fm.sa_samples)
    m = fm.n + 1

    def is_marked(i):
        w = marks[jnp.clip(i >> 5, 0, marks.shape[0] - 1)]
        return ((w >> (i & 31).astype(jnp.uint32)) & 1).astype(bool)

    def rank1(i):
        """#marked rows < i (for a marked row i: its sample index)."""
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

    i0 = jnp.clip(idx, 0, m - 1).astype(jnp.int32)

    def body(_, st):
        i, steps, pos, done = st
        mk = is_marked(i)
        newly = mk & ~done
        val = samples[jnp.clip(rank1(i), 0, samples.shape[0] - 1)]
        pos = jnp.where(newly, val + steps, pos)
        done = done | mk
        i = jnp.where(done, i, lf(fm, i))
        steps = jnp.where(done, steps, steps + 1)
        return (i, steps, pos, done)

    st = (i0, jnp.zeros_like(i0), jnp.zeros_like(i0),
          jnp.zeros(i0.shape, bool))
    _, _, pos, done = jax.lax.fori_loop(0, fm.sa_rate, body, st)
    return pos


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
