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

from tophat_tpu.ops.rank import rank


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


@partial(jax.jit, static_argnames=("max_hits",))
def resolve_hits(fm, lo, hi, max_hits: int):
    """Expand SA intervals to genomic positions.

    Returns (pos, valid): int32 (B, max_hits) text positions and a bool mask.
    Intervals wider than max_hits are truncated (callers see `truncated`).
    """
    sa = jnp.asarray(fm.sa)
    idx = lo[:, None] + jnp.arange(max_hits, dtype=jnp.int32)[None, :]
    valid = idx < hi[:, None]
    pos = sa[jnp.clip(idx, 0, sa.shape[0] - 1)]
    truncated = (hi - lo) > max_hits
    return jnp.where(valid, pos, -1), valid, truncated


def search_and_resolve(fm, queries, max_hits: int):
    lo, hi = backward_search(fm, queries)
    pos, valid, truncated = resolve_hits(fm, lo, hi, max_hits)
    return pos, valid, hi - lo, truncated
