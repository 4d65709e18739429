"""Half-split full-sensitivity short-segment alignment.

The pigeonhole scheme in ops/align.py is right for full reads (>= 48 bp:
pieces are long enough that k-mer-shortened seeds have O(1)-wide SA
intervals) but catastrophically wrong for 25 bp segments at gigabase
scale: with 3 pieces of ~8 bp, each piece's SA interval is ~16k wide on a
1 Gbp text and truncating to hits_per_seed keeps ~0.6% of true placements
(measured; scripts/beam_probe.py).

This module covers the same placements as the engine the reference shells
out to (bowtie1 -v 2 per segment, reference src/tophat.py:2339-2344) for
every alignment whose mismatches fall within ONE half of the segment —
all 0- and 1-mismatch placements and same-half 2-mismatch placements —
with a much simpler plan than bowtie's double-index backtracking:

  split the segment at its midpoint into prefix P (h chars) and suffix S;
  an alignment with mm(S) = 0 is an occurrence of S; one with mm(P) = 0
  is an occurrence of P.  Both halves are >= 12 chars, so their SA
  intervals hold only ~n/4^12 occurrences (~16 + ~60 at 1 Gbp): resolve
  EVERY occurrence of each half and verify the full segment against the
  word-packed genome.  No backtracking, no second index — the mismatch
  search collapses into two exact searches plus a batched verify, which
  is exactly the shape TPUs like (two fixed-depth rank scans + flat
  gathers).

The split-pair case (one mismatch in each half; bowtie's phase-3) is
intentionally uncovered: it is ~1% of true placements on real error
models, costs ~10x the whole search to chase through the FM index, and
the pipeline's event realignment re-aligns whole reads against the
discovered event table anyway, recovering reads whose segments were
missed (pipeline/juncs.py).

Verification counts N bases as mismatches (via the packed N mask), so the
FM text's N->A substitution can never leak a bad hit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tophat_tpu.ops.search import backward_search, resolve_sa
from tophat_tpu.ops.verify import (count_mismatches_packed, pack_reads,
                                   same_contig)

MIN_BEAM_LEN = 10   # shortest row the half-split handles sensibly


def _expand_grid(seg, lo, hi, w_cap: int):
    """Expand per-seed SA intervals into a regular (n_seeds, w_cap) grid:
    row j of seed k is SA row lo[k]+j, valid while j < width. A regular
    grid costs some dead lanes but avoids the r_cap-wide searchsorted a
    ragged layout needs (17 dependent gathers per lane on a 10M-lane
    table dominated the first implementation). Returns (rows, valid,
    ovf_seed)."""
    width = jnp.where(seg >= 0, hi - lo, 0)
    j = jnp.arange(w_cap, dtype=jnp.int32)[None, :]
    rows = lo[:, None] + j
    valid = j < width[:, None]
    return rows, valid, width > w_cap


@partial(jax.jit, static_argnames=("n_steps", "max_mm", "max_hits",
                                   "cap_s", "cap_p"))
def _half_split_jit(fm, rows, lengths, offsets, *, n_steps: int,
                    max_mm: int, max_hits: int, cap_s: int, cap_p: int):
    """The whole half-split search as one device program.

    rows: (B, L) left-aligned int8 codes; returns the
    align_forward_rows contract (pos, mm, valid, n_hits, truncated).

    Key cost shape: each candidate occurrence verifies ONLY its non-seed
    half (the seed half matched exactly by construction), and the two
    seed families are provably disjoint — a placement's mismatches are
    either all in the prefix (suffix seed finds it) or include a suffix
    mismatch (prefix seed finds it, gated on mm_suffix >= 1) — so no
    cross-family dedup is needed and the final per-row packing sorts
    only the few verified hits. cap_s/cap_p: per-seed occurrence grids
    for the suffix/prefix families (the shorter prefix half has ~4x the
    occurrences, so it gets the taller grid)."""
    B, L = rows.shape
    h = lengths // 2
    t = jnp.arange(n_steps, dtype=jnp.int32)
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]

    # two queries per row, right-aligned for backward_search
    # (column n_steps-1 = the query's last char):
    #   suffix S = q[h:l)   -> candidate pos = occ - h
    #   prefix P = q[0:h)   -> candidate pos = occ
    col = t[None, :]
    sidx = lengths[:, None] - n_steps + col
    sq = jnp.where(sidx >= h[:, None],
                   rows[bidx, jnp.clip(sidx, 0, L - 1)], -1)
    pidx = h[:, None] - n_steps + col
    pq = jnp.where(pidx >= 0, rows[bidx, jnp.clip(pidx, 0, L - 1)], -1)
    q2 = jnp.concatenate([sq, pq]).astype(jnp.int32)
    lo, hi = backward_search(fm, q2)

    ok_len = lengths >= MIN_BEAM_LEN
    seg_ok = jnp.where(ok_len, bidx[:, 0], -1)

    # non-seed half queries for verification, left-aligned + packed
    pre_rows = jnp.where(col < h[:, None],
                         rows[bidx, jnp.clip(col, 0, L - 1)],
                         jnp.int8(-1))[:, :n_steps]
    suf_rows = jnp.where(col < (lengths - h)[:, None],
                         rows[bidx, jnp.clip(h[:, None] + col, 0, L - 1)],
                         jnp.int8(-1))[:, :n_steps]
    pre_packed = pack_reads(pre_rows, h)
    suf_packed = pack_reads(suf_rows, lengths - h)
    has_n = getattr(fm, "has_n", True)

    def family(lo_f, hi_f, pos_off, vpos_off, vpk, min_mm, cap):
        """One seed family: expand the interval grid, resolve, verify the
        non-seed half. Returns flat (valid, pos, mm) + per-row ovf."""
        row_g, valid_g, ovf_seed = _expand_grid(seg_ok, lo_f, hi_f, cap)
        pos_g = resolve_sa(fm, row_g) - pos_off[:, None]
        vp, vb, vl = vpk
        mm_half = count_mismatches_packed(
            fm.packed_genome, fm.n_mask, pos_g + vpos_off[:, None],
            vp, vb, vl, L, has_n=has_n)
        valid = (valid_g & (seg_ok >= 0)[:, None] & (mm_half <= max_mm)
                 & (mm_half >= min_mm) & (pos_g >= 0)
                 & (pos_g + lengths[:, None] <= fm.n))
        valid &= same_contig(offsets, pos_g, lengths[:, None])
        ovf = jnp.zeros(B, jnp.int32).at[jnp.clip(seg_ok, 0, B - 1)].max(
            (ovf_seed & (seg_ok >= 0)).astype(jnp.int32)) > 0
        return valid, pos_g, mm_half, ovf

    z = jnp.zeros(B, jnp.int32)
    v_s, p_s, m_s, ovf_s = family(lo[:B], hi[:B], h, z, pre_packed,
                                  0, cap_s)
    v_p, p_p, m_p, ovf_p = family(lo[B:], hi[B:], z, h, suf_packed,
                                  1, cap_p)        # disjointness: mm >= 1
    ovf = ovf_s | ovf_p

    # compact the (few) verified hits, then sort the small set per row
    R2 = B * 6
    seg_rows = jnp.broadcast_to(bidx, (B, cap_s)).reshape(-1)
    seg_rows2 = jnp.broadcast_to(bidx, (B, cap_p)).reshape(-1)
    segc = jnp.concatenate([seg_rows, seg_rows2])
    flat_valid = jnp.concatenate([v_s.reshape(-1), v_p.reshape(-1)])
    flat_pos = jnp.concatenate([p_s.reshape(-1), p_p.reshape(-1)])
    flat_mm = jnp.concatenate([m_s.reshape(-1), m_p.reshape(-1)])
    csum2 = jnp.cumsum(flat_valid.astype(jnp.int32))
    n_valid = csum2[-1]
    src2 = jnp.minimum(jnp.searchsorted(
        csum2, jnp.arange(1, R2 + 1, dtype=jnp.int32)),
        flat_valid.shape[0] - 1)
    kept2 = jnp.arange(R2, dtype=jnp.int32) < jnp.minimum(n_valid, R2)
    c_seg = jnp.where(kept2, segc[src2], B)
    c_pos = jnp.where(kept2, flat_pos[src2], 0)
    c_mm = jnp.where(kept2, flat_mm[src2], 0)
    ovf |= jnp.zeros(B, jnp.int32).at[segc].max(
        (flat_valid & (csum2 > R2)).astype(jnp.int32)) > 0

    s_seg, s_pos, s_mm = jax.lax.sort((c_seg, c_pos, c_mm), num_keys=2)
    first = jnp.searchsorted(s_seg, s_seg, side="left")
    slot = jnp.arange(R2, dtype=jnp.int32) - first.astype(jnp.int32)
    ok = (s_seg < B) & (slot < max_hits)
    row_i = jnp.where(ok, s_seg, B)
    col_i = jnp.clip(slot, 0, max_hits - 1)
    pos_t = jnp.zeros((B, max_hits), jnp.int32).at[
        (row_i, col_i)].set(s_pos, mode="drop")
    mm_t = jnp.zeros((B, max_hits), jnp.int32).at[
        (row_i, col_i)].set(s_mm, mode="drop")
    val_t = jnp.zeros((B, max_hits), bool).at[
        (row_i, col_i)].set(True, mode="drop")
    n_hits = jnp.zeros(B, jnp.int32).at[jnp.clip(s_seg, 0, B - 1)].add(
        (s_seg < B).astype(jnp.int32), mode="drop")
    trunc = ovf | (n_hits > max_hits)
    return pos_t, mm_t.astype(jnp.int8), val_t, n_hits, trunc


def beam_align_rows(fm, rows, lengths, offsets, *, max_mismatches: int,
                    max_hits: int, cap_s: int = 0, cap_p: int = 0):
    """Drop-in for ops.align.align_forward_rows on short rows, with full
    same-half mismatch sensitivity at any genome size.

    cap_s / cap_p: per-seed occurrence grids for the suffix/prefix seed
    families; a half whose SA interval overflows its grid flags the row
    truncated (repeat-family halves). Defaults scale with genome size:
    ~3x the expected interval width n/4^len_half, floored/capped to keep
    the grids TPU-friendly."""
    rows = jnp.asarray(rows)
    lengths = jnp.asarray(lengths, jnp.int32)
    B, L = rows.shape
    n_steps = (L + 1) // 2 + 1
    # expected interval width is Poisson(n / 4^half_len) on random text;
    # mean + 6*sqrt(mean) covers the tail to ~1e-9 per seed. Genuine
    # repeat families exceed any cap and flag `truncated` instead.
    if cap_s <= 0:
        mu = fm.n / 4 ** (L - L // 2)
        cap_s = int(np.clip(mu + 6 * np.sqrt(mu) + 8, 16, 512))
    if cap_p <= 0:
        mu = fm.n / 4 ** (L // 2)
        cap_p = int(np.clip(mu + 6 * np.sqrt(mu) + 8, 16, 512))
    return _half_split_jit(fm, rows, lengths, jnp.asarray(offsets),
                           n_steps=n_steps, max_mm=max_mismatches,
                           max_hits=max_hits, cap_s=cap_s, cap_p=cap_p)
