"""Half-split FM beam search: full-sensitivity short-segment alignment.

The pigeonhole scheme in ops/align.py is right for full reads (>= 48 bp:
pieces are long enough that k-mer-shortened seeds have O(1)-wide SA
intervals) but wrong for 25 bp segments at gigabase scale: a 9 bp piece has
a ~10^3-wide interval on a 1 Gbp text, so truncating to hits_per_seed loses
most placements. This module reimplements the double-index strategy of the
engine the reference actually shells out to (bowtie1 -v mode; reference:
src/tophat.py:2339-2344 drives `bowtie -v 2` per segment): split the
segment at its midpoint into prefix P and suffix S and cover the mismatch
placements case by case,

  case A (mm(S) = 0):  exact backward search of S on the forward index
                       (13 exact chars -> O(n/4^13) interval), then a
                       beam over P branching on all 4 symbols with the
                       remaining mismatch budget;
  case B (mm(P) = 0, mm(S) >= 1):  exact search of P on the MIRROR index
                       (BWT of the reversed text; index/fm.py mir_*),
                       then a beam over S left-to-right recording the
                       substituted characters; final states re-search
                       their corrected string on the forward index (the
                       mirror carries no SA) and resolve there.

Together A + B find every placement whose mismatches fall in one half —
all 0- and 1-mismatch placements and same-half 2-mismatch placements. The
split-pair case (1 mismatch in each half; bowtie's phase-3 territory) is
intentionally uncovered: on random text every segment has ~600 spurious
"half + 1 mm" partials, so covering it costs ~10x the whole search for
~1% of true placements, and the pipeline's event realignment re-aligns
whole reads against the discovered event table anyway, which recovers
reads whose segments were missed (see pipeline/juncs.py).

The beam frontier is a flat state pool shared by the whole batch
(cumsum-compacted each step), so cost tracks the actual number of live
(interval, mismatch-pattern) states — the SPMD form of bowtie's
depth-first backtracking.

Every final hit is re-verified against the packed genome (N bases counted
as mismatches), so FM-text N->A substitution can never leak a bad hit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tophat_tpu.ops.search import resolve_sa
from tophat_tpu.ops.verify import (count_mismatches_packed, pack_reads,
                                   same_contig)

MIN_BEAM_LEN = 10   # shortest row the half-split handles sensibly


def _rank4(bwt, occ_ck, occ_mid, primary, i):
    """Counts of all four symbols in bwt[0:i) — one fused fetch per bound
    (the checkpoint row, the mid-checkpoint row and the two packed words
    are shared across the 4 symbols). i: (...,) int32. Returns (..., 4)."""
    i = jnp.asarray(i, jnp.int32)
    sub = i // 32
    ck = occ_ck[jnp.clip(i // 128, 0, occ_ck.shape[0] - 1)]
    mid = occ_mid[jnp.clip(sub, 0, occ_mid.shape[0] - 1)].astype(jnp.int32)
    w0 = bwt[jnp.minimum(sub * 2, bwt.shape[0] - 1)]
    w1 = bwt[jnp.minimum(sub * 2 + 1, bwt.shape[0] - 1)]
    j = i - sub * 32
    outs = []
    for c in range(4):
        pat = jnp.uint32(c * 0x55555555)
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
        outs.append(ck[..., c] + mid[..., c] + cnt)
    out = jnp.stack(outs, axis=-1)
    sent = (primary < i).astype(jnp.int32)  # sentinel row stores code 0
    return out - sent[..., None] * jnp.asarray([1, 0, 0, 0], jnp.int32)


def _exact_phase(bwt, occ_ck, occ_mid, primary, C, m, chars, nchars,
                 n_steps: int):
    """Vectorized exact backward scan: chars (B, T) consumption-order
    codes; consume chars[:, t] for t < nchars. Returns (lo, hi) (B,)."""
    B = chars.shape[0]
    lo0 = jnp.zeros(B, jnp.int32)
    hi0 = jnp.full(B, m, jnp.int32)

    def step(carry, t):
        lo, hi = carry
        c = chars[:, t]
        within = t < nchars
        do = within & (c >= 0) & (c <= 3) & (lo < hi)
        cc = jnp.clip(c, 0, 3)
        r_lo = _rank4(bwt, occ_ck, occ_mid, primary, lo)
        r_hi = _rank4(bwt, occ_ck, occ_mid, primary, hi)
        sel = jax.nn.one_hot(cc, 4, dtype=jnp.int32)
        nlo = C[cc] + (r_lo * sel).sum(-1)
        nhi = C[cc] + (r_hi * sel).sum(-1)
        bad = within & (c > 3)              # N kills the interval
        lo = jnp.where(do, nlo, lo)
        hi = jnp.where(do, nhi, jnp.where(bad, lo, hi))
        return (lo, hi), None

    (lo, hi), _ = jax.lax.scan(step, (lo0, hi0),
                               jnp.arange(n_steps, dtype=jnp.int32))
    return lo, hi


def _beam_phase(bwt, occ_ck, occ_mid, primary, C, chars, nchars,
                lo0, hi0, alive0, n_steps: int, K: int, max_mm: int,
                record_subs: bool):
    """Branching extension: from per-row intervals (lo0, hi0), consume
    chars[:, t] for t < nchars[row], branching on all 4 symbols under the
    mismatch budget. The frontier lives in a flat K-lane pool shared by
    the batch, compacted每 step by prefix sum.

    Returns (seg, lo, hi, mm, subs, ovf): pool arrays (K,) with seg = -1
    for dead lanes; subs packs up to 2 substitutions as
    (1 + step*4 + char) in two 8-bit fields (0 = none); ovf (B,) flags
    rows whose states were dropped by pool overflow."""
    B = chars.shape[0]
    seg = jnp.where(alive0, jnp.arange(B, dtype=jnp.int32), -1)
    pad = K - B
    assert pad >= 0, "pool must hold at least one lane per row"
    seg = jnp.concatenate([seg, jnp.full(pad, -1, jnp.int32)])
    lo = jnp.concatenate([lo0, jnp.zeros(pad, jnp.int32)])
    hi = jnp.concatenate([hi0, jnp.zeros(pad, jnp.int32)])
    mm = jnp.zeros(K, jnp.int32)
    subs = jnp.zeros(K, jnp.int32)
    ovf = jnp.zeros(B, bool)

    def step(carry, t):
        seg, lo, hi, mm, subs, ovf = carry
        segc = jnp.clip(seg, 0, B - 1)
        alive = seg >= 0
        active = alive & (t < nchars[segc]) & (lo < hi)
        c_true = jnp.where(active, chars[segc, t], -1)

        r_lo = _rank4(bwt, occ_ck, occ_mid, primary, lo)   # (K, 4)
        r_hi = _rank4(bwt, occ_ck, occ_mid, primary, hi)
        nlo = C[None, :4] + r_lo
        nhi = C[None, :4] + r_hi
        is_match = (jnp.arange(4, dtype=jnp.int32)[None, :]
                    == c_true[:, None])
        child_mm = mm[:, None] + 1 - is_match.astype(jnp.int32)
        child_ok = (active[:, None] & (nlo < nhi)
                    & (child_mm <= max_mm))
        if record_subs:
            enc = (1 + t * 4
                   + jnp.arange(4, dtype=jnp.int32))[None, :]
            child_subs = jnp.where(
                is_match, subs[:, None],
                jnp.where((subs[:, None] & 0xFF) > 0,
                          subs[:, None] | (enc << 8),
                          subs[:, None] | enc))
        else:
            child_subs = jnp.broadcast_to(subs[:, None], (K, 4))

        # candidate table: pass-through lane (finished rows) + 4 children
        finished = alive & (t >= nchars[segc]) & (lo < hi)
        cand_seg = jnp.concatenate(
            [jnp.where(finished, seg, -1)[:, None],
             jnp.where(child_ok, seg[:, None], -1)], axis=1).reshape(-1)
        cand_lo = jnp.concatenate([lo[:, None], nlo], axis=1).reshape(-1)
        cand_hi = jnp.concatenate([hi[:, None], nhi], axis=1).reshape(-1)
        cand_mm = jnp.concatenate([mm[:, None], child_mm],
                                  axis=1).reshape(-1)
        cand_subs = jnp.concatenate([subs[:, None], child_subs],
                                    axis=1).reshape(-1)

        valid = cand_seg >= 0
        csum = jnp.cumsum(valid.astype(jnp.int32))
        nvalid = csum[-1]
        src = jnp.searchsorted(csum, jnp.arange(1, K + 1, dtype=jnp.int32))
        src = jnp.minimum(src, valid.shape[0] - 1)
        kept = jnp.arange(K, dtype=jnp.int32) < nvalid
        seg = jnp.where(kept, cand_seg[src], -1)
        lo = jnp.where(kept, cand_lo[src], 0)
        hi = jnp.where(kept, cand_hi[src], 0)
        mm = jnp.where(kept, cand_mm[src], 0)
        subs = jnp.where(kept, cand_subs[src], 0)
        dropped = valid & (csum > K)
        ovf = ovf | (jnp.zeros(B, jnp.int32).at[
            jnp.clip(cand_seg, 0, B - 1)].max(
            dropped.astype(jnp.int32)) > 0)
        return (seg, lo, hi, mm, subs, ovf), None

    (seg, lo, hi, mm, subs, ovf), _ = jax.lax.scan(
        step, (seg, lo, hi, mm, subs, ovf),
        jnp.arange(n_steps, dtype=jnp.int32))
    return seg, lo, hi, mm, subs, ovf


def _expand_intervals(seg, lo, hi, mm, w_cap: int, r_cap: int):
    """Flat-expand pool intervals into SA rows: state k contributes
    min(hi-lo, w_cap) rows. Returns (seg_r, row_r, mm_r, valid_r, ovf_seg)
    with shapes (r_cap,). ovf_seg: (K,) True where a state's interval was
    wider than w_cap (caller folds into per-row truncation)."""
    width = jnp.where(seg >= 0, hi - lo, 0)
    take = jnp.minimum(width, w_cap)
    csum = jnp.cumsum(take)
    total = csum[-1]
    starts = csum - take
    # output slot r belongs to state searchsorted(csum, r, 'right')
    r = jnp.arange(r_cap, dtype=jnp.int32)
    st = jnp.searchsorted(csum, r, side="right")
    st = jnp.minimum(st, seg.shape[0] - 1)
    valid = r < jnp.minimum(total, r_cap)
    row = lo[st] + (r - starts[st])
    ovf_state = (width > w_cap) | ((csum > r_cap) & (take > 0))
    return (jnp.where(valid, seg[st], -1), jnp.where(valid, row, 0),
            mm[st], valid, ovf_state)


@partial(jax.jit, static_argnames=("n_steps_exact", "n_steps_beam", "K",
                                   "max_mm", "w_cap", "r_cap"))
def _case_a_jit(fm, rows, lengths, *, n_steps_exact: int,
                n_steps_beam: int, K: int, max_mm: int, w_cap: int,
                r_cap: int):
    """Case A: suffix exact on the forward index, prefix beam, direct SA
    resolution. rows: (B, L) left-aligned codes. Returns flat hits
    (seg, pos, mm, valid) + per-row overflow flags."""
    B, L = rows.shape
    bwt, ck, mid, pri = (jnp.asarray(fm.packed_bwt), jnp.asarray(fm.occ_ck),
                         jnp.asarray(fm.occ_mid), fm.primary)
    C = jnp.asarray(fm.C)
    m = fm.n + 1
    h = lengths // 2
    t = jnp.arange(max(n_steps_exact, n_steps_beam), dtype=jnp.int32)
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    # suffix consumption: q[l-1], q[l-2], ..., q[h]
    sidx = lengths[:, None] - 1 - t[None, :n_steps_exact]
    schars = jnp.where(sidx >= 0, rows[bidx, jnp.clip(sidx, 0, L - 1)],
                       -1).astype(jnp.int32)
    slen = lengths - h
    lo, hi = _exact_phase(bwt, ck, mid, pri, C, m, schars, slen,
                          n_steps_exact)
    # prefix beam: q[h-1], ..., q[0]
    pidx = h[:, None] - 1 - t[None, :n_steps_beam]
    pchars = jnp.where(pidx >= 0, rows[bidx, jnp.clip(pidx, 0, L - 1)],
                       -1).astype(jnp.int32)
    alive0 = (lo < hi) & (lengths >= MIN_BEAM_LEN)
    seg, flo, fhi, fmm, _subs, ovf = _beam_phase(
        bwt, ck, mid, pri, C, pchars, h, lo, hi, alive0,
        n_steps_beam, K, max_mm, record_subs=False)
    seg_r, row_r, mm_r, valid_r, st_ovf = _expand_intervals(
        seg, flo, fhi, fmm, w_cap, r_cap)
    pos = resolve_sa(fm, row_r)
    ovf = ovf | (jnp.zeros(B, jnp.int32).at[jnp.clip(seg, 0, B - 1)].max(
        (st_ovf & (seg >= 0)).astype(jnp.int32)) > 0)
    return (seg_r, jnp.where(valid_r, pos, 0), mm_r,
            valid_r & (seg_r >= 0), ovf)


@partial(jax.jit, static_argnames=("n_steps_exact", "n_steps_beam", "K",
                                   "max_mm", "w_cap", "r_cap", "kf_cap"))
def _case_b_jit(fm, rows, lengths, *, n_steps_exact: int,
                n_steps_beam: int, K: int, max_mm: int, w_cap: int,
                r_cap: int, kf_cap: int):
    """Case B: prefix exact on the mirror index, suffix beam with
    substitution recording, corrected-string re-search on the forward
    index. Returns flat hits (seg, pos, mm, valid) + overflow flags."""
    B, L = rows.shape
    bwt, ck, mid, pri = (jnp.asarray(fm.mir_bwt), jnp.asarray(fm.mir_occ_ck),
                         jnp.asarray(fm.mir_occ_mid), fm.mir_primary)
    C = jnp.asarray(fm.C)
    m = fm.n + 1
    h = lengths // 2
    t = jnp.arange(max(n_steps_exact, n_steps_beam), dtype=jnp.int32)
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    # mirror-backward = original left-to-right: consume q[0], q[1], ...
    pidx = t[None, :n_steps_exact]
    pchars = jnp.where(pidx < h[:, None],
                       rows[bidx, jnp.clip(pidx, 0, L - 1)],
                       -1).astype(jnp.int32)
    lo, hi = _exact_phase(bwt, ck, mid, pri, C, m, pchars, h,
                          n_steps_exact)
    # suffix beam: q[h], q[h+1], ...
    sidx = h[:, None] + t[None, :n_steps_beam]
    schars = jnp.where(sidx < lengths[:, None],
                       rows[bidx, jnp.clip(sidx, 0, L - 1)],
                       -1).astype(jnp.int32)
    slen = lengths - h
    alive0 = (lo < hi) & (lengths >= MIN_BEAM_LEN)
    seg, _flo, _fhi, fmm, subs, ovf = _beam_phase(
        bwt, ck, mid, pri, C, schars, slen, lo, hi, alive0,
        n_steps_beam, K, max_mm, record_subs=True)
    # keep only states with >= 1 substitution (mm == 0 duplicates case A)
    final_ok = (seg >= 0) & (fmm >= 1)
    csum = jnp.cumsum(final_ok.astype(jnp.int32))
    nfin = csum[-1]
    src = jnp.searchsorted(csum, jnp.arange(1, kf_cap + 1, dtype=jnp.int32))
    src = jnp.minimum(src, K - 1)
    fvalid = jnp.arange(kf_cap, dtype=jnp.int32) < jnp.minimum(nfin, kf_cap)
    fseg = jnp.where(fvalid, seg[src], -1)
    fsubs = subs[src]
    f_mm = fmm[src]
    ovf = ovf | (jnp.zeros(B, jnp.int32).at[jnp.clip(seg, 0, B - 1)].max(
        (final_ok & (csum > kf_cap)).astype(jnp.int32)) > 0)

    # corrected queries, right-aligned for backward_search-style scan:
    # column L-1 = last base. sub step t encodes read position h + t.
    segc = jnp.clip(fseg, 0, B - 1)
    ln = lengths[segc]
    hh = h[segc]
    col = jnp.arange(L, dtype=jnp.int32)[None, :]
    src_pos = col - (L - ln[:, None])               # read-space position
    seg2d = jnp.broadcast_to(segc[:, None], (segc.shape[0], L))
    q = jnp.where(src_pos >= 0,
                  rows[seg2d, jnp.clip(src_pos, 0, L - 1)],
                  -1).astype(jnp.int32)
    for slot in (fsubs & 0xFF, (fsubs >> 8) & 0xFF):
        has = slot > 0
        spos = hh + (slot - 1) // 4                  # read-space position
        schr = (slot - 1) % 4
        q = jnp.where(has[:, None]
                      & (src_pos == spos[:, None]), schr[:, None], q)
    from tophat_tpu.ops.search import backward_search

    blo, bhi = backward_search(fm, q)
    seg_r, row_r, mm_r, valid_r, st_ovf = _expand_intervals(
        jnp.where(fvalid & (bhi > blo), fseg, -1), blo, bhi,
        f_mm, w_cap, r_cap)
    pos = resolve_sa(fm, row_r)
    ovf = ovf | (jnp.zeros(B, jnp.int32).at[jnp.clip(fseg, 0, B - 1)].max(
        (st_ovf & (fseg >= 0)).astype(jnp.int32)) > 0)
    return (seg_r, jnp.where(valid_r, pos, 0), mm_r,
            valid_r & (seg_r >= 0), ovf)


@partial(jax.jit, static_argnames=("max_mm", "max_hits"))
def _assemble_jit(fm, rows, lengths, offsets, seg_f, pos_f, mm_f, valid_f,
                  ovf, *, max_mm: int, max_hits: int):
    """Verify flat hits against the packed genome and pack them into the
    (B, max_hits) tables of the align_forward_rows contract."""
    B, L = rows.shape
    r_packed, bad_e, len_e = pack_reads(rows, lengths)
    segc = jnp.clip(seg_f, 0, B - 1)
    has_n = getattr(fm, "has_n", True)
    mm_true = count_mismatches_packed(
        fm.packed_genome, fm.n_mask, pos_f[None, :],
        jnp.take(r_packed, segc, axis=0)[None],
        jnp.take(bad_e, segc, axis=0)[None],
        jnp.take(len_e, segc, axis=0)[None], L, has_n=has_n)[0]
    ln = lengths[segc]
    valid = (valid_f & (mm_true <= max_mm) & (pos_f >= 0)
             & (pos_f + ln <= fm.n))
    valid &= same_contig(offsets, pos_f, ln)

    # pack per row: sort by (seg, pos) then slot = index - first-of-seg
    R = seg_f.shape[0]
    seg_key = jnp.where(valid, segc, B)
    s_seg, s_pos, s_mm = jax.lax.sort(
        (seg_key, pos_f, mm_true), num_keys=2)
    first = jnp.searchsorted(s_seg, s_seg, side="left")
    slot = jnp.arange(R, dtype=jnp.int32) - first.astype(jnp.int32)
    ok = (s_seg < B) & (slot < max_hits)
    row_i = jnp.where(ok, s_seg, B)          # B = out of bounds -> dropped
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
                    max_hits: int, pool_factor: int = 4,
                    w_cap: int = 4):
    """Drop-in for ops.align.align_forward_rows on short rows, with full
    same-half mismatch sensitivity at any genome size. Requires
    fm.has_mirror. Returns (pos, mm, valid, n_hits, truncated)."""
    rows = jnp.asarray(rows)
    lengths = jnp.asarray(lengths, jnp.int32)
    B, L = rows.shape
    n_exact = (L + 1) // 2 + 1
    n_beam = (L + 1) // 2 + 1
    K = B * pool_factor
    r_cap = max(2 * B, 64)
    sa, pa, ma, va, ovf_a = _case_a_jit(
        fm, rows, lengths, n_steps_exact=n_exact, n_steps_beam=n_beam,
        K=K, max_mm=max_mismatches, w_cap=w_cap, r_cap=r_cap)
    sb, pb, mb, vb, ovf_b = _case_b_jit(
        fm, rows, lengths, n_steps_exact=n_exact, n_steps_beam=n_beam,
        K=K, max_mm=max_mismatches, w_cap=w_cap, r_cap=r_cap,
        kf_cap=max(B, 64))
    seg_f = jnp.concatenate([sa, sb])
    pos_f = jnp.concatenate([pa, pb])
    mm_f = jnp.concatenate([ma, mb])
    valid_f = jnp.concatenate([va, vb])
    return _assemble_jit(fm, rows, lengths, jnp.asarray(offsets), seg_f,
                         pos_f, mm_f, valid_f, ovf_a | ovf_b,
                         max_mm=max_mismatches, max_hits=max_hits)
