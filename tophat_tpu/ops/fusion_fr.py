"""Cross-strand fusion search (FR / RF directions).

An FR read is piece A on strand + followed by piece B on strand -: its
forward codes have a genomic PREFIX match and its reverse-complement codes
have a genomic PREFIX match, the two prefixes together covering the read
(reference: detect_fusion reverse-complements one side,
segment_juncs.cpp:2629; fusion dirs in fusions.h:24). An RF read is the
suffix+suffix mirror.

In the genome-space row layout (pipeline/segment.py) read r owns rows r
(forward) and r+R (reverse complement). Every segment hit implies an
"unspliced anchor" — the genome position read base 0 would occupy if the
whole row were contiguous (hit_pos - segment_cut). Candidate (A, B) anchor
pairs are scanned over all split points t with two per-row cumulative
mismatch tables:
  FR: prefix_mm_fwd(t) + prefix_mm_rc(L - t)
  RF: suffix_mm_fwd(t) + suffix_mm_rc(L - t)
keeping splits within a 2-mismatch budget. Mis-anchored pairs self-reject
because a wrong anchor cannot fit the budget.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

FR_MM = 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FrPairs:
    read: Any      # (P,) original read index
    anchor_a: Any  # (P,) fwd-row implied unspliced anchor (read base 0)
    anchor_b: Any  # (P,) rev-row implied unspliced anchor
    valid: Any


@partial(jax.jit, static_argnames=("cap",))
def build_fr_pairs(seg_pos, seg_valid, cuts, lengths, cap: int):
    """All (fwd-row hit, rev-row hit) anchor combos per read, compacted."""
    rows, S, H = seg_pos.shape
    R = rows // 2
    anchors = seg_pos - cuts[:, :-1][:, :, None]     # (rows, S, H)
    aA = anchors[:R].reshape(R, S * H)[:, :, None]
    vA = seg_valid[:R].reshape(R, S * H)[:, :, None]
    aB = anchors[R:].reshape(R, S * H)[:, None, :]
    vB = seg_valid[R:].reshape(R, S * H)[:, None, :]
    ok = vA & vB
    shape = ok.shape
    flat = lambda a: jnp.broadcast_to(a, shape).reshape(-1)
    pairs = FrPairs(
        read=flat(jnp.arange(R, dtype=jnp.int32)[:, None, None]),
        anchor_a=flat(aA), anchor_b=flat(aB), valid=ok.reshape(-1))
    order = jnp.argsort(~pairs.valid, stable=True)[:cap]
    take = lambda a: jnp.take(a, order)
    return FrPairs(read=take(pairs.read), anchor_a=take(pairs.anchor_a),
                   anchor_b=take(pairs.anchor_b), valid=take(pairs.valid))


@partial(jax.jit, static_argnames=("L", "pattern"))
def scan_fr_pairs(genome, reads_f, reads_r, lengths, pairs: FrPairs,
                  L: int, pattern: str):
    """Best split per anchor pair.

    pattern "prefix" (FR): fwd prefix [0:t) at anchor_a, rc prefix
    [0:rl-t) at anchor_b. Returns (t, leftA, leftB, mm, valid) where
    leftA/leftB are each piece's LAST aligned genome base.
    pattern "suffix" (RF): fwd suffix [t:) and rc suffix [rl-t:).
    Returns (t, rightA, rightB, mm, valid) with each piece's FIRST base.
    """
    genome = jnp.asarray(genome)
    n = genome.shape[0]
    P = pairs.read.shape[0]
    rl = lengths[pairs.read]
    u = jnp.arange(L, dtype=jnp.int32)[None, :]

    def mk(idx):
        g = genome[jnp.clip(idx, 0, n - 1)]
        return jnp.where((idx >= 0) & (idx < n), g, jnp.int8(5))

    ga = mk(pairs.anchor_a[:, None] + u)
    ra = reads_f[pairs.read[:, None], jnp.clip(u, 0, L - 1)]
    bad_a = (ga != ra) | (ga >= 4) | (ra >= 4) | (ra < 0)
    gb = mk(pairs.anchor_b[:, None] + u)
    rb = reads_r[pairs.read[:, None], jnp.clip(u, 0, L - 1)]
    bad_b = (gb != rb) | (gb >= 4) | (rb >= 4) | (rb < 0)
    in_read = u < rl[:, None]

    t = jnp.arange(L + 1, dtype=jnp.int32)[None, :]
    ut = jnp.clip(rl[:, None] - t, 0, L)
    if pattern == "prefix":
        pa = jnp.cumsum(bad_a & in_read, axis=1)
        mmA = jnp.concatenate([jnp.zeros((P, 1), pa.dtype), pa], axis=1)
        pb = jnp.cumsum(bad_b & in_read, axis=1)
        mmB = jnp.concatenate([jnp.zeros((P, 1), pb.dtype), pb], axis=1)
        tot = (jnp.take_along_axis(mmA, jnp.clip(t, 0, L), axis=1)
               + jnp.take_along_axis(mmB, ut, axis=1))
    else:
        sa = jnp.cumsum((bad_a & in_read)[:, ::-1], axis=1)[:, ::-1]
        mmA = jnp.concatenate([sa, jnp.zeros((P, 1), sa.dtype)], axis=1)
        sb = jnp.cumsum((bad_b & in_read)[:, ::-1], axis=1)[:, ::-1]
        mmB = jnp.concatenate([sb, jnp.zeros((P, 1), sb.dtype)], axis=1)
        tot = (jnp.take_along_axis(mmA, jnp.clip(t, 0, L), axis=1)
               + jnp.take_along_axis(mmB, ut, axis=1))

    interior = (t >= 1) & (t <= rl[:, None] - 1)
    tot = jnp.where(interior, tot, 32767)
    best_t = jnp.argmin(tot, axis=1).astype(jnp.int32)
    best = jnp.min(tot, axis=1).astype(jnp.int32)
    valid = pairs.valid & (best <= FR_MM)
    if pattern == "prefix":
        posA = pairs.anchor_a + best_t - 1              # last base, piece A
        posB = pairs.anchor_b + (rl - best_t) - 1       # last base, piece B
    else:
        posA = pairs.anchor_a + best_t                  # first base, piece A
        posB = pairs.anchor_b + (rl - best_t)           # first base, piece B
    return best_t, posA, posB, best, valid


def find_fr_fusions(fm, gs, seg_tables, lengths_unused, params,
                    cap: int = 16384):
    """Host driver: returns list of dicts per pattern with unique events and
    per-read best candidates:
      {"pattern": "fr"|"rf", "read", "t", "posA", "posB", "mm"} arrays."""
    seg_pos, seg_mm, seg_valid = (jnp.asarray(x) for x in seg_tables)
    cuts = jnp.asarray(gs.cuts)
    lengths = jnp.asarray(gs.lengths)
    R = gs.rows // 2
    if R == 0:
        return []
    L = gs.readsg.shape[1]
    reads_f = jnp.asarray(gs.readsg[:R])
    reads_r = jnp.asarray(gs.readsg[R:])
    pairs = build_fr_pairs(seg_pos, seg_valid, cuts, lengths, cap)

    out = []
    for pattern, dirname in (("prefix", "fr"), ("suffix", "rf")):
        t, posA, posB, mm, valid = scan_fr_pairs(
            fm.genome, reads_f, reads_r, lengths[:R], pairs, L, pattern)
        valid = np.asarray(valid)
        if not valid.any():
            continue
        out.append(dict(
            pattern=dirname,
            read=np.asarray(pairs.read)[valid],
            t=np.asarray(t)[valid], posA=np.asarray(posA)[valid],
            posB=np.asarray(posB)[valid], mm=np.asarray(mm)[valid]))
    return out
