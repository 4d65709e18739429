"""End-to-end unspliced read alignment: pigeonhole seeding + verification.

Bowtie1's `-v <k>` mode (align the whole read with <= k mismatches, report
all placements — the contract TopHat relies on for genome and segment mapping,
reference: src/tophat.py:2339-2344) reimplemented without backtracking so it
jits: split each read into k+1 pieces; any <=k-mismatch alignment leaves at
least one piece exact (pigeonhole), so exact-FM-search every piece, turn piece
hits into candidate read placements, and verify all candidates with one
batched genome gather. Reverse-strand placements come from running the same
machinery on the reverse-complemented reads against the same forward index.

All shapes are static: B reads x (k+1) pieces x H hits/piece candidates ->
(B, M) alignment slots with validity masks.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tophat_tpu.ops.search import backward_search, resolve_sa
from tophat_tpu.ops.verify import (count_mismatches_packed, pack_reads,
                                   same_contig)

# sentinel sort key for invalid candidates (host int: creating a device
# array at import time would trigger TPU backend init for CLI paths that
# never touch the device, e.g. --transcriptome-index build-only)
NEG = np.int32(2**30)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Alignments:
    """Fixed-width per-read alignment table (struct of arrays).

    The TPU-side analog of HitsForRead (reference: src/bwt_map.h:1033): all
    placements of read b live in row b, valid ones flagged by `valid`.
    pos is a 0-based global genome coordinate of the leftmost aligned base;
    strand 0 = forward, 1 = reverse complement.
    """

    pos: Any      # int32 (B, M)
    strand: Any   # int8  (B, M)
    mm: Any       # int8  (B, M) mismatch count
    valid: Any    # bool  (B, M)
    n_hits: Any   # int32 (B,) total valid placements (pre-truncation)
    truncated: Any  # bool (B,) seed-hit cap hit; counts may be lower bounds

    @property
    def shape(self):
        return self.pos.shape


def _piece_queries(reads, lengths, num_pieces: int, piece_len: int):
    """Cut each read into num_pieces contiguous pieces, right-aligned into a
    (B, num_pieces, piece_len) query array padded with -1; also return piece
    start offsets (B, num_pieces)."""
    B, L = reads.shape
    j = jnp.arange(num_pieces, dtype=jnp.int32)
    s = (j[None, :] * lengths[:, None]) // num_pieces          # (B, P)
    e = ((j[None, :] + 1) * lengths[:, None]) // num_pieces
    plen = e - s
    t = jnp.arange(piece_len, dtype=jnp.int32)
    src = s[:, :, None] + t[None, None, :] - (piece_len - plen)[:, :, None]
    ok = src >= s[:, :, None]
    b_idx = jnp.arange(B, dtype=jnp.int32)[:, None, None]
    q = reads[b_idx, jnp.clip(src, 0, L - 1)]
    return jnp.where(ok, q, jnp.int8(-1)).astype(jnp.int32), s, plen


def _rolling_kmer_keys(reads, k: int):
    """keys[b, i] = base-4 value of reads[b, i-k+1 .. i] and a validity
    mask (all k codes in 0..3). Pure shifted elementwise ops — replaces a
    per-element piece gather that dominated the aligner's runtime on TPU
    (element gathers don't vectorize; k shift+multiply-adds do)."""
    B, L = reads.shape
    r = reads.astype(jnp.int32)
    key = jnp.zeros((B, L), jnp.int32)
    ok = jnp.ones((B, L), bool)
    for t in range(k):
        # x at column i = reads[:, i - t] (out-of-range -> invalid)
        if t:
            x = jnp.pad(r, ((0, 0), (t, 0)), constant_values=-1)[:, :L]
        else:
            x = r
        key = key + jnp.clip(x, 0, 3) * (4 ** t)
        ok &= (x >= 0) & (x <= 3)
    return key, ok


def _fast_seed_intervals(fm, reads, lengths, P: int, span: int):
    """SA intervals for the last `span` characters of each of the P
    pigeonhole pieces, via the k-mer table + rolling keys. Requires
    span >= k and every piece length >= span (kmer_fast_ok).

    Returns (lo, hi, cand_base): (B, P) interval bounds and the candidate
    read-start offset base (piece_end - span)."""
    k = fm.kmer_k
    B, L = reads.shape
    keys, kok = _rolling_kmer_keys(reads, k)
    j = jnp.arange(1, P + 1, dtype=jnp.int32)
    e = (j[None, :] * lengths[:, None]) // P          # piece ends (B, P)
    s = ((j - 1)[None, :] * lengths[:, None]) // P
    pos = jnp.clip(e - 1, 0, L - 1)
    key_e = jnp.take_along_axis(keys, pos, axis=1)     # (B, P)
    ok = jnp.take_along_axis(kok, pos, axis=1) & (e - s >= span) & (e >= span)
    lo = jnp.where(ok, jnp.asarray(fm.kmer_lo)[key_e], 0)
    hi = jnp.where(ok, jnp.asarray(fm.kmer_hi)[key_e], 0)
    if span > k:
        # extend the table interval by the span-k characters preceding the
        # k-mer window (backward search continues leftward)
        from tophat_tpu.ops.rank import rank

        C = jnp.asarray(fm.C)
        b_idx = jnp.arange(B, dtype=jnp.int32)[:, None]
        for t in range(span - k):
            col = jnp.clip(e - k - 1 - t, 0, L - 1)
            c = reads[b_idx, col].astype(jnp.int32)
            is_n = c > 3
            do = (c >= 0) & ~is_n & (lo < hi)
            cc = jnp.clip(c, 0, 3)
            nlo = jnp.where(do, C[cc] + rank(fm, cc, lo), lo)
            nhi = jnp.where(do, C[cc] + rank(fm, cc, hi), hi)
            hi = jnp.where(is_n, nlo, nhi)
            lo = nlo
    return lo, hi, e - span


def seed_span(fm, max_mismatches: int, read_len: int):
    """Width of the shortened seed search (see _align_one_strand)."""
    P = max_mismatches + 1
    piece_len = (read_len + P - 1) // P + 1
    k = getattr(fm, "kmer_k", 0)
    if not k:
        return piece_len
    extend = max(0, math.ceil(math.log(max(4 * fm.n, 4), 4)) - k)
    return min(piece_len, k + extend)


def kmer_fast_ok(fm, min_read_len: int, max_mismatches: int) -> bool:
    """True when seed shortening is complete for every read length >=
    min_read_len: the shortest piece (floor(len/P)) must still cover the
    shortened span, otherwise short pieces pad into the k-mer window and
    would silently lose their seeds."""
    k = getattr(fm, "kmer_k", 0)
    if not k:
        return False
    P = max_mismatches + 1
    extend = max(0, math.ceil(math.log(max(4 * fm.n, 4), 4)) - k)
    return (min_read_len // P) >= k + extend


def _align_one_strand(fm, reads, lengths, max_mismatches: int,
                      hits_per_seed: int, verify_slots: int = 32,
                      kmer_fast: bool = False):
    """All placements of `reads` on the forward text with <= max_mismatches.

    Candidates are compacted to `verify_slots` per read before mismatch
    counting, and verification uses the word-packed genome (XOR+popcount
    over uint32 gathers) instead of per-base gathers — the two changes that
    make this gather-bound stage run at memory speed on TPU.

    Returns (cand_pos, cand_mm, cand_valid, truncated), (B, verify_slots).
    """
    B, L = reads.shape
    P = max_mismatches + 1
    piece_len = (L + P - 1) // P + 1

    # seed shortening: an exact piece implies an exact k-mer suffix of that
    # piece, so searching only the last `span` piece characters preserves
    # pigeonhole completeness — verification rejects the extra candidates.
    # span is sized so expected spurious hits stay O(1) per seed. Callers
    # must enable this only when kmer_fast_ok holds for the batch's minimum
    # read length (shorter pieces would pad into the k-mer window).
    if kmer_fast:
        # rolling-key path: no per-element piece gather at all
        span = seed_span(fm, max_mismatches, L)
        lo, hi, cand_base = _fast_seed_intervals(fm, reads, lengths, P,
                                                 span)
    else:
        span = piece_len
        q, piece_start, plen = _piece_queries(reads, lengths, P, piece_len)
        lo, hi = backward_search(fm, q[:, :, piece_len - span:]
                                 .reshape(B * P, span))
        lo = lo.reshape(B, P)
        hi = hi.reshape(B, P)
        cand_base = piece_start + jnp.maximum(plen - span, 0)
    truncated = jnp.any((hi - lo) > hits_per_seed, axis=1)

    h = jnp.arange(hits_per_seed, dtype=jnp.int32)
    idx = lo[:, :, None] + h[None, None, :]                    # (B, P, H)
    seed_valid = idx < hi[:, :, None]
    hitpos = resolve_sa(fm, idx)
    # searched substring starts cand_base into the read
    cand = hitpos - cand_base[:, :, None]                      # read start
    cand = jnp.where(seed_valid, cand, -NEG).reshape(B, P * hits_per_seed)

    # dedup identical candidate positions (several pieces exact at same spot)
    cand = jnp.sort(cand, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((B, 1), bool), cand[:, 1:] == cand[:, :-1]], axis=1)
    prevalid = (cand > -NEG) & ~dup & (cand >= 0)
    truncated |= prevalid.sum(axis=1) > verify_slots

    inval = (~prevalid).astype(jnp.int32)
    _, cand_c, valid_i = jax.lax.sort(
        (inval, cand, prevalid.astype(jnp.int32)), dimension=1, num_keys=2)
    cand_c = cand_c[:, :verify_slots]
    cand_valid = valid_i[:, :verify_slots].astype(bool)

    r_packed, bad_e, len_e = pack_reads(reads, lengths)
    mm = count_mismatches_packed(fm.packed_genome, fm.n_mask, cand_c,
                                 r_packed, bad_e, len_e, L)
    cand_valid &= (mm <= max_mismatches) & (cand_c + lengths[:, None] <= fm.n)
    return cand_c, mm, cand_valid, truncated


@partial(jax.jit, static_argnames=("max_mismatches", "hits_per_seed",
                                   "max_alignments", "kmer_fast"))
def _align_reads_jit(fm, reads_f, reads_r, lengths, offsets, *,
                     max_mismatches: int = 2, hits_per_seed: int = 32,
                     max_alignments: int = 64,
                     kmer_fast: bool = False) -> Alignments:
    """Align a batch both strands; reads_r must be revcomp(reads_f) with the
    same per-read lengths (padding handled by the caller: both arrays are
    LEFT-aligned code arrays padded with -1).

    offsets: contig offset table (num_contigs+1,) — alignments crossing a
    contig boundary in the concatenated genome are rejected.
    """
    pf, mf, vf, tf = _align_one_strand(fm, reads_f, lengths, max_mismatches,
                                       hits_per_seed, kmer_fast=kmer_fast)
    pr, mr, vr, tr = _align_one_strand(fm, reads_r, lengths, max_mismatches,
                                       hits_per_seed, kmer_fast=kmer_fast)
    C = pf.shape[1]
    pos = jnp.concatenate([pf, pr], axis=1)
    mm = jnp.concatenate([mf, mr], axis=1)
    valid = jnp.concatenate([vf, vr], axis=1)
    strand = jnp.concatenate(
        [jnp.zeros_like(mf, jnp.int8), jnp.ones_like(mr, jnp.int8)], axis=1)

    valid &= same_contig(offsets, pos, lengths[:, None])
    n_hits = valid.sum(axis=1).astype(jnp.int32)

    # compact: valid slots first, ordered by (strand, pos); lexicographic
    # multi-key sort avoids building a combined key that could overflow int32
    inval = (~valid).astype(jnp.int32)
    _, strand_s, pos_s, mm_s, valid_s = jax.lax.sort(
        (inval, strand.astype(jnp.int32), pos, mm,
         valid.astype(jnp.int32)),
        dimension=1, num_keys=3)
    sl = slice(0, max_alignments)
    return Alignments(
        pos=pos_s[:, sl], strand=strand_s[:, sl].astype(jnp.int8),
        mm=mm_s[:, sl].astype(jnp.int8), valid=valid_s[:, sl].astype(bool),
        n_hits=n_hits, truncated=tf | tr)


def align_reads(fm, reads_f, reads_r, lengths, offsets, *,
                max_mismatches: int = 2, hits_per_seed: int = 32,
                max_alignments: int = 64,
                kmer_fast: bool = False) -> Alignments:
    """align (see _align_reads_jit); with an active multi-device mesh
    (parallel/auto.py) the batch is sharded over the reads axis and runs
    SPMD — the TPU analog of the reference's per-thread read ranges
    (src/utils.cpp:22)."""
    from tophat_tpu.parallel import auto

    kw = dict(max_mismatches=max_mismatches, hits_per_seed=hits_per_seed,
              max_alignments=max_alignments, kmer_fast=kmer_fast)
    if auto.active() is None:
        return _align_reads_jit(fm, reads_f, reads_r, lengths, offsets, **kw)
    (rf, rr, ln), B = auto.shard_rows(reads_f, reads_r, lengths)
    out = _align_reads_jit(auto.replicated(fm), rf, rr, ln,
                           auto.replicated(offsets), **kw)
    return Alignments(pos=out.pos[:B], strand=out.strand[:B], mm=out.mm[:B],
                      valid=out.valid[:B], n_hits=out.n_hits[:B],
                      truncated=out.truncated[:B])


@partial(jax.jit, static_argnames=("max_mismatches", "hits_per_seed",
                                   "max_hits"))
def _align_forward_rows_jit(fm, reads, lengths, offsets, *,
                            max_mismatches: int, hits_per_seed: int,
                            max_hits: int):
    cand, mm, valid, trunc = _align_one_strand(
        fm, reads, lengths, max_mismatches, hits_per_seed)
    valid &= same_contig(offsets, cand, lengths[:, None])
    n_hits = valid.sum(axis=1).astype(jnp.int32)
    inval = (~valid).astype(jnp.int32)
    _, pos_s, mm_s, valid_s = jax.lax.sort(
        (inval, cand, mm, valid.astype(jnp.int32)), dimension=1, num_keys=2)
    sl = slice(0, max_hits)
    return (pos_s[:, sl], mm_s[:, sl].astype(jnp.int8),
            valid_s[:, sl].astype(bool), n_hits, trunc)


def align_forward_rows(fm, reads, lengths, offsets, *, max_mismatches: int,
                       hits_per_seed: int, max_hits: int):
    """Forward-text-only variant for rows that are already in genome space
    (segment mapping: the caller supplies revcomp rows itself). Returns
    (pos, mm, valid) compacted to (N, max_hits) plus n_hits and truncation.
    Row-sharded over the active mesh (parallel/auto.py), if any.
    """
    from tophat_tpu.parallel import auto

    kw = dict(max_mismatches=max_mismatches, hits_per_seed=hits_per_seed,
              max_hits=max_hits)
    if auto.active() is None:
        return _align_forward_rows_jit(fm, reads, lengths, offsets, **kw)
    (rd, ln), B = auto.shard_rows(reads, lengths)
    out = _align_forward_rows_jit(auto.replicated(fm), rd, ln,
                                  auto.replicated(offsets), **kw)
    return tuple(a[:B] for a in out)


def align_reads_adaptive(fm, reads_f, reads_r, lengths, offsets, *,
                         max_mismatches: int = 2, max_alignments: int = 64,
                         kmer_fast: bool = False,
                         narrow_hits: int = 8,
                         wide_hits: int = 32) -> Alignments:
    """Two-tier alignment: a narrow seed-hit budget for the batch (cheap —
    most reads have O(1) placements), then a wide re-run for only the rows
    whose seeds truncated (repeat-family reads). Matches align_reads with
    hits_per_seed=wide_hits on every read, at close to narrow-budget cost.

    Host-side control flow: the re-run subset is padded to a power-of-two
    bucket so recompilation stays bounded.
    """
    al = align_reads(fm, reads_f, reads_r, lengths, offsets,
                     max_mismatches=max_mismatches,
                     hits_per_seed=narrow_hits,
                     max_alignments=max_alignments, kmer_fast=kmer_fast)
    trunc = np.asarray(al.truncated)
    if not trunc.any():
        return al
    idx = np.nonzero(trunc)[0]
    bt = 1 << max(3, int(len(idx) - 1).bit_length())
    pad = np.resize(idx, bt)
    wide = align_reads(fm, np.asarray(reads_f)[pad],
                       np.asarray(reads_r)[pad],
                       np.asarray(lengths)[pad], offsets,
                       max_mismatches=max_mismatches,
                       hits_per_seed=wide_hits,
                       max_alignments=max_alignments, kmer_fast=kmer_fast)
    k = len(idx)
    w_wide = np.asarray(wide.pos).shape[1]
    out = {}
    for f, fill in (("pos", 0), ("strand", 0), ("mm", 0), ("valid", False)):
        a = np.asarray(getattr(al, f))
        if a.shape[1] < w_wide:  # narrow tier compacted to fewer slots
            pad_w = np.full((a.shape[0], w_wide - a.shape[1]), fill,
                            a.dtype)
            a = np.concatenate([a, pad_w], axis=1)
        else:
            a = a.copy()
        a[idx] = np.asarray(getattr(wide, f))[:k, :a.shape[1]]
        out[f] = a
    for f in ("n_hits", "truncated"):
        a = np.asarray(getattr(al, f)).copy()
        a[idx] = np.asarray(getattr(wide, f))[:k]
        out[f] = a
    return Alignments(**out)


def pad_reads(seqs, max_len: int | None = None):
    """Host helper: list of int8 code arrays -> (reads_f, reads_r, lengths)
    left-aligned, -1-padded numpy arrays ready for align_reads."""
    from tophat_tpu.index.fasta import revcomp

    B = len(seqs)
    L = max_len or max((len(s) for s in seqs), default=1)
    reads_f = np.full((B, L), -1, np.int8)
    reads_r = np.full((B, L), -1, np.int8)
    lengths = np.zeros(B, np.int32)
    for i, s in enumerate(seqs):
        l = min(len(s), L)
        reads_f[i, :l] = s[:l]
        reads_r[i, :l] = revcomp(np.asarray(s[:l], np.int8))
        lengths[i] = l
    return reads_f, reads_r, lengths
