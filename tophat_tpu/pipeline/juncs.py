"""Junction / indel discovery driver (the segment_juncs stage).

Host glue around the device scans in ops/splice.py: segment hit tables ->
pair windows -> motif scans -> unique event table. Output is the unified
event table consumed by ops/events.realign_events (the tmp/segment.juncs,
.insertions, .deletions files of the reference, kept in memory:
reference src/segment_juncs.cpp:5186 driver writes them to disk).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from tophat_tpu.ops.events import MAX_INS
from tophat_tpu.ops.splice import (KIND_DELETION, KIND_FUSION,
                                   KIND_INSERTION, KIND_JUNCTION,
                                   build_fusion_windows, build_indel_pairs,
                                   build_pair_windows, compact_scan_hits,
                                   compact_windows, scan_fusion_windows,
                                   scan_indel_pairs, scan_windows)
from tophat_tpu.pipeline.segment import GenomeSpaceReads, map_segments

MAX_WINDOWS = 32768
# junction scan hits are capped independently of the window count — every
# window can yield several motif hits, so tying the two caps silently
# dropped candidates at scale (round-4 advisor finding)
MAX_SCAN_HITS = MAX_WINDOWS * 4
MAX_INDEL_PAIRS = 16384
LOOK_BP_SUP = 8  # fusion support half-window (= ops.splice.LOOK_BP)


def empty_events() -> Dict[str, np.ndarray]:
    return dict(left=np.zeros(0, np.int32), right=np.zeros(0, np.int32),
                kind=np.zeros(0, np.int8), antisense=np.zeros(0, bool),
                ins_len=np.zeros(0, np.int8),
                ins_seq=np.zeros((0, MAX_INS), np.int8))


def merge_events(*tables: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k in empty_events():
        out[k] = np.concatenate([t[k] for t in tables])
    return dedup_events(out)


def dedup_events(ev: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Unique by (kind, left, right, antisense) — first occurrence wins.

    Insertions carrying different sequences at the same coordinate collapse
    to the FIRST one seen (in read order): the gold-era pipeline keys its
    insertion set by position, so a later read whose sequencing error
    produces a variant inserted sequence cannot shadow the true one
    (v1.1.4 std::set<Insertion> insert semantics; 2.1.2 widened the key to
    include the sequence, insertions.h:31, but the regression gold predates
    that)."""
    if len(ev["left"]) == 0:
        return ev
    key = np.stack([ev["kind"].astype(np.int64), ev["left"].astype(np.int64),
                    ev["right"].astype(np.int64),
                    ev["antisense"].astype(np.int64)], axis=1)
    _, idx = np.unique(key, axis=0, return_index=True)
    idx = np.sort(idx)
    return {k: v[idx] for k, v in ev.items()}


def _library_type_keep(params, strands, rev, read_side):
    """Strand-specific protocols restrict which splice directions a read
    may support (reference: juncs_from_ref_segs skip_fwd/skip_rev,
    segment_juncs.cpp:2110-2137). strands: per-window row strand;
    rev: per-window motif direction; read_side: 0 left mate, 1 right."""
    if params.library_type == "fr-unstranded":
        return np.ones_like(rev, bool)
    anti = strands.astype(bool)
    side_right = read_side == 1
    skip_rev = anti ^ side_right        # fr-firststrand rule
    if params.library_type == "fr-secondstrand":
        skip_rev = ~skip_rev
    return np.where(rev, ~skip_rev, skip_rev)


def discover_events(fm, offsets, gs: GenomeSpaceReads, params,
                    seg_tables=None, log=None,
                    read_side: int = 0) -> Dict[str, np.ndarray]:
    """Split-segment junction search + small-indel detection for one batch
    of genome-space reads. Returns the deduped event table."""
    if gs.rows == 0:
        return empty_events()
    if seg_tables is None:
        seg_tables = map_segments(
            fm, offsets, gs, segment_mismatches=params.segment_mismatches,
            hits_per_seed=params.hits_per_seed, max_hits=16)
    seg_pos, seg_mm, seg_valid = seg_tables

    readsg = jnp.asarray(gs.readsg)
    cuts = jnp.asarray(gs.cuts)
    nseg = jnp.asarray(gs.nseg)
    lengths = jnp.asarray(gs.lengths)

    # --- junction windows -------------------------------------------------
    win = build_pair_windows(
        jnp.asarray(seg_pos), jnp.asarray(seg_valid), cuts, nseg, lengths,
        params.min_segment_intron, params.max_segment_intron,
        params.segment_length)
    win, w_ovf = compact_windows(win, MAX_WINDOWS)
    sup_max = int(np.max(gs.cuts[:, 1:] - gs.cuts[:, :-1])) + 16 + 1
    jl, jr, jrev, jvalid = scan_windows(fm.genome, readsg, win, sup_max)
    cl, cr, crev, crow, ccnt, covf = compact_scan_hits(
        jnp.asarray(jl), jnp.asarray(jr), jnp.asarray(jrev),
        jnp.asarray(jvalid), jnp.asarray(win.row), MAX_SCAN_HITS)
    cnt = int(ccnt)
    if bool(covf):
        import warnings

        warnings.warn(
            f"junction scan hits overflowed {MAX_SCAN_HITS} slots; "
            "some candidates were dropped (raise MAX_SCAN_HITS or "
            "reduce the chunk size)", stacklevel=2)
    jl = np.asarray(cl)[:cnt]
    jr = np.asarray(cr)[:cnt]
    jrev = np.asarray(crev)[:cnt].astype(bool)
    if params.library_type != "fr-unstranded":
        row_strand = gs.strand[np.asarray(crow)[:cnt]]
        keep_dir = _library_type_keep(params, row_strand, jrev, read_side)
        jl, jr, jrev = jl[keep_dir], jr[keep_dir], jrev[keep_dir]
    juncs = dict(left=jl.astype(np.int32), right=jr.astype(np.int32),
                 kind=np.full(len(jl), KIND_JUNCTION, np.int8),
                 antisense=jrev.astype(bool),
                 ins_len=np.zeros(len(jl), np.int8),
                 ins_seq=np.full((len(jl), MAX_INS), -1, np.int8))

    # --- indels -----------------------------------------------------------
    indels = empty_events()
    if params.allow_indels:
        pairs, p_ovf = build_indel_pairs(
            jnp.asarray(seg_pos), jnp.asarray(seg_mm), jnp.asarray(seg_valid),
            cuts, nseg, params.max_deletion_length,
            params.max_insertion_length, MAX_INDEL_PAIRS)
        two_seg_max = int(2 * np.max(gs.cuts[:, 1:] - gs.cuts[:, :-1])) + 1
        kind, left, right, ins_len, valid, best_t, rowf, ins_off = (
            scan_indel_pairs(fm.genome, readsg, lengths, pairs, two_seg_max))
        valid = np.asarray(valid)
        kind, left, right = (np.asarray(kind)[valid], np.asarray(left)[valid],
                             np.asarray(right)[valid])
        ins_len = np.asarray(ins_len)[valid]
        rowf = np.asarray(rowf)[valid]
        ins_off = np.asarray(ins_off)[valid]
        ins_seq = np.full((len(kind), MAX_INS), -1, np.int8)
        for i in range(len(kind)):
            if kind[i] == KIND_INSERTION and ins_len[i] > 0:
                s = gs.readsg[rowf[i], ins_off[i]: ins_off[i] + ins_len[i]]
                ins_seq[i, : len(s)] = s
        indels = dict(left=left.astype(np.int32), right=right.astype(np.int32),
                      kind=kind.astype(np.int8),
                      antisense=np.zeros(len(kind), bool),
                      ins_len=ins_len.astype(np.int8), ins_seq=ins_seq)

    # --- fusions (FF pairs; reference: detect_fusion path) -----------------
    fusions = empty_events()
    if params.fusion_search:
        fwin = build_fusion_windows(
            jnp.asarray(seg_pos), jnp.asarray(seg_valid), cuts, nseg,
            lengths, offsets, params.fusion_min_dist)
        fwin, _ = compact_windows(fwin, MAX_WINDOWS)
        fl, fr, fmm, fvalid = scan_fusion_windows(fm.genome, readsg, fwin,
                                                  sup_max)
        fvalid = np.asarray(fvalid)
        fl = np.asarray(fl)[fvalid]
        fr = np.asarray(fr)[fvalid]
        fusions = dict(left=fl.astype(np.int32), right=fr.astype(np.int32),
                       kind=np.full(len(fl), KIND_FUSION, np.int8),
                       antisense=np.zeros(len(fl), bool),
                       ins_len=np.zeros(len(fl), np.int8),
                       ins_seq=np.full((len(fl), MAX_INS), -1, np.int8))

    ev = merge_events(juncs, indels, fusions)

    # contig-consistency guard: junctions/deletions must not span contig
    # boundaries of the concatenated genome; fusions are exempt
    if len(ev["left"]):
        offs = np.asarray(offsets, np.int64)
        cid_l = np.searchsorted(offs, ev["left"], side="right")
        cid_r = np.searchsorted(offs, ev["right"], side="right")
        keep = ((ev["kind"] == KIND_FUSION)
                | (ev["kind"] == KIND_INSERTION)
                | ((cid_l == cid_r) & (ev["left"] < ev["right"])))
        ev = {k: v[keep] for k, v in ev.items()}

    if log:
        nj = int((ev["kind"] == KIND_JUNCTION).sum())
        nd = int((ev["kind"] == KIND_DELETION).sum())
        ni = int((ev["kind"] == KIND_INSERTION).sum())
        log(f"Found {nj} potential split-segment junctions")
        log(f"Found {nd} potential small deletions")
        log(f"Found {ni} potential small insertions")
        if params.fusion_search:
            nf = int((ev["kind"] == KIND_FUSION).sum())
            log(f"Found {nf} potential fusions")
    return ev
