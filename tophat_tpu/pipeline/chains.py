"""Multi-event chain stitching: the full long_spanning_reads join.

The single-event realignment (ops/events.py) covers reads crossing ONE
junction/indel/fusion. Reads crossing several events (a fusion whose pieces
are themselves spliced, long reads spanning two introns — the reference's
dfs_seg_hits/merge_chain territory, long_spanning_reads.cpp:2222,805) are
assembled here: every segment gets genomic hits plus event-crossing hits
(the reference's flank-record spliced hits), and a bounded DFS chains
adjacent segments whose genome coordinates are contiguous, accumulating the
crossed events.

Only chains crossing >= 2 events are emitted — 0- and 1-event placements are
already produced by stitch_contiguous and realign_events, which keeps the
byte-exact regression behavior untouched.

Host-side for now (IUM reads only; the per-segment event table is computed
on device); the DP moves on-device in a later round.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np

from tophat_tpu.ops.events import realign_events
from tophat_tpu.ops.splice import (KIND_DELETION, KIND_FUSION,
                                   KIND_INSERTION, KIND_JUNCTION)

MAX_TRIES = 10000   # reference: long_spanning_reads.cpp:2647
MAX_EVENTS_PER_CHAIN = 3
MAX_FUSIONS_PER_CHAIN = 1  # reference rejects >=2 fusions (:2698-2700)
CROSS_EXT_MM = 2    # mismatch budget for fusion-break extensions


@dataclasses.dataclass
class ChainCandidate:
    read: int
    strand: int
    pos: int                 # genome start of the first piece
    mm: int
    ops: List[Tuple]         # ("M", len) | ("EV", ev, kind, gap) |
                             # ("FUS", partner_pos, dir)
    events: Tuple[int, ...]  # crossed event indices, in read order

    @property
    def edit_dist(self) -> int:
        e = self.mm
        for op in self.ops:
            if op[0] == "EV" and op[2] in (KIND_DELETION, KIND_INSERTION):
                e += op[3]
        return e

    @property
    def n_fusions(self) -> int:
        return sum(1 for op in self.ops
                   if op[0] == "EV" and op[2] == KIND_FUSION)


def _segment_event_hits(fm, gs, events, params):
    """Per-segment event-crossing hits: realign every segment row against
    the event table. Returns (best_t, mm, ok) shaped (rows*S, E)."""
    rows, S = gs.cuts.shape[0], gs.cuts.shape[1] - 1
    seg_len = gs.cuts[:, 1:] - gs.cuts[:, :-1]
    SEGL = int(seg_len.max()) if rows else 1
    L = gs.readsg.shape[1]
    t = np.arange(SEGL)
    src = gs.cuts[:, :-1][:, :, None] + t[None, None, :]
    ok = t[None, None, :] < seg_len[:, :, None]
    seg_reads = np.where(
        ok, np.take_along_axis(gs.readsg,
                               np.clip(src, 0, L - 1).reshape(rows, -1),
                               axis=1).reshape(rows, S, SEGL),
        -1).reshape(rows * S, SEGL).astype(np.int8)
    ev = dict(events)
    ev["valid"] = np.ones(len(ev["left"]), bool)
    return realign_events(
        fm.genome, seg_reads, np.maximum(seg_len.reshape(-1), 1).astype(
            np.int32), ev, max_mm=params.segment_mismatches), seg_len


def _row_hit_lists(gs, seg_tables, seg_ev, events, row):
    """Per-segment hit lists for one genome-space row:
    [(start, end, mm, ev, t_seg)], genomic + event-crossing."""
    seg_pos, seg_mm, seg_valid, seg_len = seg_tables
    ev_t, ev_mm, ev_ok = seg_ev
    kinds = events["kind"]
    lefts = events["left"]
    rights = events["right"]
    ilens = events["ins_len"]
    nseg = int(gs.nseg[row])
    H = seg_pos.shape[2]
    hits = []
    for j in range(nseg):
        slen = int(seg_len[row, j])
        lst = []
        for h in range(H):
            if seg_valid[row, j, h]:
                p = int(seg_pos[row, j, h])
                lst.append((p, p + slen, int(seg_mm[row, j, h]), -1, 0))
        for e in np.nonzero(ev_ok[row, j])[0]:
            t = int(ev_t[row, j, e])
            kind = int(kinds[e])
            start = int(lefts[e]) - t + 1
            if kind == KIND_INSERTION:
                end = int(lefts[e]) + 1 + (slen - t - int(ilens[e]))
            else:
                end = int(rights[e]) + (slen - t)
            lst.append((start, end, int(ev_mm[row, j, e]), int(e), t))
        hits.append(lst)
    return hits, nseg


def _prefix_chains(hits, nseg, max_out=16):
    """All contiguous chains covering segments 0..j (any j), as
    (j, genome_end, mm, events, path). Bounded enumeration."""
    out = []
    frontier = [(-1, None, 0, (), ())]
    for j in range(nseg):
        nxt = []
        for (_, end, mm, evs, path) in frontier:
            for (s, e, hmm, ev, t) in hits[j]:
                if j > 0 and s != end:
                    continue
                nevs = evs + (ev,) if ev >= 0 else evs
                if len(nevs) > MAX_EVENTS_PER_CHAIN:
                    continue
                nxt.append((j, e, mm + hmm, nevs, path + ((s, e, ev, t),)))
        frontier = nxt[:max_out]
        out.extend(frontier)
        if not frontier:
            break
    return out


def _suffix_chains(hits, nseg, max_out=16):
    """All contiguous chains covering segments j..nseg-1, as
    (j, genome_start, mm, events, path)."""
    out = []
    frontier = [(nseg, None, 0, (), ())]
    for j in range(nseg - 1, -1, -1):
        nxt = []
        for (_, start, mm, evs, path) in frontier:
            for (s, e, hmm, ev, t) in hits[j]:
                if j < nseg - 1 and e != start:
                    continue
                nevs = (ev,) + evs if ev >= 0 else evs
                if len(nevs) > MAX_EVENTS_PER_CHAIN:
                    continue
                nxt.append((j, s, mm + hmm, nevs, ((s, e, ev, t),) + path))
        frontier = nxt[:max_out]
        out.extend(frontier)
        if not frontier:
            break
    return out


def chain_stitch(fm, gs, seg_tables, events, params,
                 max_chains_per_read: int = 8) -> List[ChainCandidate]:
    """Assemble multi-event chains for every genome-space row."""
    if gs.rows == 0 or len(events["left"]) == 0:
        return []
    seg_pos, seg_mm, seg_valid = (np.asarray(x) for x in seg_tables)
    (ev_t, ev_mm, ev_ok), seg_len = _segment_event_hits(fm, gs, events,
                                                        params)
    rows, S, H = seg_pos.shape
    ev_t = ev_t.reshape(rows, S, -1)
    ev_mm = ev_mm.reshape(rows, S, -1)
    ev_ok = ev_ok.reshape(rows, S, -1)
    kinds = events["kind"]
    lefts = events["left"]
    rights = events["right"]
    ilens = events["ins_len"]

    out: List[ChainCandidate] = []
    for row in range(rows):
        nseg = int(gs.nseg[row])
        if nseg < 2:
            continue
        # hit lists per segment: (start, end, mm, ev or -1, t_seg)
        hits: List[List[Tuple[int, int, int, int, int]]] = []
        for j in range(nseg):
            slen = int(seg_len[row, j])
            lst = []
            for h in range(H):
                if seg_valid[row, j, h]:
                    p = int(seg_pos[row, j, h])
                    lst.append((p, p + slen, int(seg_mm[row, j, h]), -1, 0))
            for e in np.nonzero(ev_ok[row, j])[0]:
                t = int(ev_t[row, j, e])
                kind = int(kinds[e])
                start = int(lefts[e]) - t + 1
                if kind == KIND_INSERTION:
                    end = int(lefts[e]) + 1 + (slen - t - int(ilens[e]))
                else:
                    end = int(rights[e]) + (slen - t)
                lst.append((start, end, int(ev_mm[row, j, e]), int(e), t))
            hits.append(lst)
        if not hits[0]:
            continue

        chains = []
        tries = 0

        def dfs(j, end, mm, evs, path):
            nonlocal tries
            if tries > MAX_TRIES or len(chains) >= max_chains_per_read:
                return
            if j == nseg:
                if len(evs) >= 2:
                    chains.append((mm, tuple(evs), tuple(path)))
                return
            for (s, e, hmm, ev, t) in hits[j]:
                tries += 1
                if j > 0 and s != end:
                    continue
                nevs = evs + [ev] if ev >= 0 else evs
                if len(nevs) > MAX_EVENTS_PER_CHAIN:
                    continue
                nf = sum(1 for x in nevs if kinds[x] == KIND_FUSION)
                if nf > MAX_FUSIONS_PER_CHAIN:
                    continue
                dfs(j + 1, e, mm + hmm, nevs, path + [(s, e, ev, t)])

        dfs(0, -1, 0, [], [])
        for mm, evs, path in chains:
            # assemble ops: merge M runs, insert event ops at crossings
            ops: List[Tuple] = []
            for j, (s, e, ev, t) in enumerate(path):
                slen = int(seg_len[row, j])
                if ev < 0:
                    if ops and ops[-1][0] == "M":
                        ops[-1] = ("M", ops[-1][1] + slen)
                    else:
                        ops.append(("M", slen))
                else:
                    kind = int(kinds[ev])
                    gap = (int(ilens[ev]) if kind == KIND_INSERTION
                           else max(int(rights[ev]) - int(lefts[ev]) - 1, 0))
                    pre, post = t, slen - t
                    if kind == KIND_INSERTION:
                        post -= gap
                    if pre:
                        if ops and ops[-1][0] == "M":
                            ops[-1] = ("M", ops[-1][1] + pre)
                        else:
                            ops.append(("M", pre))
                    ops.append(("EV", ev, kind, gap))
                    if post:
                        ops.append(("M", post))
            out.append(ChainCandidate(
                read=int(gs.read_idx[row]), strand=int(gs.strand[row]),
                pos=path[0][0], mm=mm, ops=ops, events=evs))
    return out


def _ops_from_path(path, seg_len_row, events, extend_last=0):
    """Assemble M/EV ops from a chain path ((s, e, ev, t_seg) per segment
    j0..j1); extend_last grows the final M run (fusion-break extension)."""
    kinds = events["kind"]
    lefts = events["left"]
    rights = events["right"]
    ilens = events["ins_len"]
    ops: List[Tuple] = []

    def add_m(n):
        if n <= 0:
            return
        if ops and ops[-1][0] == "M":
            ops[-1] = ("M", ops[-1][1] + n)
        else:
            ops.append(("M", n))

    for idx, (s, e, ev, t) in enumerate(path):
        slen = int(seg_len_row[idx])
        if ev < 0:
            add_m(slen)
        else:
            kind = int(kinds[ev])
            gap = (int(ilens[ev]) if kind == KIND_INSERTION
                   else max(int(rights[ev]) - int(lefts[ev]) - 1, 0))
            post = slen - t - (gap if kind == KIND_INSERTION else 0)
            add_m(t)
            ops.append(("EV", ev, kind, gap))
            add_m(post)
    add_m(extend_last)
    return ops


def cross_strand_chains(fm, gs, seg_tables, events, params,
                        max_pairs: int = 128) -> List[ChainCandidate]:
    """FR/RF fusion chains whose pieces may themselves cross events: pair a
    forward-row prefix (suffix) chain with a reverse-row prefix (suffix)
    chain of the same read and scan the uncovered middle for the fusion
    break. Only pairs crossing >= 1 non-fusion event are emitted — pure
    cross-strand fusions come from ops/fusion_fr.py.

    Reference analog: detect_fusion over reverse-complemented sides
    (segment_juncs.cpp:2629) combined with merge_chain gap closing."""
    if gs.rows == 0 or len(events["left"]) == 0:
        return []
    seg_pos, seg_mm, seg_valid = (np.asarray(x) for x in seg_tables)
    (ev_t, ev_mm, ev_ok), seg_len = _segment_event_hits(fm, gs, events,
                                                        params)
    rows, S, H = seg_pos.shape
    ev_t = ev_t.reshape(rows, S, -1)
    ev_mm = ev_mm.reshape(rows, S, -1)
    ev_ok = ev_ok.reshape(rows, S, -1)
    genome = np.asarray(fm.genome)
    n = genome.shape[0]
    R = rows // 2
    tables4 = (seg_pos, seg_mm, seg_valid, seg_len)
    seg_ev = (ev_t, ev_mm, ev_ok)
    fa = params.fusion_anchor_length

    def ext_mm(read_codes, u0, u1, gpos0, step=1):
        """Mismatches of read_codes[u0:u1] vs genome starting gpos0."""
        if u1 <= u0:
            return 0
        idx = gpos0 + step * np.arange(u1 - u0)
        inb = (idx >= 0) & (idx < n)
        g = np.where(inb, genome[np.clip(idx, 0, n - 1)], 5)
        rp = read_codes[u0:u1]
        return int(((g != rp) | (g >= 4) | (rp >= 4)).sum())

    out: List[ChainCandidate] = []
    for r in range(R):
        rf, rr = r, r + R
        L = int(gs.lengths[rf])
        read_f = gs.readsg[rf]
        read_r = gs.readsg[rr]
        hits_f, nseg_f = _row_hit_lists(gs, tables4, seg_ev, events, rf)
        hits_r, nseg_r = _row_hit_lists(gs, tables4, seg_ev, events, rr)
        if not hits_f or not hits_r:
            continue
        cuts_f = gs.cuts[rf]
        cuts_r = gs.cuts[rr]
        maxseg = int(seg_len[rf].max())

        best = []
        # ---- FR: fwd prefix + rc prefix ----
        pf = _prefix_chains(hits_f, nseg_f)
        pr = _prefix_chains(hits_r, nseg_r)
        tried = 0
        for (ja, endA, mmA, evsA, pathA) in pf:
            covA = int(cuts_f[ja + 1])
            for (jb, endB, mmB, evsB, pathB) in pr:
                tried += 1
                if tried > max_pairs:
                    break
                if not evsA and not evsB:
                    continue
                covB = int(cuts_r[jb + 1])
                mid = L - covA - covB
                if mid < 0 or mid > 2 * maxseg:
                    continue
                # best split in the uncovered middle
                cand = None
                for t in range(max(covA, 1), min(L - covB, L - 1) + 1):
                    e1 = ext_mm(read_f, covA, t, endA)
                    e2 = ext_mm(read_r, covB, L - t, endB)
                    if e1 + e2 <= CROSS_EXT_MM and (cand is None
                                                    or e1 + e2 < cand[1]):
                        cand = (t, e1 + e2)
                if cand is None:
                    continue
                t, ext = cand
                if t < fa or L - t < fa:
                    continue
                ops = _ops_from_path(pathA, seg_len[rf], events,
                                     extend_last=t - covA)
                posB = endB + (L - t - covB) - 1
                ops.append(("FUS", int(posB), "fr"))
                best.append(ChainCandidate(
                    read=int(gs.read_idx[rf]), strand=0,
                    pos=int(pathA[0][0]), mm=mmA + mmB + ext, ops=ops,
                    events=tuple(evsA) + tuple(evsB)))

        # ---- RF: fwd suffix + rc suffix ----
        sf = _suffix_chains(hits_f, nseg_f)
        sr = _suffix_chains(hits_r, nseg_r)
        tried = 0
        for (ja, startA, mmA, evsA, pathA) in sf:
            tA0 = int(cuts_f[ja])
            for (jb, startB, mmB, evsB, pathB) in sr:
                tried += 1
                if tried > max_pairs:
                    break
                if not evsA and not evsB:
                    continue
                tB0 = int(cuts_r[jb])
                # piece B covers read[0 : L - tB0]; piece A covers read[t:]
                lo_t = max(L - tB0 - 0, 1)
                mid = tA0 - (L - tB0)
                if mid < 0 or mid > 2 * maxseg:
                    continue
                cand = None
                for t in range(max(L - tB0, 1), min(tA0, L - 1) + 1):
                    e1 = ext_mm(read_f, t, tA0, startA - (tA0 - t))
                    e2 = ext_mm(read_r, L - t, tB0,
                                startB - (tB0 - (L - t)))
                    if e1 + e2 <= CROSS_EXT_MM and (cand is None
                                                    or e1 + e2 < cand[1]):
                        cand = (t, e1 + e2)
                if cand is None:
                    continue
                t, ext = cand
                if t < fa or L - t < fa:
                    continue
                ops = [("FUS", int(startB + (tB0 - (L - t))), "rf")]
                ops += _ops_from_path(pathA, seg_len[rf][ja:], events)
                # prepend the backward extension to the first M run
                if t < tA0:
                    for i2, op in enumerate(ops):
                        if op[0] == "M":
                            ops[i2] = ("M", op[1] + (tA0 - t))
                            break
                best.append(ChainCandidate(
                    read=int(gs.read_idx[rf]), strand=0,
                    pos=int(startA - (tA0 - t)), mm=mmA + mmB + ext,
                    ops=ops, events=tuple(evsA) + tuple(evsB)))
        out.extend(best[:4])
    return out
