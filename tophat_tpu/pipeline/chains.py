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


@dataclasses.dataclass
class ChainCandidate:
    read: int
    strand: int
    pos: int                 # genome start of the first piece
    mm: int
    ops: List[Tuple]         # [("M", len)] and ("EV", ev_idx, kind, gap)
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
