"""Contiguous segment stitching.

The reference's long_spanning_reads joins per-segment hits into full-read
alignments (reference: src/long_spanning_reads.cpp:2612
join_segments_for_read; contiguous case in merge_chain :805). A key
consequence of stitching: each SEGMENT obeys the 2-mismatch bowtie limit, so
a stitched full-read alignment may carry up to 2*nseg mismatches — more
than the full-read mapping limit (the gold regression outputs contain 24M
alignments with NM:i:3..5 that can only arise this way).

Here the contiguous case is one fixed-shape device op over the segment hit
tables: a chain exists for seg-0 hit h iff every following segment has a hit
at exactly the previous segment's end. Junction/indel-crossing chains are
covered separately by event realignment (ops/events.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def stitch_contiguous(seg_pos, seg_mm, seg_valid, cuts, nseg):
    """seg_pos/seg_mm/seg_valid: (R, S, H) genome-space segment hit tables;
    cuts: (R, S+1); nseg: (R,).

    Returns (pos, mm, ok): (R, H) — for each seg-0 hit slot, the stitched
    full-read placement (pos = seg-0 hit position), the summed mismatch
    count, and whether a complete contiguous chain exists."""
    R, S, H = seg_pos.shape
    seg_len = cuts[:, 1:] - cuts[:, :-1]                 # (R, S)

    pos0 = seg_pos[:, 0, :]
    ok = seg_valid[:, 0, :]
    total_mm = jnp.where(ok, seg_mm[:, 0, :].astype(jnp.int32), 0)
    nxt = pos0 + seg_len[:, 0][:, None]

    for j in range(1, S):
        needed = (j < nseg)[:, None]                     # (R, 1)
        match = ((seg_pos[:, j, None, :] == nxt[:, :, None])
                 & seg_valid[:, j, None, :])             # (R, H, H)
        found = match.any(-1)
        mmj = jnp.sum(match * seg_mm[:, j, None, :].astype(jnp.int32), -1)
        ok &= jnp.where(needed, found, True)
        total_mm += jnp.where(needed & found, mmj, 0)
        nxt = nxt + seg_len[:, j][:, None]
    return pos0, total_mm, ok
