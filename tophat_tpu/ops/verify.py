"""Candidate-alignment verification: vectorized gather + mismatch count.

Replaces the per-hit verification work Bowtie does internally and the SeqAn
pattern-finding TopHat uses for window scans (reference:
src/segment_juncs.cpp:2390 simpleSplitAlignment uses Myers bit-vector find).
On TPU the whole candidate table is verified at once: one genome gather of
shape (B, C, L) plus elementwise compares on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def gather_windows(genome, pos, L: int):
    """genome: (n,) int8; pos: (...,) int32 -> windows (..., L) int8.

    Out-of-range bases read as code 5 (never matches anything, also != N).
    """
    genome = jnp.asarray(genome)
    n = genome.shape[0]
    idx = pos[..., None] + jnp.arange(L, dtype=jnp.int32)
    inb = (idx >= 0) & (idx < n)
    g = genome[jnp.clip(idx, 0, n - 1)]
    return jnp.where(inb, g, jnp.int8(5))


def count_mismatches(window, read, read_len):
    """Mismatches between window (..., L) and read codes (..., L) over the
    first read_len (...,) bases. N (code 4) on either side mismatches, as in
    Bowtie's treatment of ambiguous bases."""
    L = read.shape[-1]
    t = jnp.arange(L, dtype=jnp.int32)
    in_read = t < read_len[..., None]
    mm = (window != read) | (window >= 4) | (read >= 4)
    return jnp.sum(mm & in_read, axis=-1).astype(jnp.int32)


def same_contig(offsets, pos, read_len):
    """True where [pos, pos+read_len) lies inside one contig of the
    concatenated genome (offsets: (num_contigs+1,) int64/int32)."""
    offsets = jnp.asarray(offsets).astype(jnp.int32)
    a = jnp.searchsorted(offsets, pos, side="right")
    b = jnp.searchsorted(offsets, pos + read_len - 1, side="right")
    return a == b
