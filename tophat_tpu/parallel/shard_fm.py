"""FM-index range sharding over the genome axis.

When the index outgrows one chip's HBM (or to scale search bandwidth),
the genome is cut into equal ranges with an overlap margin; each device
on the "genome" mesh axis holds the FM-index of its range and searches
the full read batch locally; per-shard hits rebase to global coordinates
and merge with an all_gather over the genome axis. This is the "index
sharding (TP-like) with lookups routed by collectives" design option
recorded in SURVEY.md §2.5 — the reference itself has no analog (bowtie
maps everything against one whole-genome index, src/tophat.py:2286).

Correctness contract: any alignment whose start lies in shard i's owned
range [i*W, (i+1)*W) is fully contained in shard i's slice because the
slice extends `overlap` >= max_read_len - 1 bases past the owned range;
hits starting inside the margin are dropped locally (the next shard owns
them), so the merged set equals the single-index result exactly.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tophat_tpu.index.fasta import Genome
from tophat_tpu.index.fm import FMIndex, build_fm_index
from tophat_tpu.parallel.dist import shard_map
from tophat_tpu.parallel.mesh import GENOME_AXIS, READS_AXIS
from jax.sharding import PartitionSpec as P


def build_sharded_fm(genome: Genome, n_shards: int, overlap: int,
                     kmer_k: int = 0, sa_rate: int = 0
                     ) -> Tuple[FMIndex, np.ndarray]:
    """Build n_shards range sub-indexes, stacked leaf-wise on a leading
    shard axis (so one FMIndex pytree shards over the mesh's genome axis
    with PartitionSpec(GENOME_AXIS) on every leaf).

    Returns (stacked_fm, shard_starts). All slices pad to equal width;
    padding is N (code 4). Note build_fm_index maps N to A in the FM text,
    so pad runs DO enter backward search as A-runs and can occupy per-seed
    hit slots on A-rich reads in the last shard; they are rejected
    afterwards — verification re-counts them as mismatches via n_mask, and
    the ownership/contig filters drop anything starting past the owned
    width — so padding never produces a spurious reported hit (it can only
    cost hit-budget slots, like any other near-miss candidate).
    """
    codes = np.asarray(genome.codes)
    n = codes.shape[0]
    w = (n + n_shards - 1) // n_shards          # owned width
    width = w + overlap                          # slice width (padded)
    subs = []
    starts = np.arange(n_shards, dtype=np.int64) * w
    for i in range(n_shards):
        s = int(starts[i])
        sl = codes[s: min(n, s + width)]
        if sl.shape[0] < width:
            sl = np.concatenate(
                [sl, np.full(width - sl.shape[0], 4, np.int8)])
        sub = build_fm_index(Genome(codes=sl,
                                    offsets=np.array([0, width]),
                                    names=["shard"]), kmer_k=kmer_k,
                             sa_rate=sa_rate)
        subs.append(sub)
    leaves = [jax.tree_util.tree_leaves(s) for s in subs]
    treedef = jax.tree_util.tree_structure(subs[0])
    stacked = [np.stack([leaves[i][j] for i in range(n_shards)])
               for j in range(len(leaves[0]))]
    return jax.tree_util.tree_unflatten(treedef, stacked), starts


def make_sharded_align(mesh, *, owned_width: int, max_mismatches: int = 2,
                       hits_per_seed: int = 16, max_alignments: int = 16,
                       kmer_fast: bool = False, resolve_cap: int = 0,
                       uniform_len: int = 0):
    """Jitted fn(fm_stacked, shard_starts, offsets, reads_f, reads_r,
    lengths) -> (pos, strand, mm, valid, n_hits, truncated) with reads
    sharded over READS_AXIS, the index sharded over GENOME_AXIS, outputs
    sharded over reads and replicated over genome. Hit ordering matches
    the single-index _align_batch_core exactly: valid-first, then
    (strand, pos) — required for byte-identical pipeline outputs."""
    from tophat_tpu.ops.align import NEG, _align_batch_core
    from tophat_tpu.ops.verify import same_contig

    def local(fm, starts, offsets, reads_f, reads_r, lengths):
        fm1 = jax.tree_util.tree_map(lambda x: x[0], fm)
        start = starts[0]
        # search against the local sub-index in local coordinates; the
        # sub-index is one padded contig, so pass trivial local offsets
        # and apply the real contig filter after rebasing
        local_off = jnp.asarray([0, fm1.n], jnp.int32)
        al = _align_batch_core(fm1, reads_f, reads_r, lengths, local_off,
                               max_mismatches=max_mismatches,
                               hits_per_seed=hits_per_seed,
                               max_alignments=max_alignments,
                               kmer_fast=kmer_fast,
                               resolve_cap=resolve_cap,
                               uniform_len=uniform_len)
        owned = al.valid & (al.pos < owned_width)
        gpos = al.pos + start.astype(al.pos.dtype)
        owned &= same_contig(offsets, gpos, lengths[:, None])
        gpos = jnp.where(owned, gpos, -NEG)

        # merge across genome shards: gather all shards' tables and
        # compact valid-first, position-sorted
        pos_g = jax.lax.all_gather(gpos, GENOME_AXIS, axis=1, tiled=True)
        st_g = jax.lax.all_gather(al.strand.astype(jnp.int32),
                                  GENOME_AXIS, axis=1, tiled=True)
        mm_g = jax.lax.all_gather(al.mm.astype(jnp.int32), GENOME_AXIS,
                                  axis=1, tiled=True)
        va_g = jax.lax.all_gather(owned.astype(jnp.int32), GENOME_AXIS,
                                  axis=1, tiled=True)
        inval = 1 - va_g
        _, st_s, pos_s, mm_s, va_s = jax.lax.sort(
            (inval, st_g, pos_g, mm_g, va_g), dimension=1, num_keys=3)
        sl = slice(0, max_alignments)
        n_hits = va_g.sum(axis=1).astype(jnp.int32)
        trunc = jax.lax.psum(al.truncated.astype(jnp.int32),
                             GENOME_AXIS) > 0
        return (pos_s[:, sl], st_s[:, sl].astype(jnp.int8),
                mm_s[:, sl].astype(jnp.int8), va_s[:, sl].astype(bool),
                n_hits, trunc)

    fn = shard_map(
        local, mesh,
        in_specs=(P(GENOME_AXIS),  # prefix spec: every FMIndex leaf
                  P(GENOME_AXIS), P(), P(READS_AXIS),
                  P(READS_AXIS), P(READS_AXIS)),
        out_specs=(P(READS_AXIS), P(READS_AXIS), P(READS_AXIS),
                   P(READS_AXIS), P(READS_AXIS), P(READS_AXIS)))
    return jax.jit(fn)


def make_sharded_align_rows(mesh, *, owned_width: int, max_mismatches: int,
                            hits_per_seed: int, max_hits: int):
    """Forward-text-only variant of make_sharded_align for genome-space
    rows (segment mapping). fn(fm_stacked, shard_starts, offsets, reads,
    lengths) -> (pos, mm, valid, n_hits, truncated); ordering matches
    _align_forward_rows_jit (valid-first, then pos)."""
    from tophat_tpu.ops.align import NEG, _align_one_strand
    from tophat_tpu.ops.verify import same_contig

    def local(fm, starts, offsets, reads, lengths):
        fm1 = jax.tree_util.tree_map(lambda x: x[0], fm)
        start = starts[0]
        cand, mm, valid, trunc = _align_one_strand(
            fm1, reads, lengths, max_mismatches, hits_per_seed)
        owned = valid & (cand < owned_width)
        gpos = cand + start.astype(cand.dtype)
        owned &= same_contig(offsets, gpos, lengths[:, None])
        gpos = jnp.where(owned, gpos, -NEG)

        pos_g = jax.lax.all_gather(gpos, GENOME_AXIS, axis=1, tiled=True)
        mm_g = jax.lax.all_gather(mm.astype(jnp.int32), GENOME_AXIS,
                                  axis=1, tiled=True)
        va_g = jax.lax.all_gather(owned.astype(jnp.int32), GENOME_AXIS,
                                  axis=1, tiled=True)
        inval = 1 - va_g
        _, pos_s, mm_s, va_s = jax.lax.sort(
            (inval, pos_g, mm_g, va_g), dimension=1, num_keys=2)
        sl = slice(0, max_hits)
        n_hits = va_g.sum(axis=1).astype(jnp.int32)
        trunc = jax.lax.psum(trunc.astype(jnp.int32), GENOME_AXIS) > 0
        return (pos_s[:, sl], mm_s[:, sl].astype(jnp.int8),
                va_s[:, sl].astype(bool), n_hits, trunc)

    fn = shard_map(
        local, mesh,
        in_specs=(P(GENOME_AXIS), P(GENOME_AXIS), P(), P(READS_AXIS),
                  P(READS_AXIS)),
        out_specs=(P(READS_AXIS), P(READS_AXIS), P(READS_AXIS),
                   P(READS_AXIS), P(READS_AXIS)))
    return jax.jit(fn)


def make_sharded_beam_rows(mesh, *, owned_width: int, max_hits: int,
                           plan: dict):
    """Half-split + variant (full -v sensitivity) segment search against
    the range-sharded index: each genome shard runs the beam core over
    its sub-index with local ownership filtering, flat verified hits
    all_gather over the genome axis, and one shared per-row sort/dedup
    pack — results bit-identical to the single-index beam (ops/beam.py).
    fn(fm_stacked, shard_starts, offsets, reads, lengths) ->
    (pos, mm, valid, n_hits, truncated)."""
    from tophat_tpu.ops.beam import _beam_core, _pack_rows

    def local(fm, starts, offsets, reads, lengths):
        fm1 = jax.tree_util.tree_map(lambda x: x[0], fm)
        start = starts[0]
        B = reads.shape[0]
        local_off = jnp.asarray([0, fm1.n], jnp.int32)
        f_seg, f_pos, f_mm, trunc = _beam_core(
            fm1, reads, lengths, local_off, max_hits=max_hits,
            owned_width=owned_width, flat_out=True, **plan)
        gpos = jnp.where(f_seg < B, f_pos + start.astype(f_pos.dtype),
                         f_pos)
        # re-check the real contig bounds after rebasing (the local
        # search only saw the one padded shard contig)
        from tophat_tpu.ops.verify import same_contig

        len_l = jnp.take(jnp.concatenate([lengths, jnp.zeros(1,
                         lengths.dtype)]), jnp.minimum(f_seg, B))
        ok = (f_seg < B) & same_contig(offsets, gpos, len_l)
        f_seg = jnp.where(ok, f_seg, B)
        gpos = jnp.where(ok, gpos, jnp.int32(2 ** 30))
        seg_g = jax.lax.all_gather(f_seg, GENOME_AXIS, axis=0, tiled=True)
        pos_g = jax.lax.all_gather(gpos, GENOME_AXIS, axis=0, tiled=True)
        mm_g = jax.lax.all_gather(f_mm, GENOME_AXIS, axis=0, tiled=True)
        pos_t, mm_t, val_t, n_hits = _pack_rows(seg_g, pos_g, mm_g, B,
                                                max_hits)
        trunc = jax.lax.psum(trunc.astype(jnp.int32), GENOME_AXIS) > 0
        trunc |= n_hits > max_hits
        return pos_t, mm_t, val_t, n_hits, trunc

    fn = shard_map(
        local, mesh,
        in_specs=(P(GENOME_AXIS), P(GENOME_AXIS), P(), P(READS_AXIS),
                  P(READS_AXIS)),
        out_specs=(P(READS_AXIS), P(READS_AXIS), P(READS_AXIS),
                   P(READS_AXIS), P(READS_AXIS)))
    return jax.jit(fn)
