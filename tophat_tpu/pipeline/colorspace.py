"""Colorspace (SOLiD) pipeline driver.

Composition (reference: the -C/--color driver path, src/tophat.py:2896-2928):

1. COLOR-NATIVE genome alignment: reads align as colors against the
   color-transformed FM index (io/color.genome_to_color) — a sequencing
   error costs one color mismatch instead of corrupting every downstream
   base (the point of SOLiD chemistry; bowtie -C equivalent).
2. Placed reads decode reference-guided (io/color.decode_alignment):
   isolated color mismatches become sequencing errors (reference base),
   adjacent consistent pairs become real SNPs — the greedy form of the
   reference's BWA_decode.
3. The decoded base-space batch then runs the STANDARD pipeline (all
   spliced machinery, filters, reporting) — color-unplaced reads fall back
   to the primer-chain decode, so junction-spanning colorspace reads reach
   the split-segment search in base space. Difference from the reference
   (which keeps segments in color space through juncs_db): documented in
   COVERAGE.md.
"""

from __future__ import annotations

import numpy as np

from tophat_tpu.index.fasta import Genome, decode_seq
from tophat_tpu.index.fm import build_fm_index
from tophat_tpu.io.color import (decode_alignment, decode_chain,
                                 genome_to_color)
from tophat_tpu.io.fastq import ReadBatch, batch_reads


def color_genome(genome: Genome) -> Genome:
    """Color-space view of the concatenated genome: n-1 transition codes,
    contig-boundary transitions masked to N.

    Each interior boundary transition becomes its own singleton interval in
    the offsets table: contig k owns colors [off[k], off[k+1]-1) only, so a
    color alignment whose first/last color is the masked boundary
    transition (code 4 — one mismatch, absorbable by the budget) fails
    same_contig instead of decoding one base into the neighboring contig.
    `names` intentionally keeps the base-space contig list: these offsets
    feed only the same_contig filter, never contig naming."""
    ccodes = genome_to_color(np.asarray(genome.codes), genome.offsets)
    nc = len(ccodes)
    interior = np.asarray(genome.offsets)[1:-1]
    offs = np.unique(np.concatenate(
        [[0], np.clip(interior - 1, 0, nc), np.clip(interior, 0, nc),
         [nc]])).astype(genome.offsets.dtype)
    return Genome(codes=ccodes, offsets=offs, names=list(genome.names))


def align_colors(cfm, coffsets, gbase, records, params, log=print):
    """Color-native ungapped alignment of (name, primer, colors, qual)
    records against the color index; `gbase` is the BASE genome for the
    reference-guided decode. Returns (decoded_records, n_placed):
    base-space (name, seq, qual) tuples — reference-guided decode for
    placed reads, primer-chain decode for the rest."""
    from tophat_tpu.ops.align import align_reads

    names = [r[0] for r in records]
    primers = [r[1] for r in records]
    colors_all = [np.asarray(r[2], np.int8) for r in records]
    quals = [r[3] for r in records]
    B = len(records)
    if B == 0:
        return [], 0
    # alignment colors: drop the primer transition (bowtie -C trims the
    # primer base and first color)
    acolors = [c[1:] for c in colors_all]
    L = max((len(c) for c in acolors), default=1)
    cf = np.full((B, L), -1, np.int8)
    cr = np.full((B, L), -1, np.int8)
    lens = np.zeros(B, np.int32)
    for i, c in enumerate(acolors):
        cf[i, : len(c)] = c
        cr[i, : len(c)] = c[::-1]   # colors are complement-invariant
        lens[i] = len(c)
    al = align_reads(cfm, cf, cr, lens, coffsets,
                     max_mismatches=params.read_mismatches,
                     max_alignments=4)
    pos = np.asarray(al.pos)
    strand = np.asarray(al.strand)
    valid = np.asarray(al.valid)

    decoded = []
    n_placed = 0
    for i in range(B):
        c = acolors[i]
        hit = np.nonzero(valid[i])[0]
        if len(hit):
            h = hit[0]
            p = int(pos[i, h])
            cc = c if strand[i, h] == 0 else c[::-1]
            bases, cmm, _ = decode_alignment(gbase, p, cc)
            if strand[i, h] != 0:
                from tophat_tpu.index.fasta import revcomp

                bases = revcomp(bases)  # back to as-sequenced orientation
            seq = decode_seq(bases)
            n_placed += 1
        else:
            # chain decode covers every color incl. the primer transition:
            # L colors -> L bases (base1..baseL)
            seq = decode_seq(decode_chain(primers[i], colors_all[i]))
        q = quals[i]
        if len(q) < len(seq):
            q = q + b"I" * (len(seq) - len(q))
        decoded.append((names[i], seq.encode(), q[: len(seq)]))
    if log:
        log(f"colorspace: {n_placed}/{B} reads placed color-natively, "
            f"{B - n_placed} primer-chain decoded")
    return decoded, n_placed


def run_pipeline_color(genome: Genome, records, params, out_dir,
                       records2=None, fm=None, known_events=None,
                       gtf_accept=None, log=print):
    """Full colorspace run: color-native decode stage + standard base-space
    pipeline on the decoded batch(es). `records`/`records2`: iterables of
    (name, primer_code, colors int8, qual) from io/color.read_csfasta or
    the colorspace-FASTQ parser; records2 enables the paired path."""
    from tophat_tpu.pipeline.run import run_pipeline

    records = list(records)
    records2 = list(records2) if records2 is not None else None
    cgen = color_genome(genome)
    log(f"building colorspace FM index ({len(cgen.codes)} transitions)")
    big = len(cgen.codes) > (1 << 28)
    cfm = build_fm_index(cgen, kmer_k=13 if big else 0,
                         sa_rate=4 if big else 0)
    coff = cgen.offsets.astype(np.int32)
    gbase = np.asarray(genome.codes)
    decoded, _ = align_colors(cfm, coff, gbase, records, params, log=log)
    decoded2 = None
    if records2 is not None:
        decoded2, _ = align_colors(cfm, coff, gbase, records2, params,
                                   log=log)
    from tophat_tpu.parallel import auto

    auto.release(cfm)   # evict from the replication cache too — otherwise
    auto.release(coff)  # the throwaway color index stays pinned in HBM
    del cfm             # through the whole base-space pipeline below
    if decoded2 is not None:
        from tophat_tpu.pipeline.paired import run_pipeline_paired

        return run_pipeline_paired(genome, batch_reads(decoded),
                                   batch_reads(decoded2), params, out_dir,
                                   fm=fm, known_events=known_events,
                                   gtf_accept=gtf_accept, log=log)
    return run_pipeline(genome, batch_reads(decoded), params, out_dir,
                        fm=fm, known_events=known_events,
                        gtf_accept=gtf_accept, log=log)
