#!/usr/bin/env python
"""Benchmark: FM-index short-read alignment throughput on one TPU chip.

Measures the pipeline's dominant kernel (full-read genome mapping — the
role of the external bowtie2 process that dominates reference TopHat2
runtime) in steady state: batched exact-seed backward search + pigeonhole
verification, both strands, <=2 mismatches.

Baseline: 16-thread TopHat2 end-to-end maps roughly 20M 100bp reads in
4-8 wall-clock hours on a commodity server (Kim et al. 2013 scale, spread
over its bowtie2 + stitching stages), i.e. ~10-20k reads/s for the mapping
stage. vs_baseline uses 20,000 reads/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_READS_PER_S = 20_000.0

GENOME_N = 1 << 22          # 4 Mbp synthetic genome
BATCH = 16384
READ_LEN = 100
ITERS = 5
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cache")


def get_fm():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tophat_tpu.index.fasta import Genome
    from tophat_tpu.index.fm import FMIndex, build_fm_index

    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"fm_{GENOME_N}_s7_k13.npz")
    if os.path.exists(path):
        return FMIndex.load(path)
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, GENOME_N).astype(np.int8)
    genome = Genome(codes=codes, offsets=np.array([0, GENOME_N]),
                    names=["chr1"])
    t0 = time.time()
    fm = build_fm_index(genome, kmer_k=13)
    print(f"# built FM index in {time.time() - t0:.1f}s", file=sys.stderr, flush=True)
    fm.save(path)
    return fm


def main():
    import jax

    # persistent compile cache: repeat bench runs skip the (tunnel-slow)
    # XLA compilation entirely
    jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tophat_tpu.index.fasta import revcomp
    from tophat_tpu.ops.align import align_reads

    fm = get_fm()
    codes = np.asarray(fm.genome)
    rng = np.random.default_rng(11)

    def make_batch(seed):
        r = np.random.default_rng(seed)
        starts = r.integers(0, GENOME_N - READ_LEN, BATCH)
        idx = starts[:, None] + np.arange(READ_LEN)
        reads = codes[idx].copy()
        # two random mutations per read
        for _ in range(2):
            p = r.integers(0, READ_LEN, BATCH)
            reads[np.arange(BATCH), p] = (
                reads[np.arange(BATCH), p] + r.integers(1, 4, BATCH)) % 4
        flip = r.random(BATCH) < 0.5
        rf = np.where(flip[:, None], revcomp(reads), reads).astype(np.int8)
        rr = revcomp(rf).copy().astype(np.int8)
        lengths = np.full(BATCH, READ_LEN, np.int32)
        return rf, rr, lengths

    offsets = np.array([0, GENOME_N], np.int32)
    fm_d = fm.device_put()
    batches = [tuple(jax.device_put(x) for x in make_batch(100 + i))
               for i in range(ITERS + 1)]

    from tophat_tpu.ops.align import kmer_fast_ok

    fast = kmer_fast_ok(fm, READ_LEN, 2)
    # narrow-tier budget (hits_per_seed=8): the steady-state configuration
    # of align_reads_adaptive — repeat-family reads that truncate re-run at
    # a wide budget, which this repeat-free synthetic genome never triggers
    run = lambda b: align_reads(fm_d, b[0], b[1], b[2], offsets,
                                max_mismatches=2, hits_per_seed=8,
                                max_alignments=16, kmer_fast=fast)
    print("# compiling...", file=sys.stderr, flush=True)
    out = run(batches[0])          # compile + warmup
    jax.block_until_ready(out)
    n_aligned = int(np.asarray(out.n_hits > 0).sum())
    print(f"# warmup: {n_aligned}/{BATCH} reads aligned", file=sys.stderr,
          flush=True)

    t0 = time.time()
    outs = [run(b) for b in batches[1:]]
    jax.block_until_ready(outs)
    dt = time.time() - t0

    reads_per_s = ITERS * BATCH / dt
    print(json.dumps({
        "metric": "unspliced_align_reads_per_s_per_chip",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
