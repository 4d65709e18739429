"""Contig-group partitioned FM indexes: whole-genome scale on int32 devices.

Every device-side coordinate in the pipeline is int32 (positions, events,
suffix arrays), which caps one index at ~2.1 Gbp. A genome beyond that
(human: 3.1 Gbp — the reference's primary operating envelope,
/root/reference/doc/html/manual.shtml:74) is partitioned into groups of
whole contigs, each group small enough for int32-local coordinates; each
group gets its own FM index, the pipeline runs its device stages per group,
and results merge at int64 global coordinates on the host
(pipeline/grouped.py).

This is the single-chip face of the same partitioning parallel/shard_fm.py
spreads over a device mesh (SURVEY.md §2.5 index-sharding row): one chip
iterates the groups; a mesh assigns them to devices.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import numpy as np

from tophat_tpu.index.fasta import Genome
from tophat_tpu.index.fm import FMIndex, build_fm_index

# int32-safe group capacity, with margin for rebased arithmetic
MAX_GROUP_BASES = (1 << 31) - (1 << 27)


def contig_group_ranges(genome: Genome,
                        max_bases: int = MAX_GROUP_BASES) -> List[range]:
    """Greedy split of contigs (in FASTA order) into groups whose total
    length fits max_bases. A single contig longer than max_bases is an
    error — no real chromosome approaches 2.1 Gbp."""
    lens = genome.contig_lengths()
    groups: List[range] = []
    start = 0
    acc = 0
    for i, ln in enumerate(lens):
        ln = int(ln)
        if ln > max_bases:
            raise SystemExit(
                f"Error: contig {genome.names[i]!r} is {ln} bases, larger "
                f"than the per-group limit {max_bases}")
        if acc + ln > max_bases and acc:
            groups.append(range(start, i))
            start, acc = i, 0
        acc += ln
    groups.append(range(start, len(lens)))
    return groups


@dataclasses.dataclass
class GroupedFM:
    """FM indexes over contig groups plus their sub-genomes and global
    base offsets (int64)."""

    fms: List[FMIndex]
    sub_genomes: List[Genome]
    bases: np.ndarray            # (G,) int64 global start of each group

    @property
    def n_groups(self) -> int:
        return len(self.fms)


def sub_genome(genome: Genome, cids: range) -> Genome:
    """Sub-Genome over a contig range, local coordinates (views, no copy)."""
    s = int(genome.offsets[cids.start])
    e = int(genome.offsets[cids.stop])
    return Genome(codes=genome.codes[s:e],
                  offsets=(genome.offsets[cids.start: cids.stop + 1]
                           - s).astype(np.int64),
                  names=[genome.names[i] for i in cids])


def build_grouped_fm(genome: Genome, max_bases: int = MAX_GROUP_BASES,
                     kmer_k: int = 0, sa_rate: int = 0,
                     cache_prefix: Optional[str] = None,
                     log=None) -> GroupedFM:
    """Build (or load from <cache_prefix>.g<i>.tt.npz) one FM index per
    contig group. Groups build sequentially so peak host memory is one
    group's construction scratch."""
    ranges = contig_group_ranges(genome, max_bases)
    fms: List[FMIndex] = []
    subs: List[Genome] = []
    bases = np.zeros(len(ranges), np.int64)
    for i, cids in enumerate(ranges):
        sg = sub_genome(genome, cids)
        bases[i] = int(genome.offsets[cids.start])
        path = f"{cache_prefix}.g{i}.tt.npz" if cache_prefix else None
        fm = None
        if path and os.path.exists(path):
            try:
                fm = FMIndex.load(path)
                if fm.n != sg.n:
                    fm = None
            except Exception:
                fm = None
            if fm is not None and log:
                log(f"group {i}: reusing FM index {path}")
        if fm is None:
            if log:
                log(f"group {i}: building FM index over {sg.n} bases "
                    f"({len(sg.names)} contigs)")
            fm = build_fm_index(sg, kmer_k=kmer_k, sa_rate=sa_rate)
            if path:
                try:
                    d = os.path.dirname(path)
                    if d:
                        os.makedirs(d, exist_ok=True)
                    fm.save(path)
                except OSError:
                    pass  # read-only location: keep the in-memory index
        fms.append(fm)
        subs.append(sg)
    return GroupedFM(fms=fms, sub_genomes=subs, bases=bases)
