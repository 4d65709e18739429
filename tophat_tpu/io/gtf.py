"""GTF/GFF parsing and the transcriptome model.

Covers the roles of gclib's GffReader (reference: src/gclib/gff.cpp),
gtf_juncs (src/gtf_juncs.cpp:43 get_junctions_from_gff — known introns from
successive exon boundaries) and the transcript table behind gtf_to_fasta /
map2gtf (src/GTFToFasta.cpp:60, src/map2gtf.h:41). Instead of building a
transcriptome FASTA + bowtie index and rebasing hits, known junctions enter
the unified event table (auto-accepted, gtf_match) and reads align across
them directly via event realignment — transcriptome mapping without the
coordinate round-trip.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np

from tophat_tpu.index.fasta import Genome


@dataclasses.dataclass
class Transcript:
    tid: str
    chrom: str
    strand: str
    exons: List[Tuple[int, int]]  # 0-based [start, end) sorted by start


def parse_gtf(path: str) -> Dict[str, Transcript]:
    """Minimal GTF/GFF2 exon parser keyed by transcript_id."""
    out: Dict[str, Transcript] = {}
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            t = line.rstrip("\n").split("\t")
            if len(t) < 9 or t[2].lower() != "exon":
                continue
            chrom, start, end, strand, attrs = t[0], t[3], t[4], t[6], t[8]
            tid = None
            for field in attrs.split(";"):
                field = field.strip()
                if field.startswith("transcript_id"):
                    tid = field.split(None, 1)[1].strip().strip('"')
                    break
            if tid is None:
                continue
            tr = out.get(tid)
            if tr is None:
                tr = out[tid] = Transcript(tid, chrom, strand, [])
            tr.exons.append((int(start) - 1, int(end)))  # GTF is 1-based incl
    for tr in out.values():
        tr.exons.sort()
    return out


def gtf_junctions(genome: Genome, transcripts: Dict[str, Transcript]):
    """Known introns as a (junction-kind) event table + auto-accept set
    (reference: get_junctions_from_gff, src/gtf_juncs.cpp:43)."""
    from tophat_tpu.ops.events import MAX_INS
    from tophat_tpu.ops.splice import KIND_JUNCTION

    name2id = genome.name_to_id()
    lefts, rights, anti = [], [], []
    for tr in transcripts.values():
        if tr.chrom not in name2id:
            continue
        off = int(genome.offsets[name2id[tr.chrom]])
        for (s1, e1), (s2, e2) in zip(tr.exons, tr.exons[1:]):
            if s2 <= e1:
                continue  # overlapping/abutting exons: no intron
            lefts.append(off + e1 - 1)   # last base of left exon
            rights.append(off + s2)      # first base of right exon
            anti.append(tr.strand == "-")
    ev = dict(left=np.array(lefts, np.int32),
              right=np.array(rights, np.int32),
              kind=np.full(len(lefts), KIND_JUNCTION, np.int8),
              antisense=np.array(anti, bool),
              ins_len=np.zeros(len(lefts), np.int8),
              ins_seq=np.full((len(lefts), MAX_INS), -1, np.int8))
    accept = {(int(l), int(r), bool(a))
              for l, r, a in zip(lefts, rights, anti)}
    return ev, accept


def transcript_sequence(genome: Genome, tr: Transcript) -> np.ndarray:
    """Concatenated exon codes (the gtf_to_fasta record for this
    transcript, reference: GTFToFasta.cpp:9 get_exonic_sequence)."""
    off = int(genome.offsets[genome.name_to_id()[tr.chrom]])
    return np.concatenate([genome.codes[off + s: off + e]
                           for s, e in tr.exons])


def write_juncs_file(path: str, genome: Genome, transcripts) -> int:
    """Emit the .juncs text format (reference: gtf_juncs.cpp:94 output)."""
    ev, _ = gtf_junctions(genome, transcripts)
    n = 0
    with open(path, "w") as f:
        for l, r, a in zip(ev["left"], ev["right"], ev["antisense"]):
            cid, ll = genome.global_to_contig(np.int64(l))
            _, rl = genome.global_to_contig(np.int64(r))
            f.write(f"{genome.names[int(cid)]}\t{int(ll)}\t{int(rl)}\t"
                    f"{'-' if a else '+'}\n")
            n += 1
    return n
