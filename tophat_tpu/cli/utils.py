"""Small companion utilities mirroring the reference's helper tools:
bed_to_juncs (scripts/bed_to_juncs), sam_juncs (src/sam_juncs.cpp) and
juncs_db-style export of the event table.

Usage:
  python -m tophat_tpu.cli.utils bed_to_juncs < junctions.bed > out.juncs
  python -m tophat_tpu.cli.utils sam_juncs accepted_hits.sam
"""

from __future__ import annotations

import re
import sys


def bed_to_juncs(inp=sys.stdin, out=sys.stdout) -> int:
    """junctions.bed (BED12 or intron BED) -> .juncs lines
    `chrom <left> <right> <strand>` with left = last base of the left exon
    (0-based) and right = first base of the right exon — the format
    -j/--raw-juncs consumes (reference: scripts' bed_to_juncs behavior:
    left = chromStart + blockSize0 - 1, right = chromStart + blockStart1).
    """
    n = 0
    for line in inp:
        if line.startswith(("track", "browser", "#")) or not line.strip():
            continue
        t = line.split("\t")
        if len(t) >= 12:
            start = int(t[1])
            sizes = [int(x) for x in t[10].rstrip(",").split(",")]
            starts = [int(x) for x in t[11].rstrip(",").split(",")]
            strand = t[5]
            for i in range(len(sizes) - 1):
                left = start + starts[i] + sizes[i] - 1
                right = start + starts[i + 1]
                out.write(f"{t[0]}\t{left}\t{right}\t{strand}\n")
                n += 1
        elif len(t) >= 3:
            strand = t[5].strip() if len(t) > 5 else "+"
            out.write(f"{t[0]}\t{int(t[1]) - 1}\t{int(t[2])}\t{strand}\n")
            n += 1
    return n


_CIG = re.compile(r"(\d+)([MIDNSHP=X])")


def sam_juncs(path: str, out=sys.stdout) -> int:
    """Print junctions implied by N cigar ops in a SAM file
    (reference: sam_juncs.cpp:24 get_junctions_from_hitstream)."""
    seen = set()
    with open(path) as f:
        for line in f:
            if line.startswith("@"):
                continue
            t = line.split("\t")
            if len(t) < 6 or t[5] == "*":
                continue
            pos = int(t[3]) - 1
            xs = "+"
            for fld in t[11:]:
                if fld.startswith("XS:A:"):
                    xs = fld[5:6]
            ref = pos
            for num, op in _CIG.findall(t[5]):
                num = int(num)
                if op == "N":
                    seen.add((t[2], ref - 1, ref + num, xs))
                if op in "MDN=X":
                    ref += num
    for chrom, left, right, strand in sorted(seen):
        out.write(f"{chrom}\t{left}\t{right}\t{strand}\n")
    return len(seen)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__, file=sys.stderr)
        return 2
    cmd = argv[0]
    if cmd == "bed_to_juncs":
        bed_to_juncs()
    elif cmd == "sam_juncs":
        sam_juncs(argv[1])
    else:
        print(f"unknown utility {cmd!r}", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
