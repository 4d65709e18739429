"""SOLiD colorspace support (io/color.py + pipeline/colorspace.py).

Reference behavior being modeled: bowtie -C color-native alignment with
reference-guided decoding (src/tophat.py:2896-2928) — an isolated color
mismatch is a sequencing ERROR (decodes to the reference base), a
consistent adjacent pair is a real SNP (decodes to the variant base)."""

import os

import numpy as np
import pytest

FAKE = ("/root/reference/tests/regression_tests/test_cases/common_genomes/"
        "fake.fa")


def _encode_colors(bases, primer=3):
    prev = primer
    out = []
    for b in bases:
        out.append(prev ^ int(b))
        prev = int(b)
    return np.array(out, np.int8)


def _color_str(primer, colors):
    return "T" + "".join(str(int(c)) for c in colors)


@pytest.fixture(scope="module")
def genome():
    from tophat_tpu.index.fasta import read_fasta

    if not os.path.exists(FAKE):
        pytest.skip("reference test genome unavailable")
    return read_fasta(FAKE)


def test_color_transform_roundtrip(genome):
    from tophat_tpu.io.color import (decode_chain, encode_color_read,
                                     genome_to_color)

    codes = np.asarray(genome.codes)[:50]
    colors = _encode_colors(codes)
    s = _color_str(3, colors)
    primer, parsed = encode_color_read(s.encode())
    assert primer == 3
    assert np.array_equal(parsed, colors)
    # chain decode inverts the encoding exactly
    assert np.array_equal(decode_chain(primer, parsed), codes)
    # genome transitions match read colors (beyond the primer transition)
    gcol = genome_to_color(np.asarray(genome.codes))
    assert np.array_equal(colors[1:], gcol[:49])


def test_decode_error_vs_snp(genome):
    from tophat_tpu.io.color import decode_alignment

    codes = np.asarray(genome.codes)
    pos, L = 100, 30
    ref = codes[pos: pos + L]
    colors = _encode_colors(ref)[1:]          # alignment colors (L-1)

    # isolated color error -> sequencing error, decode = reference
    err = colors.copy()
    err[10] ^= 1
    bases, cmm, bmm = decode_alignment(codes, pos, err)
    assert np.array_equal(bases, ref) and cmm == 1 and bmm == 0

    # real SNP: change base 12, re-encode -> two adjacent color changes
    var = ref.copy()
    var[12] ^= 2
    snp_colors = _encode_colors(var)[1:]
    bases, cmm, bmm = decode_alignment(codes, pos, snp_colors)
    assert np.array_equal(bases, var) and cmm == 2 and bmm == 1


def test_color_pipeline_end_to_end(genome, tmp_path):
    """Clean / error / SNP / reverse-strand colorspace reads all align at
    their true positions with correctly decoded SEQ."""
    from tophat_tpu.index.fasta import decode_seq, revcomp
    from tophat_tpu.pipeline.colorspace import run_pipeline_color
    from tophat_tpu.pipeline.params import Params

    codes = np.asarray(genome.codes)
    L = 30
    recs = []
    truth = {}
    rng = np.random.default_rng(0)
    for i in range(12):
        p = int(rng.integers(10, len(codes) - L - 10))
        seg = codes[p: p + L].copy()
        kind = i % 4
        seq_bases = seg.copy()
        if kind == 1:                       # isolated color error
            pass                            # error added in color space below
        elif kind == 2:                     # SNP
            seq_bases[L // 2] ^= 1
        read_bases = seq_bases if kind != 3 else revcomp(seq_bases)
        colors = _encode_colors(read_bases)
        if kind == 1:
            colors[8] ^= 2
        name = f"r{i}_k{kind}"
        recs.append((name, 3, colors, b"I" * len(colors)))
        truth[name] = (p, decode_seq(seq_bases))
    params = Params(coverage_search=False)
    out = str(tmp_path / "color_out")
    run_pipeline_color(genome, recs, params, out, log=lambda *a: None)
    got = {}
    with open(os.path.join(out, "accepted_hits.sam")) as f:
        for line in f:
            if line.startswith("@"):
                continue
            t = line.split("\t")
            got[t[0]] = (int(t[3]) - 1, t[9], int(t[1]))
    for name, (p, seq) in truth.items():
        assert name in got, f"{name} unaligned"
        gp, gseq, flag = got[name]
        assert gp == p, f"{name}: pos {gp} != {p}"
        # SAM stores the genome-forward sequence
        assert gseq == seq, f"{name}: seq {gseq} != {seq}"


def test_csfasta_cli(genome, tmp_path):
    """-C with a .csfasta file end-to-end through the CLI."""
    from tophat_tpu.cli.main import main

    codes = np.asarray(genome.codes)
    L = 28
    path = tmp_path / "reads.csfasta"
    with open(path, "w") as f:
        f.write("# SOLiD test\n")
        for i, p in enumerate((40, 150, 300)):
            colors = _encode_colors(codes[p: p + L])
            f.write(f">cs{i}_{p}\n{_color_str(3, colors)}\n")
    out = str(tmp_path / "out")
    main(["-o", out, "-C", "--no-coverage-search", FAKE, str(path)])
    aligned = {}
    with open(os.path.join(out, "accepted_hits.sam")) as f:
        for line in f:
            if not line.startswith("@"):
                t = line.split("\t")
                aligned[t[0]] = int(t[3]) - 1
    for i, p in enumerate((40, 150, 300)):
        assert aligned.get(f"cs{i}_{p}") == p
