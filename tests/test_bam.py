"""BAM/BGZF codec: read the reference's gold BAM files, roundtrip ours."""

import os

import pytest

from tophat_tpu.io.bam import BamRecord, BamWriter, read_bam

GOLD = ("/root/reference/tests/regression_tests/test_cases/"
        "test_SimpleSplicing/tophat_out")


@pytest.mark.skipif(not os.path.exists(GOLD), reason="reference unavailable")
def test_read_gold_bam_matches_gold_sam():
    text, names, lengths, records = read_bam(
        os.path.join(GOLD, "accepted_hits.bam"))
    assert names == ["fake"] and lengths == [500]

    with open(os.path.join(GOLD, "accepted_hits.sam")) as f:
        sam_lines = [l.rstrip("\n").split("\t") for l in f]
    assert len(records) == len(sam_lines)
    for rec, sam in zip(records, sam_lines):
        assert rec.name == sam[0]
        assert rec.flag == int(sam[1])
        assert rec.pos + 1 == int(sam[3])
        cig = "".join(f"{n}{op}" for op, n in rec.cigar)
        assert cig == sam[5]
        assert rec.seq.decode() == sam[9]
        assert rec.qual.decode() == sam[10]


def test_bam_roundtrip(tmp_path):
    path = str(tmp_path / "t.bam")
    w = BamWriter(path, "@HD\tVN:1.0\tSO:coordinate\n", ["chrA", "chrB"],
                  [1000, 2000])
    recs = [
        BamRecord("r1", 0, 0, 9, 255, [("M", 10)], -1, -1, 0,
                  b"ACGTACGTAC", b"IIIIIIIIII",
                  [("NM", "i", 0), ("NH", "i", 1)]),
        BamRecord("r2", 16, 1, 99, 3, [("M", 4), ("N", 50), ("M", 6)],
                  -1, -1, 0, b"ACGTACGTAC", b"**********",
                  [("NM", "i", 1), ("XS", "A", "+"), ("NH", "i", 2),
                   ("CC", "Z", "="), ("CP", "i", 100)]),
        BamRecord("u1", 4, -1, -1, 0, [], -1, -1, 0,
                  b"ACGTNACGTA", b"IIIIIIIIII", []),
    ]
    for r in recs:
        w.write(r)
    w.close()

    text, names, lengths, got = read_bam(path)
    assert names == ["chrA", "chrB"] and lengths == [1000, 2000]
    assert "SO:coordinate" in text
    assert len(got) == 3
    for a, b in zip(recs, got):
        assert a.name == b.name and a.flag == b.flag
        assert a.ref_id == b.ref_id and a.pos == b.pos
        assert a.cigar == b.cigar
        assert a.seq == b.seq and a.qual == b.qual
        assert a.tags == b.tags


def test_bam_as_read_input(tmp_path):
    """BAM files feed reads back into the pipeline (bam2fastx role)."""
    from tophat_tpu.io.fastq import read_all

    path = str(tmp_path / "reads.bam")
    w = BamWriter(path, "@HD\tVN:1.0\n", ["c"], [100])
    w.write(BamRecord("a", 0, 0, 0, 255, [("M", 4)], -1, -1, 0,
                      b"ACGT", b"IIII", []))
    w.write(BamRecord("b", 16, 0, 10, 255, [("M", 4)], -1, -1, 0,
                      b"ACGT", b"HIJK", []))  # reverse-flag record
    w.close()
    recs = list(read_all(path))
    assert recs[0] == ("a", b"ACGT", b"IIII")
    assert recs[1] == ("b", b"ACGT", b"KJIH")


def test_native_bgzf_roundtrip(tmp_path):
    """native/bgzf.cpp: multithreaded encoder output is valid BGZF —
    readable by the pure-Python block reader and by the native reader,
    byte-identical payload (the vendored libbam-bgzf + pigz role)."""
    import numpy as np
    from tophat_tpu.io.bam import BgzfWriter, bgzf_blocks
    from tophat_tpu.native import bgzf

    if not bgzf.available:
        import pytest
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(5)
    data = (rng.integers(0, 255, 300_000, dtype=np.uint8).tobytes()
            + b"ACGT" * 100_000)
    p = str(tmp_path / "t.bgzf")
    bgzf.write_file(p, data, nthreads=3)
    assert bgzf.read_file(p) == data
    with open(p, "rb") as f:
        assert b"".join(bgzf_blocks(f)) == data
    # and the native reader handles python-written streams
    p2 = str(tmp_path / "t2.bgzf")
    with open(p2, "wb") as f:
        w = BgzfWriter(f)
        w.write(data)
        w.close()
    assert bgzf.read_file(p2) == data
    # empty payload: EOF-only file
    p3 = str(tmp_path / "empty.bgzf")
    bgzf.write_file(p3, b"")
    assert bgzf.read_file(p3) == b""


def test_bgzf_incompressible_payload_roundtrip(tmp_path):
    """Random (incompressible) payloads deflate-expand past the 16-bit
    BGZF BSIZE field; both writers must split/store instead of failing
    (samtools bgzf.c deflate_block behavior)."""
    import io

    import numpy as np

    from tophat_tpu.io.bam import BgzfWriter, bgzf_blocks

    data = np.random.default_rng(0).integers(0, 256, 300_000) \
        .astype(np.uint8).tobytes()
    buf = io.BytesIO()
    w = BgzfWriter(buf)
    w.write(data)
    w.close()
    buf.seek(0)
    assert b"".join(bgzf_blocks(buf)) == data

    from tophat_tpu.native import bgzf

    if bgzf.available:
        p = str(tmp_path / "x.bam")
        bgzf.write_file(p, data, level=6)
        assert bgzf.read_file(p) == data


def test_bam_record_beyond_512mbp(tmp_path):
    """BAM records past 2^29 (long contigs) must encode: the 16-bit BAI bin
    field cannot represent them, so reg2bin falls back to bin 0 (htslib
    pseudo-bin convention for CSI-range coordinates)."""
    from tophat_tpu.io.bam import (BamRecord, BamWriter, read_bam)

    p = str(tmp_path / "big.bam")
    rec = BamRecord(name="r1", flag=0, ref_id=0, pos=(1 << 30) + 12345,
                    mapq=255, cigar=[("M", 24)], ref_id2=-1, pos2=-1,
                    tlen=0, seq=b"ACGT" * 6, qual=b"I" * 24,
                    tags=[("NM", "i", 0)])
    w = BamWriter(p, "@HD\tVN:1.0\n", ["chr1"], [(1 << 31) - 1])
    w.write(rec)
    w.close()
    _, names, _, records = read_bam(p)
    assert names == ["chr1"]
    assert records[0].pos == (1 << 30) + 12345
    assert records[0].seq == b"ACGT" * 6


def test_native_encoder_matches_numpy():
    """The C columnar encoder (native/bamenc.cpp) must produce byte-
    identical records to the numpy ragged-scatter path."""
    import numpy as np

    from tophat_tpu.io import bam as B
    from tophat_tpu.native import bamenc

    if not bamenc.available:
        import pytest

        pytest.skip("native bamenc unavailable")
    names = [b"read1", b"r2", b"a_longer_name_3"]
    flag = np.array([0, 16, 4], np.int64)
    ref = np.array([0, 1, -1], np.int64)
    pos = np.array([100, 5000, -1], np.int64)
    end = np.array([140, 5036, 0], np.int64)
    mapq = np.array([255, 3, 0], np.int64)
    cig = np.array([(40 << 4) | 0, (20 << 4) | 0, (200 << 4) | 3,
                    (16 << 4) | 0], np.uint32)
    ncig = np.array([1, 3, 0], np.int64)
    seqs = [b"ACGT" * 10, b"ACGTN" * 7 + b"A", b"GGGCC"]
    quals = [b"I" * 40, b"\x00" * 36, b"JJJJJ"]
    noq = np.array([False, True, False])
    tags = [b"NMi\x00\x00\x00\x00", b"", b"XSA+"]

    blob_c = B.encode_records_columns(names, flag, ref, pos, end, mapq,
                                      cig, ncig, seqs, quals, noq, tags)
    # force the numpy path
    from tophat_tpu import native

    saved = native.bamenc._lib, native.bamenc._failed
    native.bamenc._lib, native.bamenc._failed = None, True
    try:
        blob_py = B.encode_records_columns(names, flag, ref, pos, end,
                                           mapq, cig, ncig, seqs, quals,
                                           noq, tags)
    finally:
        native.bamenc._lib, native.bamenc._failed = saved
    assert blob_c == blob_py
