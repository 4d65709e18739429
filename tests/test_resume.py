"""Stage-skipping resume: -R on an interrupted run reuses the persisted
per-chunk mapped tables instead of re-mapping, and never rebuilds the FM
index (reference: doResume src/tophat.py:240, per-stage resume_skip
:2164-2176)."""

import os

import numpy as np
import pytest


def _fixture(tmp_path):
    rng = np.random.default_rng(51)
    N = 40_000
    codes = rng.integers(0, 4, N)
    seq = "".join("ACGT"[c] for c in codes)
    fa = tmp_path / "g.fa"
    with open(fa, "w") as f:
        f.write(">chrR\n")
        for i in range(0, N, 60):
            f.write(seq[i: i + 60] + "\n")
    fq = tmp_path / "r.fq"
    with open(fq, "w") as f:
        for i in range(40):
            s = 500 + i * 700
            f.write(f"@r{i}\n{seq[s:s+60]}\n+\n{'I' * 60}\n")
    return str(fa), str(fq)


def test_resume_skips_mapping(tmp_path, capsys):
    from tophat_tpu.cli.main import main

    fa, fq = _fixture(tmp_path)
    out = str(tmp_path / "out")
    rc = main(["-o", out, "--keep-tmp", "--no-coverage-search",
               "--batch-size", "16", fa, fq])
    assert rc == 0
    sam1 = open(os.path.join(out, "accepted_hits.sam")).read()
    bed1 = open(os.path.join(out, "junctions.bed")).read()
    arts = [f for f in os.listdir(os.path.join(out, "tmp"))
            if f.endswith(".pkl")]
    assert len(arts) >= 2, "expected per-chunk mapped artifacts"

    # simulate an interrupted run: outputs gone, journal lacks alldone
    os.remove(os.path.join(out, "accepted_hits.sam"))
    run_log = os.path.join(out, "logs", "run.log")
    lines = [l for l in open(run_log) if not l.startswith("#>alldone")]
    open(run_log, "w").writelines(lines)
    tlog = os.path.join(out, "logs", "tophat.log")
    open(tlog, "w").close()

    rc = main(["-R", out])
    assert rc == 0
    log_text = open(tlog).read()
    assert "reusing mapped tables" in log_text
    assert "Building FM index" not in log_text, \
        "fully-resumed run must not rebuild the index"
    sam2 = open(os.path.join(out, "accepted_hits.sam")).read()
    assert sam2 == sam1
    assert open(os.path.join(out, "junctions.bed")).read() == bed1


def test_resume_complete_run_is_noop(tmp_path, capsys):
    from tophat_tpu.cli.main import main

    fa, fq = _fixture(tmp_path)
    out = str(tmp_path / "out2")
    main(["-o", out, "--no-coverage-search", fa, fq])
    rc = main(["-R", out])
    assert rc == 0
    assert "already complete" in capsys.readouterr().err


def test_resume_invalidates_on_input_swap(tmp_path):
    """Swapping the input file for a different one with the same read count
    must invalidate the mapped artifacts (content-keyed resume, the role of
    the reference's argv replay + validation, src/tophat.py:240-266)."""
    from tophat_tpu.cli.main import main

    fa, fq = _fixture(tmp_path)
    out = str(tmp_path / "out3")
    rc = main(["-o", out, "--keep-tmp", "--no-coverage-search",
               "--batch-size", "16", fa, fq])
    assert rc == 0
    sam1 = open(os.path.join(out, "accepted_hits.sam")).read()

    # swap the input: same read count, different sequences (shifted starts)
    seq = "".join(l.strip() for l in open(fa).readlines()[1:])
    with open(fq, "w") as f:
        for i in range(40):
            s = 800 + i * 700
            f.write(f"@s{i}\n{seq[s:s+60]}\n+\n{'I' * 60}\n")

    os.remove(os.path.join(out, "accepted_hits.sam"))
    run_log = os.path.join(out, "logs", "run.log")
    lines = [l for l in open(run_log) if not l.startswith("#>alldone")]
    open(run_log, "w").writelines(lines)
    tlog = os.path.join(out, "logs", "tophat.log")
    open(tlog, "w").close()

    rc = main(["-R", out])
    assert rc == 0
    log_text = open(tlog).read()
    assert "reusing mapped tables" not in log_text
    assert "remapping" in log_text
    sam2 = open(os.path.join(out, "accepted_hits.sam")).read()
    assert sam2 != sam1, "stale artifacts were silently reused"
    assert "s0" in sam2 and "r0" not in sam2


def test_mapped_chunk_artifact_write_failure(tmp_path):
    """An unwritable tmp_dir must not crash the chunk mapping (and must
    leave m.batch attached) — the OSError path in _mapped_chunk."""
    from tophat_tpu.index.fasta import Genome, decode_seq
    from tophat_tpu.index.fm import build_fm_index
    from tophat_tpu.io.fastq import batch_reads
    from tophat_tpu.pipeline.params import Params
    from tophat_tpu.pipeline.run import _mapped_chunk

    rng = np.random.default_rng(9)
    codes = rng.integers(0, 4, 4096).astype(np.int8)
    genome = Genome(codes=codes, offsets=np.array([0, 4096]),
                    names=["c"])
    fm = build_fm_index(genome)
    recs = [(f"q{i}", decode_seq(codes[i * 64: i * 64 + 40]), b"I" * 40)
            for i in range(8)]
    batch = batch_reads(recs)
    params = Params(coverage_search=False)
    blocker = tmp_path / "blocked"
    blocker.write_text("not a directory")
    m, tables = _mapped_chunk(lambda: fm, genome.offsets.astype(np.int32),
                              batch, params, lambda *a: None, genome=genome,
                              tmp_dir=str(blocker), resume=False)
    assert m.batch is batch
    assert tables
