"""Multi-device execution of the PRODUCTION pipeline must be bit-identical
to single-device execution (the TPU analog of the reference's requirement
that -p N threads not change output; thread fan-out + deterministic merge,
reference: src/tophat_reports.cpp:2742-2815, src/utils.cpp:22).

Runs real regression cases through the CLI twice — once on 1 device, once
sharded over the 8-device virtual mesh — and compares every output file.
"""

import os
import shlex

import pytest

CASES_DIR = "/root/reference/tests/regression_tests/test_cases"
COMPARE = ["junctions.bed", "insertions.bed", "deletions.bed",
           "accepted_hits.sam", "align_summary.txt"]


def _run_case(case, out_dir, n_devices):
    from tophat_tpu.cli.main import main
    from tophat_tpu.parallel import auto

    case_dir = os.path.join(CASES_DIR, case)
    with open(os.path.join(case_dir, "command.txt")) as f:
        toks = shlex.split(f.read().strip())
    args, i = [], 1
    while i < len(toks):
        if toks[i] in ("-o", "--output-dir"):
            i += 2
            continue
        args.append(toks[i])
        i += 1
    cwd = os.getcwd()
    os.chdir(case_dir)
    os.environ["TOPHAT_TPU_DEVICES"] = str(n_devices)
    try:
        main(["-o", out_dir] + args)
    finally:
        os.chdir(cwd)
        os.environ.pop("TOPHAT_TPU_DEVICES", None)
        auto.deactivate()


@pytest.mark.parametrize("case", ["test_SimpleSplicing", "test_Indel_1",
                                  "test_Paired"])
def test_multidevice_equals_single(case, tmp_path):
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the 8-device virtual mesh")
    if not os.path.isdir(os.path.join(CASES_DIR, case)):
        pytest.skip("reference test cases unavailable")
    out1 = str(tmp_path / "dev1")
    out8 = str(tmp_path / "dev8")
    _run_case(case, out1, 1)
    _run_case(case, out8, len(jax.devices()))
    for fname in COMPARE:
        p1, p8 = os.path.join(out1, fname), os.path.join(out8, fname)
        assert os.path.exists(p1) == os.path.exists(p8), fname
        if os.path.exists(p1):
            with open(p1, "rb") as f1, open(p8, "rb") as f8:
                assert f1.read() == f8.read(), (
                    f"{fname} differs between 1-device and multi-device runs")


@pytest.mark.parametrize("case", ["test_SimpleSplicing", "test_Paired"])
def test_genome_sharded_production_equals_single(case, tmp_path):
    """Production pipeline with the FM index range-sharded over the mesh's
    genome axis (parallel/auto.configure_genome_axis forced via
    $TOPHAT_TPU_GENOME_SHARDS) must stay byte-identical to the 1-device
    run (SURVEY §2.5 index-sharding row; VERDICT r2 item 9)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-device virtual mesh")
    if not os.path.isdir(os.path.join(CASES_DIR, case)):
        pytest.skip("reference test cases unavailable")
    from tophat_tpu.parallel import auto

    out1 = str(tmp_path / "dev1")
    outg = str(tmp_path / "sharded")
    _run_case(case, out1, 1)
    os.environ["TOPHAT_TPU_GENOME_SHARDS"] = "2"
    try:
        _run_case(case, outg, len(jax.devices()))
        assert not auto.genome_sharded()  # _run_case deactivates
    finally:
        os.environ.pop("TOPHAT_TPU_GENOME_SHARDS", None)
    for fname in COMPARE:
        p1, pg = os.path.join(out1, fname), os.path.join(outg, fname)
        assert os.path.exists(p1) == os.path.exists(pg), fname
        if os.path.exists(p1):
            with open(p1, "rb") as f1, open(pg, "rb") as f2:
                assert f1.read() == f2.read(), (
                    f"{fname} differs between 1-device and genome-sharded "
                    "runs")
