"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py and the driver's compile checks;
tests validate correctness and multi-chip sharding on host CPU devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests always run on the virtual CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin overrides JAX_PLATFORMS at import time; the config
# update below wins as long as it runs before any device is created.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def fake_genome():
    """The reference regression suite's tiny genome (500 bp, 1 contig)."""
    from tophat_tpu.index.fasta import read_fasta

    path = os.path.join(
        REFERENCE, "tests/regression_tests/test_cases/common_genomes/fake.fa")
    if not os.path.exists(path):
        pytest.skip("reference test genome unavailable")
    return read_fasta(path)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(7)
