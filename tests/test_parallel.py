"""Multi-chip sharding: the full pipeline step on the virtual 8-device
CPU mesh (DP over reads x event-sharded realignment over genome axis)."""

import numpy as np
import pytest

import jax


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_sharded_step_matches_single_device():
    """The sharded step's alignment outputs must equal a 1-device run."""
    import __graft_entry__ as g
    from tophat_tpu.parallel.dist import make_sharded_pipeline_step
    from tophat_tpu.parallel.mesh import make_mesh, reads_sharding, replicated

    read_len, B = 48, 16
    genome, fm, reads_f, reads_r, lengths = g._toy_problem(
        n_genome=20_000, n_reads=B, read_len=read_len)
    offsets = genome.offsets.astype(np.int32)

    outs = {}
    for n in (1, 2):
        mesh = make_mesh(n_reads_shards=n, n_genome_shards=1,
                         devices=jax.devices()[:n])
        step = make_sharded_pipeline_step(
            mesh, read_len=read_len, segment_length=16, max_mismatches=2,
            hits_per_seed=8, max_alignments=8, max_windows=256,
            max_events=64)
        rs, rep = reads_sharding(mesh), replicated(mesh)
        out = step(fm.device_put(rep), jax.device_put(offsets, rep),
                   jax.device_put(reads_f, rs), jax.device_put(reads_r, rs),
                   jax.device_put(lengths, rs))
        outs[n] = [np.asarray(x) for x in out]

    for a, b in zip(outs[1][:4], outs[2][:4]):
        np.testing.assert_array_equal(a, b)


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert int(np.asarray(out.n_hits).sum()) >= args[1].shape[0]
