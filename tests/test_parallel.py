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


def test_fm_range_sharding_matches_single_index():
    """parallel/shard_fm.py: genome-axis FM sharding returns exactly the
    single-index placement sets (SURVEY §2.5 index-sharding design)."""
    import jax
    import numpy as np
    from tophat_tpu.index.fasta import Genome
    from tophat_tpu.index.fm import build_fm_index
    from tophat_tpu.ops.align import align_reads, pad_reads
    from tophat_tpu.parallel.mesh import make_mesh
    from tophat_tpu.parallel.shard_fm import (build_sharded_fm,
                                              make_sharded_align)

    rng = np.random.default_rng(13)
    n = 1 << 16
    codes = rng.integers(0, 4, n).astype(np.int8)
    # two contigs to exercise the contig-boundary filter
    genome = Genome(codes=codes, offsets=np.array([0, n // 2, n]),
                    names=["c1", "c2"])
    L, B = 64, 64
    starts = rng.integers(0, n - L, B)
    reads = codes[starts[:, None] + np.arange(L)[None, :]].astype(np.int8)
    mut = rng.random((B, L)) < 0.02
    reads = np.where(mut, rng.integers(0, 4, (B, L)), reads).astype(np.int8)
    rf, rr, lens = pad_reads(list(reads))
    offsets = np.array([0, n // 2, n], np.int32)

    mesh = make_mesh(n_reads_shards=2, n_genome_shards=4)
    fm_stack, shard_starts = build_sharded_fm(genome, 4, overlap=L)
    w = (n + 3) // 4
    fn = make_sharded_align(mesh, owned_width=w, max_mismatches=2,
                            max_alignments=16)
    pos, strand, mm, valid, n_hits, _trunc = fn(
        fm_stack, shard_starts.astype(np.int64), offsets, rf, rr, lens)

    ref = align_reads(build_fm_index(genome), rf, rr, lens, offsets,
                      max_mismatches=2, max_alignments=16)
    pos, strand, valid = (np.asarray(x) for x in (pos, strand, valid))
    rpos, rstrand, rvalid = (np.asarray(x) for x in
                             (ref.pos, ref.strand, ref.valid))
    for i in range(B):
        got = set(zip(pos[i][valid[i]].tolist(),
                      strand[i][valid[i]].tolist()))
        want = set(zip(rpos[i][rvalid[i]].tolist(),
                       rstrand[i][rvalid[i]].tolist()))
        assert got == want, f"read {i}: {got} != {want}"
    assert (np.asarray(n_hits) == np.asarray(ref.n_hits)).all()
