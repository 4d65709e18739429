"""Pallas realignment kernel vs the XLA reference implementation
(interpret mode — runs on the CPU test mesh)."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.mark.parametrize("q", [0, 3])
def test_realign_pallas_matches_xla(rng, q):
    from tophat_tpu.index.fasta import genome_from_seqs
    from tophat_tpu.index.fm import build_fm_index
    from tophat_tpu.ops.events import realign_chunk
    from tophat_tpu.ops.pallas.realign_kernel import (prepare_inputs,
                                                      realign_pallas)

    codes = rng.integers(0, 4, 4000).astype(np.int8)
    genome = genome_from_seqs([("c", "".join("ACGT"[c] for c in codes))])
    fm = build_fm_index(genome)

    L, R, E = 32, 128, 128
    lefts = rng.integers(100, 3000, E).astype(np.int32)
    if q == 0:
        rights = (lefts + rng.integers(60, 300, E)).astype(np.int32)
        kinds = np.zeros(E, np.int8)
        ilens = np.zeros(E, np.int8)
        seqs = np.full((E, 8), -1, np.int8)
    else:
        rights = lefts + 1
        kinds = np.full(E, 2, np.int8)
        ilens = np.full(E, q, np.int8)
        seqs = np.full((E, 8), -1, np.int8)
        seqs[:, :q] = rng.integers(0, 4, (E, q))

    # reads planted across a random event (some with a mutation)
    reads = np.full((R, L), -1, np.int8)
    lengths = np.full(R, L, np.int32)
    for i in range(R):
        e = int(rng.integers(0, E))
        t = int(rng.integers(1, L - 1 - q))
        pre = codes[lefts[e] - t + 1: lefts[e] + 1]
        if q == 0:
            suf = codes[rights[e]: rights[e] + (L - t)]
            read = np.concatenate([pre, suf])
        else:
            suf = codes[lefts[e] + 1: lefts[e] + 1 + (L - t - q)]
            read = np.concatenate([pre, seqs[e, :q], suf])
        if len(read) == L:
            if i % 3 == 0:
                p = int(rng.integers(0, L))
                read = read.copy()
                read[p] = (read[p] + 1) % 4
            reads[i] = read
        else:
            reads[i] = rng.integers(0, 4, L)

    ev_valid = np.ones(E, bool)
    bt0, mm0, ok0 = realign_chunk(
        fm.genome, jnp.asarray(reads), jnp.asarray(lengths),
        jnp.asarray(lefts), jnp.asarray(rights), jnp.asarray(kinds),
        jnp.asarray(ilens), jnp.asarray(seqs), jnp.asarray(ev_valid),
        max_mm=2)

    X, YLpad, YCpad = prepare_inputs(
        fm.genome, reads, jnp.asarray(lefts), jnp.asarray(rights),
        jnp.asarray(kinds), seqs, q, L)
    bt1, mm1, ok1 = realign_pallas(
        X, YLpad, YCpad, jnp.asarray(lengths), L=L, q=q, max_mm=2,
        interpret=True)

    ok0, ok1 = np.asarray(ok0), np.asarray(ok1)
    np.testing.assert_array_equal(ok0, ok1)
    np.testing.assert_array_equal(np.asarray(mm0)[ok0], np.asarray(mm1)[ok0])
    np.testing.assert_array_equal(np.asarray(bt0)[ok0],
                                  np.asarray(bt1)[ok0])
    assert ok0.sum() >= R  # the planted reads really aligned