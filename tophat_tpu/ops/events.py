"""Realign reads across candidate events (junctions / deletions / insertions).

Replaces the reference's juncs_db flank-FASTA -> bowtie -> coordinate-rebase
loop (src/juncs_db.cpp:109 print_splice; src/bwt_map.cpp:885
SplicedSAMHitFactory) and tophat_reports' realign_reads
(src/tophat_reports.cpp:1231) with one batched device computation.

For event e with boundary (left | right) and a read placed so its first t
bases end at `left` and the rest resumes at `right`, the mismatch count
splits into a prefix term and a suffix term. Sweeping t is a cross-
correlation between the one-hot read and the one-hot genome flank, so the
whole (read x event x split) mismatch volume is two conv_general_dilated
calls — dense MXU work instead of a per-candidate seed-and-extend loop.

Split semantics per kind:
  junction/deletion: read[0:t] ends at left; read[t:] starts at right
  insertion (ins_len=q): read[0:t] ends at left; read[t:t+q] is the inserted
  sequence (compared against the event's seq); read[t+q:] starts at left+1
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tophat_tpu.ops.splice import KIND_INSERTION

MAX_INS = 8  # inserted-sequence slot width


def _one_hot(codes, dtype):
    """(..., L) int8 codes -> (..., L, 4); pad/N/out-of-range rows are zero,
    which the count arithmetic turns into mismatches."""
    c = codes[..., None]
    return (c == jnp.arange(4, dtype=codes.dtype)).astype(dtype)


@partial(jax.jit, static_argnames=("max_mm",))
def realign_chunk(genome, readsg, lengths, ev_left, ev_right, ev_kind,
                  ev_ins_len, ev_ins_seq, ev_valid, max_mm: int):
    """Best split alignment of every read row against every event.

    readsg  : (R, L) genome-space read codes (-1 padded)
    ev_*    : (E,) event table arrays; ev_ins_seq (E, MAX_INS)
    Returns (best_t, mm, ok): (R, E) — leftmost split minimizing mismatches,
    its mismatch count (excluding inserted/deleted bases), and validity
    (mm <= max_mm, split interior, event valid).
    """
    genome = jnp.asarray(genome)
    n = genome.shape[0]
    R, L = readsg.shape
    E = ev_left.shape[0]
    dt = jnp.float32

    X = _one_hot(readsg, dt)                                   # (R, L, 4)

    li = ev_left[:, None] - (L - 1) + jnp.arange(L, dtype=jnp.int32)
    flankL = jnp.where((li >= 0) & (li < n),
                       genome[jnp.clip(li, 0, n - 1)], jnp.int8(5))
    r_start = jnp.where(ev_kind == KIND_INSERTION, ev_left + 1, ev_right)
    ri = r_start[:, None] + jnp.arange(L, dtype=jnp.int32)
    flankR = jnp.where((ri >= 0) & (ri < n),
                       genome[jnp.clip(ri, 0, n - 1)], jnp.int8(5))
    YL = _one_hot(flankL, dt)                                  # (E, L, 4)
    YR = _one_hot(flankR, dt)

    dn = jax.lax.conv_dimension_numbers((E, 4, L), (R, 4, L),
                                        ("NCW", "OIW", "NCW"))
    # matchL[e, r, lag] = sum_u X[r, u] * YL[e, u + lag]
    matchL = jax.lax.conv_general_dilated(
        jnp.moveaxis(YL, -1, 1), jnp.moveaxis(X, -1, 1),
        window_strides=(1,), padding=((0, L - 1),), dimension_numbers=dn)
    # matchR[r, e, lag] = sum_u X[r, u] * YR[e, u - lag]
    dn2 = jax.lax.conv_dimension_numbers((R, 4, L), (E, 4, L),
                                         ("NCW", "OIW", "NCW"))
    matchR = jax.lax.conv_general_dilated(
        jnp.moveaxis(X, -1, 1), jnp.moveaxis(YR, -1, 1),
        window_strides=(1,), padding=((0, L - 1),), dimension_numbers=dn2)

    t = jnp.arange(L, dtype=jnp.int32)                         # split point
    q = ev_ins_len.astype(jnp.int32)[None, :, None]            # (1, E, 1)
    lag_l = jnp.clip(L - t, 0, L - 1)[None, None, :]
    mmL = t[None, None, :] - jnp.moveaxis(matchL, 0, 1).astype(jnp.int32)[
        jnp.arange(R)[:, None, None], jnp.arange(E)[None, :, None], lag_l]

    lag_r = jnp.clip(t[None, None, :] + q, 0, L - 1)
    mR = matchR.astype(jnp.int32)[
        jnp.arange(R)[:, None, None], jnp.arange(E)[None, :, None], lag_r]
    suf_len = lengths[:, None, None] - t[None, None, :] - q
    mmR = suf_len - mR

    # inserted-base mismatches vs the event's sequence (static unroll keeps
    # peak memory at one (R, E, L) buffer instead of MAX_INS of them)
    mm_ins = jnp.zeros((R, E, L), jnp.int32)
    for i in range(MAX_INS):
        rb = readsg[jnp.arange(R, dtype=jnp.int32)[:, None, None],
                    jnp.clip(t[None, None, :] + i, 0, L - 1)]  # (R, 1, L)
        sb = ev_ins_seq[None, :, i, None]                      # (1, E, 1)
        act = i < q
        mm_ins = mm_ins + (((rb != sb) | (rb >= 4) | (sb >= 4)) & act)

    mm = mmL + mmR + mm_ins
    interior = ((t[None, None, :] >= 1)
                & (t[None, None, :] + q <= lengths[:, None, None] - 1))
    big = jnp.int32(32767)
    mm = jnp.where(interior & ev_valid[None, :, None], mm, big)

    best = jnp.min(mm, axis=2)
    best_t = jnp.argmin(mm, axis=2).astype(jnp.int32)
    ok = best <= max_mm
    return best_t, jnp.where(ok, best, big), ok


def realign_events(genome, readsg, lengths, events, max_mm: int,
                   chunk: int = 128, backend: str = "auto"):
    """Host wrapper: chunk the event table to bound device memory.

    events: dict of numpy arrays (left, right, kind, ins_len, ins_seq,
    valid). Returns (best_t, mm, ok) as (R, E) numpy arrays.

    backend "pallas" (or "auto" on TPU) routes through the fused Pallas
    kernel (ops/pallas/realign_kernel.py), grouping events by insertion
    length; anything else uses the XLA conv path."""
    E = len(events["left"])
    R = readsg.shape[0]
    if E == 0:
        return (np.zeros((R, 0), np.int32), np.zeros((R, 0), np.int32),
                np.zeros((R, 0), bool))
    if backend == "auto":
        backend = ("pallas" if jax.default_backend() == "tpu"
                   and readsg.shape[1] >= 16 else "xla")
    if backend == "pallas":
        try:
            return _realign_events_pallas(genome, readsg, lengths, events,
                                          max_mm)
        except Exception:  # Mosaic/compile issues: fall back to XLA conv
            pass
    # multi-device: rows sharded over the mesh's reads axis, events + genome
    # replicated (parallel/auto.py) — the realignment analog of the
    # reference's per-thread read ranges (tophat_reports.cpp:1231)
    from tophat_tpu.parallel import auto

    (readsg_d, lengths_d), nrows = auto.shard_rows(readsg, lengths)
    genome_d = auto.replicated(genome)
    outs_t, outs_mm, outs_ok = [], [], []
    for s in range(0, E, chunk):
        e = min(s + chunk, E)
        pad = chunk - (e - s)
        pick = lambda a: np.concatenate(
            [a[s:e], np.zeros((pad,) + a.shape[1:], a.dtype)]) if pad else a[s:e]
        bt, mm, ok = realign_chunk(
            genome_d, readsg_d, lengths_d,
            jnp.asarray(pick(events["left"])), jnp.asarray(pick(events["right"])),
            jnp.asarray(pick(events["kind"])), jnp.asarray(pick(events["ins_len"])),
            jnp.asarray(pick(events["ins_seq"])),
            jnp.asarray(pick(events["valid"].astype(bool))), max_mm=max_mm)
        outs_t.append(np.asarray(bt)[:nrows, : e - s])
        outs_mm.append(np.asarray(mm)[:nrows, : e - s])
        outs_ok.append(np.asarray(ok)[:nrows, : e - s])
    return (np.concatenate(outs_t, 1), np.concatenate(outs_mm, 1),
            np.concatenate(outs_ok, 1))


def _realign_events_pallas(genome, readsg, lengths, events, max_mm: int):
    """Route realignment through the fused Pallas kernel, one call per
    distinct insertion length (kernel requirement), scattering results back
    into the (R, E) tables."""
    from tophat_tpu.ops.pallas.realign_kernel import (prepare_inputs,
                                                      realign_pallas)

    R, L = readsg.shape
    E = len(events["left"])
    best_t = np.zeros((R, E), np.int32)
    mm = np.full((R, E), 32767, np.int32)
    ok = np.zeros((R, E), bool)

    kinds = np.asarray(events["kind"])
    ilen = np.where(kinds == KIND_INSERTION,
                    np.asarray(events["ins_len"]), 0).astype(np.int32)
    lengths_d = jnp.asarray(lengths)
    for q in np.unique(ilen):
        idx = np.nonzero(ilen == q)[0]
        X, YL, YC = prepare_inputs(
            genome, readsg, jnp.asarray(events["left"][idx]),
            jnp.asarray(events["right"][idx]), jnp.asarray(kinds[idx]),
            np.asarray(events["ins_seq"])[idx], int(q), L)
        bt, m, o = realign_pallas(X, YL, YC, lengths_d, L=L, q=int(q),
                                  max_mm=max_mm)
        best_t[:, idx] = np.asarray(bt)
        mm[:, idx] = np.asarray(m)
        ok[:, idx] = np.asarray(o)
    valid = np.asarray(events["valid"]).astype(bool)
    ok &= valid[None, :]
    return best_t, mm, ok
