"""Pallas TPU kernel for event realignment (fused correlation + min).

The XLA path (ops/events.realign_chunk) computes the full (R, E, L)
mismatch volume with two convolutions plus an inserted-base pass, then
reduces it — materializing R*E*L int32 several times over. This kernel
keeps everything in VMEM for a (read-tile x event-tile) block: for each
split t it issues two MXU matmuls against lag-shifted flank slices and
folds the result straight into running (best_mm, best_t) accumulators, so
HBM traffic is O(R*L + E*L + R*E) instead of O(R*E*L).

Layout notes (what Mosaic accepts): the per-split lag slice must happen
on the SUBLANE dimension — lane-dim dynamic slices need 128-aligned
offsets, which per-base lags are not. So the flank volumes are stored
TRANSPOSED, (2L*C, E), with the one-hot channel axis padded from 4 to
C=8 so the lag offset (L-t)*C is provably a multiple of the f32 sublane
tile. The matmuls contract over the (L*C)-wide sublane axis on the MXU.

Trick: the event's right-hand comparison target is the concatenation
[inserted_seq | right_flank] (inserted_seq empty for junctions/deletions/
fusions), so ONE lag slice covers both the inserted bases and the suffix —
the kernel is exact for every event kind. All events in a call share the
same insertion length q (the wrapper groups by q).

Split semantics match ops/events.realign_chunk:
  mm(t) = [t - matchL(lag L-t)] + [(len - t) - matchC(lag L-q-t)]
with interior splits 1 <= t <= len - 1 - q.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 128
TILE_E = 128
C = 8           # one-hot channel stride (4 bases, padded for alignment)


def _realign_kernel(x_ref, ylpad_ref, ycpad_ref, len_ref,
                    best_ref, bestt_ref, *, L: int, q: int):
    xm = x_ref[...].astype(jnp.bfloat16)   # (TILE_R, L*C) one-hots
    lens = len_ref[...]       # (TILE_R, 1) int32

    big = jnp.float32(32767.0)
    best = jnp.full((TILE_R, TILE_E), big, jnp.float32)
    bestt = jnp.zeros((TILE_R, TILE_E), jnp.int32)

    def body(t, carry):
        best, bestt = carry
        # prefix: rows [ (L-t)*C, (2L-t)*C ) of [YL | zeros]^T give
        # flankL[u + L - t] at read position u (channel groups stay
        # aligned under *C offsets, and (L-t)*C is sublane-aligned)
        yl = ylpad_ref[pl.ds((L - t) * C, L * C), :].astype(jnp.bfloat16)
        matchL = jax.lax.dot_general(
            xm, yl, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # insert+suffix: same rows of [zeros | C]^T give combined[u - t]
        yc = ycpad_ref[pl.ds((L - t) * C, L * C), :].astype(jnp.bfloat16)
        matchC = jax.lax.dot_general(
            xm, yc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        tf = jnp.float32(t)
        rest = (lens - t).astype(jnp.float32)              # (TILE_R, 1)
        mm = (tf - matchL) + (rest - matchC)
        interior = (t >= 1) & (t + q <= lens - 1)          # (TILE_R, 1)
        mm = jnp.where(interior, mm, big)
        upd = mm < best
        bestt = jnp.where(upd, t, bestt)
        best = jnp.where(upd, mm, best)
        return best, bestt

    best, bestt = jax.lax.fori_loop(1, L, body, (best, bestt))
    best_ref[...] = best.astype(jnp.int32)
    bestt_ref[...] = bestt


@partial(jax.jit, static_argnames=("L", "q", "max_mm", "interpret"))
def realign_pallas(X, YLpadT, YCpadT, lengths, *, L: int, q: int,
                   max_mm: int, interpret: bool = False):
    """Fused best-split search.

    X: (R, L*C) bf16; YLpadT/YCpadT: (2L*C, E) bf16 from prepare_inputs
    (one-hots flattened along the padded base axis, event axis last);
    lengths: (R,) int32. Returns (best_t, mm, ok) like realign_chunk."""
    R = X.shape[0]
    E = YLpadT.shape[1]
    grid = (pl.cdiv(R, TILE_R), pl.cdiv(E, TILE_E))

    best, bestt = pl.pallas_call(
        partial(_realign_kernel, L=L, q=q),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_R, L * C), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * L * C, TILE_E), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * L * C, TILE_E), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_R, TILE_E), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, TILE_E), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, E), jnp.int32),
            jax.ShapeDtypeStruct((R, E), jnp.int32),
        ],
        interpret=interpret,
    )(X, YLpadT, YCpadT, lengths[:, None].astype(jnp.int32))
    ok = best <= max_mm
    return bestt, jnp.where(ok, best, 32767), ok


def prepare_inputs(genome, readsg, ev_left, ev_right, ev_kind, ev_ins_seq,
                   q: int, L: int):
    """One-hot volumes for realign_pallas (XLA side).

    Mirrors realign_chunk's flank construction: left flank ends at ev_left;
    the combined right-hand target is [inserted_seq (q) | flankR] where
    flankR starts at ev_right (junction/deletion/fusion) or ev_left+1
    (insertion, kind==2). Channels pad 4 -> C for sublane alignment; the
    flank volumes come back transposed (base axis first)."""
    genome = jnp.asarray(genome)
    n = genome.shape[0]
    E = ev_left.shape[0]

    def onehot(codes):
        # bf16 one-hots: 0/1 values are exact and the dot accumulates in
        # f32, so the match counts stay integral; storage/traffic halve
        return (codes[..., None]
                == jnp.arange(C, dtype=jnp.int32)).astype(jnp.bfloat16)

    X = onehot(jnp.asarray(readsg, jnp.int32))

    li = ev_left[:, None] - (L - 1) + jnp.arange(L, dtype=jnp.int32)
    flankL = jnp.where((li >= 0) & (li < n),
                       genome[jnp.clip(li, 0, n - 1)].astype(jnp.int32), 5)
    r_start = jnp.where(ev_kind == 2, ev_left + 1, ev_right)
    ri = r_start[:, None] + jnp.arange(L - q, dtype=jnp.int32)
    flankR = jnp.where((ri >= 0) & (ri < n),
                       genome[jnp.clip(ri, 0, n - 1)].astype(jnp.int32), 5)
    seq = jnp.asarray(ev_ins_seq[:, :q], jnp.int32) if q else jnp.zeros(
        (E, 0), jnp.int32)
    combined = jnp.concatenate([seq, flankR], axis=1)      # (E, L)

    zL = jnp.zeros((E, L, C), jnp.bfloat16)
    YLpad = jnp.concatenate([onehot(flankL), zL], axis=1)
    YCpad = jnp.concatenate([zL, onehot(combined)], axis=1)
    R = X.shape[0]
    return (X.reshape(R, -1), YLpad.reshape(E, -1).T,
            YCpad.reshape(E, -1).T)
