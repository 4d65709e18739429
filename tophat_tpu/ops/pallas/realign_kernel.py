"""Pallas TPU kernel for event realignment (fused correlation + min).

The XLA path (ops/events.realign_chunk) computes the full (R, E, L)
mismatch volume with two convolutions plus an inserted-base pass, then
reduces it — materializing R*E*L int32 several times over. This kernel
keeps everything in VMEM for a (read-tile x event-tile) block: for each
split t it issues two MXU matmuls against lag-shifted flank slices and
folds the result straight into running (best_mm, best_t) accumulators, so
HBM traffic is O(R*L + E*L + R*E) instead of O(R*E*L).

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


def _realign_kernel(x_ref, ylpad_ref, ycpad_ref, len_ref,
                    best_ref, bestt_ref, *, L: int, q: int):
    xm = x_ref[...]           # (TILE_R, L*4) pre-flattened one-hots
    lens = len_ref[...]       # (TILE_R, 1) int32

    big = jnp.float32(32767.0)
    best = jnp.full((TILE_R, TILE_E), big, jnp.float32)
    bestt = jnp.zeros((TILE_R, TILE_E), jnp.int32)

    def body(t, carry):
        best, bestt = carry
        # prefix: slice [L-t, 2L-t) of [YL | zeros] = flankL[u + L - t]
        # (flattened: one-hot groups of 4 stay aligned under *4 offsets)
        yl = ylpad_ref[:, pl.ds((L - t) * 4, L * 4)]
        matchL = jax.lax.dot_general(
            xm, yl, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # insert+suffix: slice [L-t, 2L-t) of [zeros | C] gives C[u - t]
        # at read position u (C = [inserted_seq | right_flank])
        yc = ycpad_ref[:, pl.ds((L - t) * 4, L * 4)]
        matchC = jax.lax.dot_general(
            xm, yc, (((1,), (1,)), ((), ())),
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
def realign_pallas(X, YLpad, YCpad, lengths, *, L: int, q: int,
                   max_mm: int, interpret: bool = False):
    """Fused best-split search.

    X: (R, L*4) f32; YLpad/YCpad: (E, 2L*4) f32 from prepare_inputs
    (one-hots flattened along the base axis); lengths: (R,) int32.
    Returns (best_t, mm, ok) like realign_chunk.
    """
    R = X.shape[0]
    E = YLpad.shape[0]
    grid = (pl.cdiv(R, TILE_R), pl.cdiv(E, TILE_E))

    best, bestt = pl.pallas_call(
        partial(_realign_kernel, L=L, q=q),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_R, L * 4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_E, 2 * L * 4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_E, 2 * L * 4), lambda i, j: (j, 0),
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
    )(X, YLpad, YCpad, lengths[:, None].astype(jnp.int32))
    ok = best <= max_mm
    return bestt, jnp.where(ok, best, 32767), ok


def prepare_inputs(genome, readsg, ev_left, ev_right, ev_kind, ev_ins_seq,
                   q: int, L: int):
    """One-hot volumes for realign_pallas (XLA side).

    Mirrors realign_chunk's flank construction: left flank ends at ev_left;
    the combined right-hand target is [inserted_seq (q) | flankR] where
    flankR starts at ev_right (junction/deletion/fusion) or ev_left+1
    (insertion, kind==2)."""
    genome = jnp.asarray(genome)
    n = genome.shape[0]
    E = ev_left.shape[0]

    def onehot(codes):
        return (codes[..., None]
                == jnp.arange(4, dtype=jnp.int32)).astype(jnp.float32)

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

    zL = jnp.zeros((E, L, 4), jnp.float32)
    YLpad = jnp.concatenate([onehot(flankL), zL], axis=1)
    YCpad = jnp.concatenate([zL, onehot(combined)], axis=1)
    R = X.shape[0]
    return (X.reshape(R, -1), YLpad.reshape(E, -1), YCpad.reshape(E, -1))
