"""FM-index: build on host, search on TPU.

This is the TPU-native replacement for the external Bowtie FM-index
(reference: src/tophat.py:2286-2353 drives `bowtie2` as a subprocess; the
index itself lives in .ebwt/.bt2 files). Here the index is a set of device
arrays designed for batched rank queries:

  packed_bwt : uint32[ceil((n+1)/16)]    BWT(T$), 2-bit codes, 16 per word
  occ_ck     : int32[nblocks+1, 4]       Occ checkpoints every OCC_BLOCK bases
  C          : int32[5]                  C[c] = 1 + #{symbols < c in T}
  sa         : int32[n+1]                suffix array (full; sampled variant
                                         planned behind resolve())
  genome     : int8[n]                   original codes incl. N=4, for
                                         verification gathers
  primary    : int32[]                   row of the sentinel in the BWT

N bases are mapped to A in the FM text; candidate verification against
`genome` (ops/verify.py) re-counts them as mismatches, so N regions can never
produce a reported alignment they shouldn't.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tophat_tpu.index.fasta import Genome
from tophat_tpu.index.suffix import bwt_from_sa, suffix_array

OCC_BLOCK = 128  # bases per Occ checkpoint block
WORDS_PER_BLOCK = OCC_BLOCK // 16


def pack_2bit(codes: np.ndarray) -> np.ndarray:
    """Pack int8 2-bit codes (values 0..3) into uint32 words, 16 per word,
    code i at bits [2*(i%16), 2*(i%16)+1]."""
    n = codes.shape[0]
    nwords = (n + 15) // 16
    padded = np.zeros(nwords * 16, dtype=np.uint32)
    padded[:n] = codes.astype(np.uint32)
    padded = padded.reshape(nwords, 16)
    shifts = (2 * np.arange(16, dtype=np.uint32))[None, :]
    return np.bitwise_or.reduce(padded << shifts, axis=1).astype(np.uint32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FMIndex:
    packed_bwt: Any  # uint32[(n+1+15)//16]
    occ_ck: Any      # int32[nblocks+1, 4]
    C: Any           # int32[5]
    sa: Any          # int32[n+1]
    genome: Any      # int8[n]
    primary: Any     # int32[] scalar
    n: int = dataclasses.field(metadata=dict(static=True))

    def device_put(self, sharding=None) -> "FMIndex":
        put = (lambda x: jax.device_put(x, sharding)) if sharding else jax.device_put
        return FMIndex(
            packed_bwt=put(self.packed_bwt), occ_ck=put(self.occ_ck),
            C=put(self.C), sa=put(self.sa), genome=put(self.genome),
            primary=put(self.primary), n=self.n)

    def save(self, path: str) -> None:
        np.savez_compressed(
            path, packed_bwt=np.asarray(self.packed_bwt),
            occ_ck=np.asarray(self.occ_ck), C=np.asarray(self.C),
            sa=np.asarray(self.sa), genome=np.asarray(self.genome),
            primary=np.asarray(self.primary), n=self.n)

    @staticmethod
    def load(path: str) -> "FMIndex":
        z = np.load(path)
        return FMIndex(
            packed_bwt=z["packed_bwt"], occ_ck=z["occ_ck"], C=z["C"],
            sa=z["sa"], genome=z["genome"], primary=z["primary"][()],
            n=int(z["n"][()]))


def build_fm_index(genome: Genome | np.ndarray) -> FMIndex:
    """Build the FM-index of a genome's forward strand on the host.

    Reverse-strand alignment is done by searching the reverse complement of
    the read against this same index (no second index needed)."""
    codes = genome.codes if isinstance(genome, Genome) else np.asarray(genome)
    codes = codes.astype(np.int8)
    text = np.where(codes == 4, 0, codes).astype(np.int8)  # N -> A in FM text
    n = text.shape[0]

    sa = suffix_array(text)
    bwt, primary = bwt_from_sa(text, sa)
    m = n + 1

    # Occ checkpoints: occ_ck[b, c] = #occurrences of c in bwt[0 : b*OCC_BLOCK)
    # (the sentinel row's stored 0 is counted here; rank() subtracts it).
    nblocks = (m + OCC_BLOCK - 1) // OCC_BLOCK
    onehot = np.zeros((nblocks * OCC_BLOCK, 4), dtype=np.int32)
    onehot[np.arange(m), bwt] = 1
    per_block = onehot.reshape(nblocks, OCC_BLOCK, 4).sum(axis=1)
    occ_ck = np.zeros((nblocks + 1, 4), dtype=np.int32)
    occ_ck[1:] = np.cumsum(per_block, axis=0)

    # C[c] = 1 (sentinel) + #symbols < c in the text
    counts = np.bincount(text, minlength=4)[:4]
    C = np.zeros(5, dtype=np.int32)
    C[1:] = np.cumsum(counts)
    C += 1
    C[0] = 1

    return FMIndex(
        packed_bwt=pack_2bit(bwt), occ_ck=occ_ck, C=C,
        sa=sa.astype(np.int32), genome=codes,
        primary=np.int32(primary), n=n)
