"""Automatic multi-device execution of the production pipeline.

The reference parallelizes every heavy per-read loop by read-range sharding
across boost::threads with private result sets merged single-threaded
(reference: src/utils.cpp:22 calculate_offsets; worker fan-outs at
segment_juncs.cpp:4763, long_spanning_reads.cpp:3052,
tophat_reports.cpp:2742-2815). The TPU-native equivalent implemented here:
when a mesh is active, every device-side stage of the real pipeline —
full-read alignment, segment mapping, junction/indel/fusion window scans,
and event realignment — runs as one SPMD program with its row axis sharded
over the mesh's "reads" axis (jax.sharding.NamedSharding + jit/GSPMD), the
FM index and genome replicated, and results gathered to host for the same
order-preserving merge the single-device path uses. Because each sharded
stage is row-independent and rows are padded by edge-replication then
sliced back, outputs are bit-identical to the single-device run — the
multi-chip analog of the reference's deterministic thread merge.

Activation: pipeline entry points call `auto_activate()` which builds a 1-D
("reads") mesh over all visible devices (overridable with
TOPHAT_TPU_DEVICES=<n>; n=1 disables). Tests drive both paths explicitly.
"""

from __future__ import annotations

import os
from typing import Any, List, Tuple

import numpy as np

_MESH = None
_REPL: List[Tuple[Any, Any]] = []  # [(host_obj, replicated_obj)] strong refs


def active():
    return _MESH


def activate(mesh) -> None:
    global _MESH
    _MESH = mesh
    _REPL.clear()


def deactivate() -> None:
    global _MESH
    _MESH = None
    _REPL.clear()


def auto_activate(log=None) -> None:
    """Build a reads-axis mesh over all visible devices (if more than one).

    TOPHAT_TPU_DEVICES=<n> caps the device count; 1 disables sharding.
    """
    import jax

    from tophat_tpu.parallel.mesh import make_mesh

    n = len(jax.devices())
    cap = os.environ.get("TOPHAT_TPU_DEVICES")
    if cap is not None:
        n = min(n, max(1, int(cap)))
    if n <= 1:
        deactivate()
        return
    activate(make_mesh(n_reads_shards=n, n_genome_shards=1,
                       devices=jax.devices()[:n]))
    if log:
        log(f"multi-device: sharding read batches over {n} devices")


def n_row_shards() -> int:
    if _MESH is None:
        return 1
    from tophat_tpu.parallel.mesh import READS_AXIS

    return _MESH.shape[READS_AXIS]


def replicated(obj):
    """device_put a pytree fully replicated over the mesh (identity-cached:
    the FM index / genome are placed once per pipeline)."""
    if _MESH is None:
        return obj
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    for host, dev in _REPL:
        if host is obj:
            return dev
    dev = jax.device_put(obj, NamedSharding(_MESH, P()))
    _REPL.append((obj, dev))
    if len(_REPL) > 16:  # bound device memory pinned by the cache
        _REPL.pop(0)
    return dev


def shard_rows(*arrays):
    """Pad each array's leading dim (all equal) up to a multiple of the
    reads-axis size by edge replication, then device_put sharded over dim 0.

    Returns (device_arrays, n_orig_rows). Callers slice outputs back to
    n_orig_rows; edge-replicated pad rows compute duplicate results that are
    discarded, keeping sharded results bit-identical to unsharded ones.
    With no active mesh, returns the arrays untouched.
    """
    B = int(np.asarray(arrays[0]).shape[0])
    if _MESH is None or B == 0:
        return list(arrays), B
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tophat_tpu.parallel.mesh import READS_AXIS

    n = _MESH.shape[READS_AXIS]
    pad = (-B) % n
    out = []
    spec = NamedSharding(_MESH, P(READS_AXIS))
    for a in arrays:
        a = np.asarray(a)
        if pad:
            a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])
        out.append(jax.device_put(a, spec))
    return out, B


def shard_pytree_rows(tree):
    """shard_rows for a pytree whose every leaf has the same leading dim.
    Returns (sharded_tree, n_orig_rows)."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    sharded, B = shard_rows(*leaves)
    return jax.tree_util.tree_unflatten(treedef, sharded), B
