"""Data-locality DoF renumbering for general (unstructured-style) meshes.

Capability of ``Renumber<dim, Number>`` (reference:
``common_code/renumber_dofs_for_mf.h:15-145``), whose strategy triple
(0, 1, 2) = (cell_assembly, first_touch, touch-count grouping) the benchmark
uses (``benchmark.h:112``).  The permutation orders scalar nodes so that

1. nodes touched by exactly one cell ("interior", never communicated) come
   first in first-touch sweep order — the matrix-free loop then walks memory
   almost sequentially (``:247-361, 461-474, 556-590``);
2. nodes shared between cells follow, also in first-touch order;
3. ghost nodes (shared with other partitions) come last, so the partitioner's
   import/export ranges are few and contiguous (``:492-535, 673-730``).

On the structured fast path the lattice layout already has this property by
construction (SURVEY.md §7); this module serves the *general* gather/scatter
backend, where measurement on TPU shows gather locality directly affects
HBM efficiency.  A native C++ implementation is used when available
(:mod:`mf_data_locality_tpu.native`), with this NumPy version as the
reference/fallback.
"""

from __future__ import annotations

import numpy as np

from mf_data_locality_tpu import native


def locality_permutation_np(gather: np.ndarray, n_nodes: int,
                            ghost_flags: np.ndarray | None = None
                            ) -> tuple[np.ndarray, int]:
    """Pure-NumPy locality permutation: returns (perm old->new, n_interior)."""
    flat = gather.reshape(-1)
    touch = np.bincount(flat, minlength=n_nodes)

    # first-touch order: index of first occurrence in the cell sweep
    first_idx = np.full(n_nodes, flat.size, dtype=np.int64)
    # reverse pass so earlier occurrences overwrite later ones
    np.minimum.at(first_idx, flat, np.arange(flat.size))
    order_rank = np.argsort(np.argsort(first_idx, kind="stable"), kind="stable")

    if ghost_flags is None:
        ghost_flags = np.zeros(n_nodes, dtype=bool)
    cls = np.where(ghost_flags, 2, np.where(touch == 1, 0, 1))
    key = cls.astype(np.int64) * (2 * n_nodes + flat.size) + order_rank
    order = np.argsort(key, kind="stable")
    perm = np.empty(n_nodes, dtype=np.int32)
    perm[order] = np.arange(n_nodes, dtype=np.int32)
    n_interior = int(np.count_nonzero((cls == 0)))
    return perm, n_interior


def locality_permutation(gather: np.ndarray, n_nodes: int,
                         ghost_flags: np.ndarray | None = None
                         ) -> tuple[np.ndarray, int]:
    """Locality permutation; native C++ when available, NumPy otherwise."""
    if native.AVAILABLE:
        gf = None if ghost_flags is None else ghost_flags.astype(np.uint8)
        return native.renumber_locality(gather, n_nodes, gf)
    return locality_permutation_np(gather, n_nodes, ghost_flags)


def apply_permutation(gather: np.ndarray, perm: np.ndarray) -> np.ndarray:
    """Renumbered gather map: new node ids at the same cell-local slots."""
    return perm[gather]


def permute_nodes(arr: np.ndarray, perm: np.ndarray, axis: int = -1
                  ) -> np.ndarray:
    """Reorder a per-node array into the new numbering (out[perm[i]] = in[i])."""
    out = np.empty_like(arr)
    idx = [slice(None)] * arr.ndim
    idx[axis] = perm
    out[tuple(idx)] = arr
    return out
