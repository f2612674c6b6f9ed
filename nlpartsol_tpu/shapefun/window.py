"""Arithmetic neighborhood windows on the structured background grid.

Replaces the reference's per-particle linked-list tributary sets rebuilt by
ring walks every step (``tributary__LME__``/``local_search__LME__``,
/root/reference/nl-partsol/src/Nodes/LME.c:895-1099, and the ChainPtr set
library, src/Matlib/ChainOp.c).  On a structured grid the candidate support
of a particle is a static ``(2W+1)^d`` (or ``2^d`` for FEM) window of node
multi-indices around its cell — computed arithmetically, padded to a static
``K``, and masked.  This is the dynamic CSR pattern of SURVEY.md §7 with a
compile-time K_max.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import config
from ..types import Grid


def window_offsets(dim: int, lo: int, hi: int) -> np.ndarray:
    """All integer offset vectors in [lo, hi]^dim, shape (K, dim), C-order."""
    rng = np.arange(lo, hi + 1)
    mesh = np.meshgrid(*([rng] * dim), indexing="ij")
    return np.stack([m.reshape(-1) for m in mesh], axis=-1).astype(np.int32)


def window_nodes(grid: Grid, x: jax.Array, offsets: np.ndarray):
    """Candidate support nodes for particles at ``x``.

    Args:
      grid: background grid.
      x: (Np, d) particle positions.
      offsets: (K, d) static integer window offsets relative to the cell.

    Returns:
      node_ids: (Np, K) int32 flat node ids (clamped in-bounds; use mask).
      rel: (Np, K, d) l = x_p - x_node.
      mask: (Np, K) bool — offset lands inside the grid (and node active).
    """
    offs = jnp.asarray(offsets)
    cell = grid.cell_of(x)  # (Np, d)
    dims = jnp.array(grid.dims, dtype=cell.dtype)
    # Clamp the cell so boundary/outside particles still index validly.
    cell = jnp.clip(cell, 0, dims - 2)
    multi = cell[:, None, :] + offs[None, :, :]  # (Np, K, d)
    inb = jnp.all((multi >= 0) & (multi < dims), axis=-1)
    multi_c = jnp.clip(multi, 0, dims - 1)
    node_ids = grid.flat_index(multi_c)
    node_pos = multi_c.astype(x.dtype) * grid.spacing + jnp.array(
        grid.origin, dtype=x.dtype
    )
    rel = x[:, None, :] - node_pos
    mask = inb
    if grid.valid_lo is not None:
        # halo-sharded local strip: mask phantom planes beyond the global
        # grid edge (parallel/domain.py) so the basis renormalises exactly
        # as the single-device grid would at its boundary.  Scalars bound
        # axis 0 (1-D decomposition); (d,) arrays bound every axis (2-D).
        vlo = jnp.asarray(grid.valid_lo, jnp.int32).reshape(-1)
        vhi = jnp.asarray(grid.valid_hi, jnp.int32).reshape(-1)
        if vlo.shape[0] > 1:
            mask = mask & jnp.all(multi >= vlo, axis=-1) & jnp.all(
                multi <= vhi, axis=-1
            )
        else:
            mask = mask & (multi[..., 0] >= vlo[0]) & (multi[..., 0] <= vhi[0])
    if grid.active is not None:
        mask = mask & grid.active[node_ids]
    return node_ids.astype(config.index_dtype()), rel, mask
