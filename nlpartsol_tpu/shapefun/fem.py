"""Multilinear FEM hat shape functions on the structured background grid.

The structured-grid counterpart of the reference's Q4/H8 isoparametric
elements (/root/reference/nl-partsol/src/Nodes/{Q4,H8}.c: N at Q4.c:112,
dN, and the in/out + Xi_to_X machinery).  On a regular Cartesian grid the
isoparametric map is affine, so N and ∇N are closed-form products of 1D hats
— no Newton inversion of X_to_Xi is needed.  Unstructured T3/T4 meshes are
handled by the GiD-mesh pathway (io/gid_mesh.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..types import Grid
from .window import window_nodes, window_offsets


def offsets_for(dim: int):
    return window_offsets(dim, 0, 1)  # the 2^d cell corners


def evaluate(grid: Grid, x: jax.Array):
    """Multilinear N, ∇N.

    Returns same dict contract as lme.evaluate (no λ state).
    """
    offs = offsets_for(grid.dim)
    node_ids, rel, mask = window_nodes(grid, x, offs)
    h = grid.spacing
    # rel = x_p − x_node; ξ_axis = rel/h ∈ [0,1] for the lower corner, [−1,0] upper
    t = rel / h  # (Np, K, d)
    n1d = 1.0 - jnp.abs(t)
    n1d = jnp.clip(n1d, 0.0, 1.0)
    N = jnp.prod(n1d, axis=-1)
    N = jnp.where(mask, N, 0.0)
    # dN_i = (∂/∂x_i) Π_j n1d_j = sign'(t_i)·(−1/h)·Π_{j≠i} n1d_j
    dsign = -jnp.sign(t) / h  # d n1d / dx = −sign(t)/h
    prod_except = N[..., None] / jnp.where(n1d > 0.0, n1d, 1.0)
    dN = dsign * prod_except
    dN = jnp.where(mask[..., None], dN, 0.0)
    return dict(node_ids=node_ids, N=N, dN=dN, mask=mask, lam=None)
