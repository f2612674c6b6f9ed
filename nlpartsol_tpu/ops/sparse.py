"""Sparse particle↔grid transfer core.

This is the heart of the BASELINE.json north star: the particle-to-grid
sparsity pattern produced by the shape functions is a padded (Np, K) CSR-like
block; P2G scatter is an SpMM expressed as a scatter-add (deterministic
segment-sum — structurally race-free, unlike the reference's
``#pragma omp critical`` around ``VecSetValues``,
/root/reference/nl-partsol/src/Formulations/Displacements/U-Newmark-beta.c:582-586),
and G2P gather is the transpose SpMV (a gather + contraction).

All functions take the pattern as (node_ids, mask) with static K and a static
total node count, keeping shapes jit-stable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["p2g", "g2p", "nnz", "masked_lumped_mass"]


def p2g(
    node_ids: jax.Array,  # (Np, K) int32
    mask: jax.Array,  # (Np, K) bool
    vals: jax.Array,  # (Np, K) or (Np, K, c) per-edge contributions
    n_nodes: int,
    axis_name: str = None,
) -> jax.Array:
    """Scatter-add edge contributions to grid nodes.

    Under shard_map with particles sharded over ``axis_name`` and grid
    vectors replicated, the local partial sums are combined with a psum —
    the collective seam of the particle-parallel decomposition
    (SURVEY.md §2.9: the only inter-device coupling in MPM is P2G).

    Returns (n_nodes,) or (n_nodes, c).
    """
    flat_ids = node_ids.reshape(-1)
    if vals.ndim == 2:
        flat_vals = jnp.where(mask, vals, 0).reshape(-1)
        out = jnp.zeros((n_nodes,), vals.dtype)
        out = out.at[flat_ids].add(flat_vals, mode="drop")
    else:
        c = vals.shape[-1]
        flat_vals = jnp.where(mask[..., None], vals, 0).reshape(-1, c)
        out = jnp.zeros((n_nodes, c), vals.dtype)
        out = out.at[flat_ids].add(flat_vals, mode="drop")
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out


def g2p(
    node_ids: jax.Array,  # (Np, K)
    mask: jax.Array,  # (Np, K)
    weights: jax.Array,  # (Np, K) e.g. N values
    field: jax.Array,  # (n_nodes,) or (n_nodes, c)
) -> jax.Array:
    """Gather a grid field to particles: out_p = Σ_a w_pa field[ids_pa].

    Returns (Np,) or (Np, c).
    """
    gathered = field[node_ids]  # (Np, K) or (Np, K, c)
    if field.ndim == 1:
        return jnp.sum(jnp.where(mask, weights, 0) * gathered, axis=-1)
    return jnp.einsum("pk,pkc->pc", jnp.where(mask, weights, 0), gathered)


def nnz(mask: jax.Array) -> jax.Array:
    """Number of nonzeros in the current pattern (for nnz/s accounting)."""
    return jnp.sum(mask.astype(jnp.int32))


def masked_lumped_mass(
    node_ids: jax.Array,
    mask: jax.Array,
    N: jax.Array,
    mass_p: jax.Array,
    n_nodes: int,
    axis_name: str = None,
) -> jax.Array:
    """Lumped nodal mass m_A = Σ_p m_p N_pA (``__mass_NODES``,
    U-Verlet.c:166; ``__compute_nodal_lumped_mass``, U-Newmark-beta.c:528)."""
    return p2g(node_ids, mask, N * mass_p[:, None], n_nodes, axis_name=axis_name)
