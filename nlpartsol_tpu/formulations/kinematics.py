"""Particle kinematics kernels (reference src/Particles/compute-Strains.c).

All batched over particles; the nodal gathers arrive pre-contracted from the
sparse G2P so these are pure per-particle tensor algebra on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import sparse
from ..ops import tensor as tn


def incremental_deformation_gradient(
    node_ids, mask, dN, d_disp_nodes
) -> jax.Array:
    """ΔF = I + Σ_A Δu_A ⊗ ∇N_A (update_increment_Deformation_Gradient__
    Particles__, compute-Strains.c:20-43).

    Args:
      node_ids/mask: (Np, K) pattern.
      dN: (Np, K, d) shape gradients.
      d_disp_nodes: (n_nodes, d) nodal incremental displacement.
    Returns:
      (Np, d, d).
    """
    du = d_disp_nodes[node_ids]  # (Np, K, d)
    du = jnp.where(mask[..., None], du, 0.0)
    grad = jnp.einsum("pki,pkj->pij", du, dN)  # Δu ⊗ ∇N summed over K
    d = dN.shape[-1]
    return grad + jnp.eye(d, dtype=grad.dtype)


def rate_increment_deformation_gradient(node_ids, mask, dN, d_vel_nodes):
    """dΔF/dt = Σ_A Δv_A ⊗ ∇N_A (compute-Strains.c:48-72)."""
    dv = d_vel_nodes[node_ids]
    dv = jnp.where(mask[..., None], dv, 0.0)
    return jnp.einsum("pki,pkj->pij", dv, dN)


def rate_deformation_gradient_n1(dt_DF, F_n, DF, dFdt_n):
    """Ḟ_{n+1} = (dΔF/dt)·F_n + ΔF·Ḟ_n (compute-Strains.c:176-209)."""
    return dt_DF @ F_n + DF @ dFdt_n


def push_forward_dN(dN, DF):
    """∇N^{n+1} = ΔF^{-T} ∇N^n per particle
    (push_forward_dN__MeshTools__, Shape-Functions.c:405-449).

    dN: (Np, K, d); DF: (Np, d, d) → (Np, K, d).
    """
    DF_invT = tn.inv_transpose(DF)
    return jnp.einsum("pij,pkj->pki", DF_invT, dN)


def fbar_deformation_gradient(F_n1, J_n1, DJ_patch, alpha_fbar):
    """Locking-free F-bar blend
    (get_locking_free_Deformation_Gradient_n1__Particles__,
    compute-Strains.c:109-174): scale F by (J_patch/J)^{1/d} blended by α."""
    d = F_n1.shape[-1]
    ratio = jnp.maximum(DJ_patch / jnp.maximum(J_n1, 1e-12), 1e-12)
    scale = ratio ** (1.0 / d)
    Fbar = scale[..., None, None] * F_n1
    return alpha_fbar[..., None, None] * Fbar + (1.0 - alpha_fbar)[..., None, None] * F_n1
