"""uGIMP (uniform Generalized Interpolation MPM) shape functions.

Reference: /root/reference/nl-partsol/src/Nodes/GIMP.c — per-particle voxel
half-width l_p = ½ V₀^{1/d} (voxel__GIMP__, :108), 1D hat-with-plateau
kernels Sip/dSip (:235-275), tensor-product N and ∇N (:277-330).  The
reference never implemented a GIMP local search (Shape-Functions.c:71 exits);
here the arithmetic structured-grid window covers the support |Δx| < h + l_p
(half-width 2 cells for l_p ≤ h), so uGIMP gets the same fused windowed
evaluation as LME/FEM.

Note: the reference's dN__GIMP__ (:299-330) mixes node and dimension indices
in its tensor product (``if (i == j)`` with i a node index); the correct
∂_j S = dS_j · Π_{k≠j} S_k is implemented here.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..types import Grid
from .window import window_nodes, window_offsets


def offsets_for(dim: int):
    return window_offsets(dim, -2, 2)  # support radius < 2h for l_p ≤ h


def voxel_halfwidth(vol0: jax.Array, dim: int) -> jax.Array:
    """l_p = ½ V₀^{1/d} per axis (voxel__GIMP__, GIMP.c:108-124)."""
    return 0.5 * vol0 ** (1.0 / dim)


def _sip(L, lp, dx):
    """1D uGIMP kernel (Sip__GIMP__, GIMP.c:235-255), branch-free."""
    a = jnp.abs(dx)
    # |dx| <= lp            : 1 − (dx² + lp²)/(2 L lp)
    # lp < |dx| <= L − lp   : 1 − |dx|/L
    # L−lp < |dx| <= L + lp : (L + lp − |dx|)² / (4 L lp)
    r1 = 1.0 - 0.5 * (dx * dx + lp * lp) / (L * lp)
    r2 = 1.0 - a / L
    r3 = 0.25 * (L + lp - a) ** 2 / (L * lp)
    out = jnp.where(a <= lp, r1, jnp.where(a <= L - lp, r2, r3))
    return jnp.where(a < L + lp, out, 0.0)


def _dsip(L, lp, dx):
    """1D uGIMP kernel derivative (dSip__GIMP__, GIMP.c:257-275)."""
    a = jnp.abs(dx)
    s = jnp.sign(dx)
    r1 = -dx / (L * lp)
    r2 = -s / L
    r3 = -s * 0.5 * (L + lp - a) / (L * lp)
    out = jnp.where(a <= lp, r1, jnp.where(a <= L - lp, r2, r3))
    return jnp.where(a < L + lp, out, 0.0)


def evaluate(grid: Grid, x: jax.Array, lp: jax.Array):
    """uGIMP N, ∇N on the structured grid.

    Args:
      x: (Np, d) particle positions.
      lp: (Np,) voxel half-width per particle (isotropic).
    Returns the same dict contract as lme.evaluate (no λ state).
    """
    offs = offsets_for(grid.dim)
    node_ids, rel, mask = window_nodes(grid, x, offs)
    h = grid.spacing
    if not isinstance(lp, jax.core.Tracer):  # eager setup-time guard
        lp_max = float(jnp.max(lp))
        if lp_max > h:
            raise ValueError(
                f"uGIMP voxel half-width l_p={lp_max:.3g} > h={h:.3g}: the "
                f"2-cell window (offsets_for) would truncate the support"
            )
    lpk = lp[:, None, None]  # (Np,1,1)
    s1d = _sip(h, lpk, rel)  # (Np, K, d)
    d1d = _dsip(h, lpk, rel)
    N = jnp.prod(s1d, axis=-1)
    # ∂_j S = dS_j Π_{k≠j} S_k
    prod_except = jnp.where(s1d != 0.0, N[..., None] / jnp.where(s1d == 0.0, 1.0, s1d), 0.0)
    # when S_j == 0 but other factors nonzero, recompute directly
    d = grid.dim
    cols = []
    for j in range(d):
        others = jnp.prod(
            jnp.stack([s1d[..., k] for k in range(d) if k != j], axis=-1), axis=-1
        )
        cols.append(d1d[..., j] * others)
    dN = jnp.stack(cols, axis=-1)
    N = jnp.where(mask, N, 0.0)
    dN = jnp.where(mask[..., None], dN, 0.0)
    del prod_except
    return dict(node_ids=node_ids, N=N, dN=dN, mask=mask & (N > 0.0), lam=None)
