"""Compressible Newtonian fluid (Macdonald-type barotropic EOS).

Reference: /root/reference/nl-partsol/src/Constitutive/Fluid/Newtonian-Fluid.c:
  p(J) = J (p0 + (K/n)(J^{-n} − 1))
  τ = −p I + 2 J μ dev-ish(d),  d = sym(L),  L = Ḟ F⁻¹
  (stress at :64-78, zz channel at :76)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import tensor as tn


def spatial_velocity_gradient(dFdt: jax.Array, F: jax.Array) -> jax.Array:
    """L = Ḟ F⁻¹ (spatial_velocity_gradient__Particles__,
    compute-Strains.c:249)."""
    return tn.bmm(dFdt, tn.inv(F))


def newtonian_fluid(F, dFdt, *, p0, mu, n, K):
    d = F.shape[-1]
    J = tn.det(F)
    pressure = J * (p0 + (K / n) * (J ** (-n) - 1.0))
    c0 = J * mu
    L = spatial_velocity_gradient(dFdt, F)
    E = tn.sym(L)
    trE = tn.trace(E)  # plane strain: L_zz = 0
    eye = jnp.eye(d, dtype=F.dtype)
    tau = (
        -pressure[..., None, None] * eye
        + 2.0 * c0[..., None, None] * E
        - (2.0 / 3.0) * (c0 * trE)[..., None, None] * eye
    )
    tau_zz = -pressure - (2.0 / 3.0) * c0 * trE
    W = jnp.zeros_like(J)
    return tau, tau_zz, W
