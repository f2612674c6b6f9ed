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


def bingham_fluid(F, dFdt, *, p0, mu0, tau_y, m_pap, n, K):
    """Bingham plastic with Papanastasiou regularisation.

    Completes the reference's carried-but-unwired Bingham model
    (/root/reference/nl-partsol/src/Constitutive/Fluid/Bingham-Fluid.c —
    the stress assembly there is commented out; the commented 1PK form and
    the two live helpers define the model):

      p(J)  = p0 + (K/n)(J^{-n} − 1)       (Tait-Murnaghan, :80-87)
      μ(d)  = μ0 + (τ_y/γ̇)(1 − e^{−m γ̇}),  γ̇ = sqrt(2 d:d)   (:91-99)
      P     = −J p F^{-T} + 2 J μ d F^{-T} − (2/Ndim) J μ tr(d) F^{-T}
      ⇒ τ = P Fᵀ = J(−p I + 2 μ dev_N(d))   (commented body, :58-64)

    Note the reference deviator uses 2/Ndim (2D plane-strain deviator in
    the plane), unlike the Newtonian model's 2/3 — reproduced as written.
    τ_y rides the material table's kappa0 (reference kappa_0), m_pap is
    fluidity_param."""
    d = F.shape[-1]
    J = tn.det(F)
    pressure = p0 + (K / n) * (J ** (-n) - 1.0)
    L = spatial_velocity_gradient(dFdt, F)
    E = tn.sym(L)
    trE = tn.trace(E)
    # γ̇ includes the zz channel only through tr in 3D; plane strain d_zz=0
    gdot = jnp.sqrt(2.0 * jnp.sum(E * E, axis=(-2, -1)))
    gdot_s = jnp.maximum(gdot, 1e-12)
    mu = mu0 + (tau_y / gdot_s) * (1.0 - jnp.exp(-m_pap * gdot))
    c0 = J * mu
    eye = jnp.eye(d, dtype=F.dtype)
    tau = (
        -(J * pressure)[..., None, None] * eye
        + 2.0 * c0[..., None, None] * E
        - (2.0 / d) * (c0 * trE)[..., None, None] * eye
    )
    # plane strain zz: d_zz = 0 but the volumetric F^{-T} terms act on the
    # unit zz entry, so τ_zz = −Jp − (2/N)Jμ tr(d)
    tau_zz = -J * pressure - (2.0 / d) * c0 * trE
    W = jnp.zeros_like(J)
    return tau, tau_zz, W


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
