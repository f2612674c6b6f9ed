"""Finite-strain hyperelastic models — batched over particles.

Reference implementations (Kirchhoff-stress convention, plane-strain zz
channel carried separately):

* Neo-Hookean (Wriggers):  τ = λ/2 (J²−1) I + G (b − I)
  (/root/reference/nl-partsol/src/Constitutive/Hyperelastic/Neo-Hookean.c:38-86,
  energy at :18-34)
* Saint-Venant-Kirchhoff:  S = λ tr(E) I + 2 G E, τ = F S Fᵀ
  (Saint-Venant-Kirchhoff.c)
* Hencky: principal logarithmic strains of b, T_ppal = (λ 1⊗1 + 2G I) E_h
  (Hencky.c:40-95)
* Linear elastic (small strain, for the elastic bar oracle problems).

float32 design: every model works on the displacement gradient A = F − I via
the cancellation-free identities in ops.tensor (det(I+A)−1, b−I = A+Aᵀ+AAᵀ,
x−log1p(x)); computing b−I or ln J directly from F loses all significance at
small strain in f32 (the reference runs f64 and never faces this).

All functions take ``(F, mat)`` where F is (..., d, d) and the material
parameters are broadcastable leading-dim arrays; they return
``(tau, tau_zz, W)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import tensor as tn
from .materials import lame_parameters


def neo_hookean(F: jax.Array, E: jax.Array, nu: jax.Array):
    d = F.shape[-1]
    lam, G = lame_parameters(E, nu)
    A = F - jnp.eye(d, dtype=F.dtype)
    e = tn.det_minus_one(A)  # J − 1  (plane strain: F_zz = 1)
    J = 1.0 + e
    bmi = tn.bmi_from_disp_grad(A)  # b − I
    c0 = 0.5 * lam * e * (J + 1.0)  # λ/2 (J²−1), cancellation-free
    eye = jnp.eye(d, dtype=F.dtype)
    tau = c0[..., None, None] * eye + G[..., None, None] * bmi
    tau_zz = c0  # b_zz = 1 in plane strain
    # W = λ/4 (J²−1) − (λ/2+G) ln J + G/2 (I1−3), regrouped stably:
    #   λ/4 [(J²−1) − 2 lnJ] + G [ (|A|²/2 − (e − trA)) + (e − lnJ) ]
    slp = tn.sub_log1p(e)
    normA2 = jnp.sum(A * A, axis=(-2, -1))
    quad = 0.5 * normA2 - (e - tn.trace(A))  # = ½|A|² − I2(A) − I3(A)
    W = 0.25 * lam * (e * e + 2.0 * slp) + G * (quad + slp)
    return tau, tau_zz, W


def saint_venant_kirchhoff(F: jax.Array, E_mod: jax.Array, nu: jax.Array):
    d = F.shape[-1]
    lam, G = lame_parameters(E_mod, nu)
    A = F - jnp.eye(d, dtype=F.dtype)
    Egr = 0.5 * tn.cmi_from_disp_grad(A)  # ½(C − I), cancellation-free
    trE = tn.trace(Egr)  # E_zz = 0 in plane strain
    eye = jnp.eye(d, dtype=F.dtype)
    S = lam[..., None, None] * trE[..., None, None] * eye + 2.0 * G[..., None, None] * Egr
    tau = tn.bmm_t(tn.bmm(F, S), F)
    tau_zz = lam * trE  # S_zz = λ tr(E); F_zz = 1
    W = 0.5 * lam * trE * trE + G * jnp.sum(Egr * Egr, axis=(-2, -1))
    return tau, tau_zz, W


def hencky(F: jax.Array, E_mod: jax.Array, nu: jax.Array):
    d = F.shape[-1]
    lam, G = lame_parameters(E_mod, nu)
    A = F - jnp.eye(d, dtype=F.dtype)
    bmi = tn.bmi_from_disp_grad(A)
    wm1, V = tn.sym_eig(bmi)  # eigenvalues of b, minus 1, exactly
    Eh = 0.5 * jnp.log1p(jnp.maximum(wm1, -1.0 + 1e-12))
    trEh = jnp.sum(Eh, axis=-1)  # zz adds 0 in plane strain (b_zz = 1)
    T_ppal = lam[..., None] * trEh[..., None] + 2.0 * G[..., None] * Eh
    tau = tn.sym_from_eig(T_ppal, V)
    tau_zz = lam * trEh
    W = 0.5 * jnp.sum(T_ppal * Eh, axis=-1)
    return tau, tau_zz, W


def mooney_rivlin(F: jax.Array, E_mod: jax.Array, nu: jax.Array,
                  mu1: jax.Array, mu2: jax.Array):
    """Compressible Mooney-Rivlin.

    Completes the reference's stub (/root/reference/nl-partsol/src/
    Constitutive/Hyperelastic/Mooney-Rivlin.c:17-40 — the energy returns
    only its volumetric term and the stress body is commented out).  The
    energy the stub names (its commented lines) is

      μ₁/2 (I1_C − 3) − μ₂/2 (I2_C/I3_C − 3) + K/2 ln²J,
      K = E/(3(1−2ν)),  μ₁/μ₂ = mu_Ogden[0..1]

    As written that energy is NOT stress-free at F = I (τ(I) = (μ₁+μ₂)I);
    the standard compressible completion adds −(μ₁+μ₂) lnJ:

      W = μ₁/2 (I1 − 3) − μ₂/2 (I2/I3 − 3) + K/2 ln²J − (μ₁+μ₂) lnJ

    with the exact Kirchhoff stress τ = F·(2 ∂W/∂C)·Fᵀ:

      τ = μ₁ b − (μ₂/I3)(I1 b − b²) + (μ₂ I2/I3 + K lnJ − μ₁ − μ₂) I

    (the stub's commented P additionally drops the 1/I3 factors its own
    energy implies; we keep the energy-consistent form, verified by AD in
    the tests).  Small-strain moduli: shear μ₁+μ₂, bulk K + volumetric
    corrections.  Plane strain: b_zz = 1 enters the invariants; τ_zz
    carried separately."""
    d = F.shape[-1]
    K = E_mod / (3.0 * (1.0 - 2.0 * nu))
    A = F - jnp.eye(d, dtype=F.dtype)
    e = tn.det_minus_one(A)  # J − 1
    J = 1.0 + e
    lnJ = jnp.log1p(e)
    bmi = tn.bmi_from_disp_grad(A)
    eye = jnp.eye(d, dtype=F.dtype)
    b = bmi + eye
    trb = tn.trace(b)
    if d == 2:
        I1 = trb + 1.0
        detb2 = b[..., 0, 0] * b[..., 1, 1] - b[..., 0, 1] * b[..., 1, 0]
        I2 = detb2 + trb  # zz eigenvalue is 1
        I3 = detb2
    else:
        I1 = trb
        bb = tn.bmm(b, b)
        I2 = 0.5 * (I1 * I1 - tn.trace(bb))
        I3 = J * J
    bb = tn.bmm(b, b)
    I3s = jnp.maximum(I3, 1e-12)
    c_iso = mu2 / I3s
    c_vol = mu2 * I2 / I3s + K * lnJ - mu1 - mu2
    tau = (
        mu1[..., None, None] * b
        - c_iso[..., None, None] * (I1[..., None, None] * b - bb)
        + c_vol[..., None, None] * eye
    )
    # zz: b_zz = 1, (b²)_zz = 1
    tau_zz = mu1 - c_iso * (I1 - 1.0) + c_vol
    W = (
        0.5 * mu1 * (I1 - 3.0)
        - 0.5 * mu2 * (I2 / I3s - 3.0)
        + 0.5 * K * lnJ * lnJ
        - (mu1 + mu2) * lnJ
    )
    return tau, tau_zz, W


def linear_elastic(F: jax.Array, E_mod: jax.Array, nu: jax.Array):
    d = F.shape[-1]
    lam, G = lame_parameters(E_mod, nu)
    eye = jnp.eye(d, dtype=F.dtype)
    eps = tn.sym(F - eye)
    tre = tn.trace(eps)
    tau = lam[..., None, None] * tre[..., None, None] * eye + 2.0 * G[..., None, None] * eps
    tau_zz = lam * tre
    W = 0.5 * lam * tre * tre + G * jnp.sum(eps * eps, axis=(-2, -1))
    return tau, tau_zz, W
