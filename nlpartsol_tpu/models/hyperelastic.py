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
