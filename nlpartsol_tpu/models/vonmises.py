"""Von Mises (J2) finite-strain plasticity with Voce isotropic + linear
kinematic hardening — batched, branch-free radial return.

Algorithm from /root/reference/nl-partsol/src/Constitutive/Plasticity/Von-Mises.c:
  trial b_e spectrum → principal Hencky strains (:212-330)
  κ_iso(ε) = σy + θHε + (K∞−K0)(1−e^{−δε}),  κ_kin(ε) = (1−θ)Hε   (:583-598)
  Φ = J2 − √(2/3)(κ_iso,k + κ_kin,k − κ_kin,n) − 2G·dγ            (:631-641)
  scalar Newton on dγ (:303-330), flow n = dev/|dev|,
  corrector b_e = Σ exp(2(E_h − dγ n)) v⊗v (:447-491),
  consistent tangent in principal space (:712-757).

Differences by design: the elastic/plastic branch and the Newton loop are
masked fixed-iteration (vmappable, no data-dependent control flow); the
eigenvector convention is columns-of-V throughout (the reference mixes row
and column indexing between its elastic and plastic reconstruction paths).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import config
from .materials import bulk_shear
from .spectral import hencky_from_wm1, rebuild, trial_bemi, wm1_from_hencky

SQ23 = 0.8164965809277260  # sqrt(2/3)


class VonMisesOut(NamedTuple):
    tau: jax.Array  # (..., d, d) Kirchhoff stress
    tau_zz: jax.Array
    bemi: jax.Array  # corrected elastic left Cauchy-Green − I
    bemi_zz: jax.Array
    eps: jax.Array  # equivalent plastic strain
    back_stress: jax.Array  # (..., 3) principal back stress
    W: jax.Array
    # Consistent tangent ingredients for the implicit path:
    C_ep: jax.Array  # (..., 3, 3) principal elastoplastic moduli


def _kappa(sigma_y, eps, H, theta, K0, Kinf, delta):
    k_iso = sigma_y + theta * H * eps + (Kinf - K0) * (1.0 - jnp.exp(-delta * eps))
    k_kin = (1.0 - theta) * H * eps
    return k_iso, k_kin


def _d_kappa(eps, H, theta, K0, Kinf, delta):
    d_iso = theta * H + delta * (Kinf - K0) * jnp.exp(-delta * eps)
    d_kin = (1.0 - theta) * H
    return d_iso, d_kin


def von_mises(
    bemi,
    bemi_zz,
    DF,
    eps,
    back_stress,
    *,
    E,
    nu,
    sigma_y,
    H,
    theta,
    K0,
    Kinf,
    delta,
    n_iter: int = 12,
    tol: float = 1e-10,
    ref_vol_compat: bool = False,
) -> VonMisesOut:
    """Batched stress update.  All material args broadcast over the batch."""
    K, G = bulk_shear(E, nu)

    wm1, V = trial_bemi(bemi, bemi_zz, DF)
    Eh_tr = hencky_from_wm1(wm1)  # (..., 3)

    trEh = jnp.sum(Eh_tr, axis=-1)
    # Volumetric stress σ_m = K·tr(E) per principal component.  NOTE: the
    # reference computes K·tr(E)/3 here (__trial_elastic, Von-Mises.c:499),
    # i.e. a bulk response 3× too soft — a bug we do not reproduce.
    # ``ref_vol_compat=True`` restores the reference's K/3 trial term so the
    # head-to-head golden tests (tests/test_reference_golden.py) can verify
    # that this is the ONLY difference between the two return mappings.
    K_vol = K / 3.0 if ref_vol_compat else K
    T_vol = (K_vol * trEh)[..., None] * jnp.ones_like(Eh_tr)
    T_dev = 2.0 * G[..., None] * (Eh_tr - (trEh / 3.0)[..., None]) - back_stress
    J2 = jnp.sqrt(jnp.sum(T_dev * T_dev, axis=-1))

    k_iso_n, k_kin_n = _kappa(sigma_y, eps, H, theta, K0, Kinf, delta)
    PHI_0 = J2 - SQ23 * k_iso_n
    plastic = PHI_0 > 0.0

    J2_safe = jnp.where(J2 > 0.0, J2, 1.0)
    n_dir = T_dev / J2_safe[..., None]

    # Masked scalar Newton on dγ (radial return)
    def body(_, carry):
        d_gamma, eps_k, PHI = carry
        live = plastic & (jnp.abs(PHI / jnp.where(PHI_0 == 0, 1.0, PHI_0)) >= tol)
        d_iso, d_kin = _d_kappa(eps_k, H, theta, K0, Kinf, delta)
        d_PHI = -2.0 * G * (1.0 + (d_iso + d_kin) / (3.0 * G))
        d_gamma_new = d_gamma - PHI / d_PHI
        eps_new = eps + SQ23 * d_gamma_new
        k_iso_k, k_kin_k = _kappa(sigma_y, eps_new, H, theta, K0, Kinf, delta)
        PHI_new = J2 - SQ23 * (k_iso_k + k_kin_k - k_kin_n) - 2.0 * G * d_gamma_new
        return (
            jnp.where(live, d_gamma_new, d_gamma),
            jnp.where(live, eps_new, eps_k),
            jnp.where(live, PHI_new, PHI),
        )

    d_gamma, eps_k, _ = jax.lax.fori_loop(
        0, n_iter, body, (jnp.zeros_like(J2), eps, PHI_0)
    )
    d_gamma = jnp.where(plastic, d_gamma, 0.0)
    eps_out = jnp.where(plastic, eps_k, eps)

    _, k_kin_k = _kappa(sigma_y, eps_out, H, theta, K0, Kinf, delta)
    d_K_kin = k_kin_k - k_kin_n

    # Stress in principal space (elastic: vol+dev(with −back); plastic:
    # re-add back and subtract the plastic corrector — Von-Mises.c:652-661)
    # NOTE: the reference's plastic branch uses −T_vol
    # (__update_internal_variables_plastic, Von-Mises.c — sign-inconsistent
    # with its own elastic branch, +T_tr_vol).  We use +T_vol in both;
    # ref_vol_compat reproduces the reference's sign so the golden tests can
    # pin the deviation (tests/test_reference_golden.py).
    T_vol_pl = -T_vol if ref_vol_compat else T_vol
    T_elastic = T_vol + T_dev
    T_plastic = T_vol_pl + T_dev + back_stress - (2.0 * G * d_gamma)[..., None] * n_dir
    T_ppal = jnp.where(plastic[..., None], T_plastic, T_elastic)

    back_out = jnp.where(
        plastic[..., None], back_stress + SQ23 * d_K_kin[..., None] * n_dir, back_stress
    )

    dE_p = jnp.where(plastic[..., None], d_gamma[..., None] * n_dir, 0.0)
    Eh_corr = Eh_tr - dE_p
    bemi_new, bemi_zz_new = rebuild(wm1_from_hencky(Eh_corr), V)

    tau, tau_zz = rebuild(T_ppal, V)
    W = 0.5 * jnp.sum(T_ppal * Eh_corr, axis=-1)

    # Consistent principal tangent (__tangent_moduli, Von-Mises.c:712-757)
    k_iso_k, _ = _kappa(sigma_y, eps_out, H, theta, K0, Kinf, delta)
    theta_f = jnp.where(
        plastic & (J2 > config.TOL_NR), 1.0 - 2.0 * G * d_gamma / J2_safe, 1.0
    )
    theta_bar = jnp.where(
        plastic,
        1.0 / (1.0 + (k_iso_k + k_kin_k) / (3.0 * G)) - (1.0 - theta_f),
        0.0,
    )
    ones3 = jnp.ones(T_ppal.shape[:-1] + (3,), T_ppal.dtype)
    eye3 = jnp.eye(3, dtype=T_ppal.dtype)
    oo = ones3[..., :, None] * ones3[..., None, :]
    C_ep = (
        K[..., None, None] * oo
        + (2.0 * G * theta_f)[..., None, None] * (eye3 - oo / 3.0)
        - (2.0 * G * theta_bar)[..., None, None]
        * n_dir[..., :, None]
        * n_dir[..., None, :]
    )

    return VonMisesOut(tau, tau_zz, bemi_new, bemi_zz_new, eps_out, back_out, W, C_ep)
