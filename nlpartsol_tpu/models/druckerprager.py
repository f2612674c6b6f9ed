"""Drucker-Prager finite-strain plasticity (Sanavia backward-Euler) with
classical + apex return regions and Ortiz power hardening — batched.

Algorithm from /root/reference/nl-partsol/src/Constitutive/Plasticity/Drucker-Prager.c:
  plane-strain / 3D cone parameters α_F, α_Q, β from friction/dilatancy
  angles (:362-377); trial volumetric/deviatoric split with reference
  pressure (:713-738); yield Φ = J2 − 2G·dγ − 3α_F(p − 3Kα_Q dγ) − βκ
  (:891-901); pressure limit separating classical/apex regions (:868-885);
  apex return with dγ₁ = J2/2G and Newton on dγ₂ (:529-557);
  κ(ε) = κ₀(1 + ε/ε₀)^{1/m} Ortiz hardening (:836-850);
  ε update with √(3α_Q²+1) (:820-830);  consistent tangents (:1080-1199).

Branch selection (elastic/classical/apex) is fully masked; both plastic
Newton loops run as fixed-bound masked iterations and the relevant solution
is selected per particle.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import config
from .materials import bulk_shear
from .spectral import hencky_from_wm1, rebuild, trial_bemi, wm1_from_hencky


class DruckerPragerOut(NamedTuple):
    tau: jax.Array
    tau_zz: jax.Array
    bemi: jax.Array
    bemi_zz: jax.Array
    eps: jax.Array
    kappa: jax.Array
    W: jax.Array
    failed: jax.Array
    C_ep: jax.Array  # (..., 3, 3) principal elastoplastic moduli


def cone_parameters(friction_angle_deg, dilatancy_angle_deg, dim: int):
    """(α_F, α_Q, β): plane-strain fit for d=2, triaxial-compression fit for
    d=3 (Drucker-Prager.c:362-377)."""
    rf = jnp.deg2rad(friction_angle_deg)
    rq = jnp.deg2rad(dilatancy_angle_deg)
    s23 = math.sqrt(2.0 / 3.0)
    if dim == 2:
        tf, tq = jnp.tan(rf), jnp.tan(rq)
        alpha_F = s23 * tf / jnp.sqrt(3.0 + 4.0 * tf * tf)
        alpha_Q = s23 * tq / jnp.sqrt(3.0 + 4.0 * tq * tq)
        beta = s23 * 3.0 / jnp.sqrt(3.0 + 4.0 * tf * tf)
    else:
        sf, sq = jnp.sin(rf), jnp.sin(rq)
        alpha_F = s23 * 2.0 * sf / (3.0 - sf)
        alpha_Q = s23 * 2.0 * sq / (3.0 - sq)
        beta = s23 * 6.0 * jnp.cos(rf) / (3.0 - sf)
    return alpha_F, alpha_Q, beta


def _kappa_fn(kappa0, exp_m, eps, eps0):
    base = jnp.maximum(1.0 + eps / eps0, 1e-12)
    return kappa0 * base ** (1.0 / exp_m)


def _d_kappa_fn(kappa0, exp_m, eps, eps0):
    base = jnp.maximum(1.0 + eps / eps0, 1e-12)
    return (kappa0 / (exp_m * eps0)) * base ** (1.0 / exp_m - 1.0)


def drucker_prager(
    bemi,
    bemi_zz,
    DF,
    eps,
    kappa,
    *,
    E,
    nu,
    kappa0,
    friction_angle,
    dilatancy_angle,
    exponent_ortiz,
    plastic_strain_0,
    cohesion,
    J2_degradated,
    p_ref=0.0,
    n_iter: int = 15,
    tol: float = 1e-10,
    ref_vol_compat: bool = False,
) -> DruckerPragerOut:
    del cohesion  # carried by kappa0 in the reference's parameterisation
    d = bemi.shape[-1]
    K, G = bulk_shear(E, nu)
    alpha_F, alpha_Q, beta = cone_parameters(friction_angle, dilatancy_angle, d)
    ads = jnp.sqrt(1.0 + 3.0 * alpha_Q * alpha_Q)

    wm1, V = trial_bemi(bemi, bemi_zz, DF)
    Eh_tr = hencky_from_wm1(wm1)

    trEh = jnp.sum(Eh_tr, axis=-1)
    # Reference stores the *negative* volumetric stress in T_tr_vol
    # (:726-729) and flips sign at reconstruction; we keep the physical sign.
    # NOTE: the reference uses K·tr(E)/3 (Drucker-Prager.c:726), a bulk
    # response 3× too soft (same bug as Von-Mises.c:499); we use K·tr(E).
    # The plastic corrector uses the full K (3K·α_Q·dγ, :1416) in BOTH, so
    # ``ref_vol_compat=True`` scales only the trial term — the golden tests
    # (tests/test_reference_golden.py) verify this is the only deviation.
    K_vol = K / 3.0 if ref_vol_compat else K
    T_vol = (p_ref + K_vol * trEh)[..., None] * jnp.ones_like(Eh_tr)
    T_dev = 2.0 * G[..., None] * (Eh_tr - (trEh / 3.0)[..., None])
    # reference "pressure" = −mean stress
    pressure = -(p_ref + K_vol * trEh)
    J2 = jnp.sqrt(jnp.sum(T_dev * T_dev, axis=-1))

    kappa_n = kappa

    def yield_classical(dg, kap):
        return (
            J2
            - 2.0 * G * dg
            - 3.0 * alpha_F * (pressure - 3.0 * K * alpha_Q * dg)
            - beta * kap
        )

    PHI_0 = yield_classical(0.0, kappa_n)
    plastic = PHI_0 > config.TOL_NR
    PHI0_safe = jnp.where(PHI_0 == 0.0, 1.0, PHI_0)

    J2_safe = jnp.where(J2 > config.TOL_NR, J2, 1.0)
    n_dir = jnp.where(
        (J2 > config.TOL_NR)[..., None], T_dev / J2_safe[..., None], 0.0
    )

    d_kappa_n = _d_kappa_fn(kappa0, exponent_ortiz, eps, plastic_strain_0)
    p_limit = (
        3.0 * alpha_Q * K / (2.0 * G) * J2
        + beta
        / (3.0 * jnp.where(alpha_F == 0.0, 1.0, alpha_F))
        * ((J2 / (2.0 * G)) * d_kappa_n * ads + kappa_n)
    )
    apex = plastic & (-pressure >= p_limit)
    classical = plastic & ~apex

    # ---- classical radial return (masked Newton, :462-489) ----
    def body_c(_, carry):
        dg, eps_k, kap_k, dkap_k, PHI = carry
        live = classical & (jnp.abs(PHI / PHI0_safe) >= tol)
        d_PHI = 9.0 * K * alpha_F * alpha_Q - 2.0 * G - beta * dkap_k * ads
        dg_n = dg - PHI / d_PHI
        eps_n1 = eps + dg_n * ads
        kap_n1 = _kappa_fn(kappa0, exponent_ortiz, eps_n1, plastic_strain_0)
        dkap_n1 = _d_kappa_fn(kappa0, exponent_ortiz, eps_n1, plastic_strain_0)
        PHI_n1 = yield_classical(dg_n, kap_n1)
        sel = lambda a, b: jnp.where(live, a, b)
        return (sel(dg_n, dg), sel(eps_n1, eps_k), sel(kap_n1, kap_k), sel(dkap_n1, dkap_k), sel(PHI_n1, PHI))

    z = jnp.zeros_like(J2)
    dg_c, eps_c, kap_c, dkap_c, _ = jax.lax.fori_loop(
        0, n_iter, body_c, (z, eps, kappa_n, d_kappa_n, PHI_0)
    )

    # ---- apex return (masked Newton on dγ₂, :529-585) ----
    dg1 = J2 / (2.0 * G)

    def yield_apex(dg_k, kap_k, dkap_k):
        rad = jnp.sqrt(dg1 * dg1 + 3.0 * alpha_Q * alpha_Q * dg_k * dg_k)
        return (
            beta / (3.0 * jnp.where(alpha_F == 0.0, 1.0, alpha_F)) * (kap_k + dkap_k * rad)
            - pressure
            + 3.0 * K * alpha_Q * dg_k
        )

    PHI_a0 = yield_apex(dg1, kappa_n, d_kappa_n)

    def body_a(_, carry):
        dg2, dead, PHI = carry
        dg_k = dg1 + dg2
        live = apex & ~dead & (jnp.abs(PHI / PHI0_safe) >= tol)
        rad = jnp.sqrt(dg1 * dg1 + 3.0 * alpha_Q * alpha_Q * dg_k * dg_k)
        d_PHI = 3.0 * alpha_Q * K + 3.0 * d_kappa_n * beta * alpha_Q**2 * dg_k / (
            3.0 * jnp.where(alpha_F == 0.0, 1.0, alpha_F) * jnp.where(rad == 0.0, 1.0, rad)
        )
        dg2_n = dg2 - PHI / jnp.where(jnp.abs(d_PHI) < tol, 1.0, d_PHI)
        # negative dγ₂ ⇒ collapse to zero and stop (reference :561-566)
        went_neg = dg2_n < 0.0
        dg2_n = jnp.where(went_neg, 0.0, dg2_n)
        PHI_n1 = yield_apex(dg1 + dg2_n, kappa_n, d_kappa_n)
        return (
            jnp.where(live, dg2_n, dg2),
            dead | (live & went_neg) | (live & (jnp.abs(d_PHI) < tol)),
            jnp.where(live, PHI_n1, PHI),
        )

    dg2_a, went_neg_a, _ = jax.lax.fori_loop(
        0, n_iter, body_a, (z, jnp.zeros_like(plastic), PHI_a0)
    )
    # reference: if dγ₂ went negative, dγ_k = 0 entirely
    dg_a = jnp.where(went_neg_a & (dg2_a == 0.0), 0.0, dg1 + dg2_a)
    eps_a = eps + dg_a * ads
    kap_a = _kappa_fn(kappa0, exponent_ortiz, eps_a, plastic_strain_0)

    # ---- select branch, build stress & plastic strain increment ----
    T_el = T_vol + T_dev
    T_cl = T_vol + T_dev + (dg_c * 3.0 * K * alpha_Q)[..., None] - (
        2.0 * G * dg_c
    )[..., None] * n_dir
    T_ap = T_vol + (dg_a * 3.0 * K * alpha_Q)[..., None] * jnp.ones_like(T_vol)

    T_ppal = jnp.where(classical[..., None], T_cl, jnp.where(apex[..., None], T_ap, T_el))
    dE_p = jnp.where(
        classical[..., None],
        dg_c[..., None] * (alpha_Q[..., None] + n_dir),
        jnp.where(
            apex[..., None],
            (dg_a * alpha_Q)[..., None] + dg1[..., None] * n_dir,
            0.0,
        ),
    )
    eps_out = jnp.where(classical, eps_c, jnp.where(apex, eps_a, eps))
    kappa_out = jnp.where(classical, kap_c, jnp.where(apex, kap_a, kappa_n))

    Eh_corr = Eh_tr - dE_p
    bemi_new, bemi_zz_new = rebuild(wm1_from_hencky(Eh_corr), V)
    tau, tau_zz = rebuild(T_ppal, V)
    W = 0.5 * jnp.sum(T_ppal * Eh_corr, axis=-1)

    # ---- consistent tangent (:1080-1199; elastic uses the exact Hencky
    # moduli K·1⊗1 + 2G(I−1/3·1⊗1) — the reference's elastic branch has a
    # stray 1/3 on the K term which we do not reproduce) ----
    ones3 = jnp.ones(T_ppal.shape[:-1] + (3,), T_ppal.dtype)
    eye3 = jnp.eye(3, dtype=T_ppal.dtype)
    oo = ones3[..., :, None] * ones3[..., None, :]
    nn = n_dir[..., :, None] * n_dir[..., None, :]
    on = ones3[..., :, None] * n_dir[..., None, :]
    no = n_dir[..., :, None] * ones3[..., None, :]

    C_el = K[..., None, None] * oo + (2.0 * G)[..., None, None] * (eye3 - oo / 3.0)

    c0 = 9.0 * alpha_F * alpha_Q * K + 2.0 * G + beta * dkap_c * jnp.sqrt(
        (2.0 / 3.0) * (1.0 + 3.0 * alpha_Q**2)
    )
    c1 = 1.0 - 9.0 * alpha_F * alpha_Q * K / c0
    c2 = jnp.where(J2 > config.TOL_NR, dg_c / J2_safe, 0.0)
    C_cl = (
        (c1 * K)[..., None, None] * oo
        + (2.0 * G)[..., None, None] * (eye3 - ((1.0 - 2.0 * G * c2) / 3.0)[..., None, None] * oo)
        - (6.0 * alpha_Q * K * G / c0)[..., None, None] * (on + no)
        - (4.0 * G * G * (1.0 / c0 - c2))[..., None, None] * nn
    )

    rad_a = jnp.sqrt(dg1 * dg1 + 3.0 * alpha_Q**2 * dg_a * dg_a)
    denom_a = (
        3.0 * alpha_F * K * jnp.where(rad_a == 0.0, 1.0, rad_a)
        + alpha_Q * beta * math.sqrt(2.0 / 3.0) * d_kappa_n * dg_a
    )
    c0_a = jnp.where(
        dg_a > 0.0,
        (alpha_Q * beta * math.sqrt(2.0 / 3.0) * d_kappa_n * dg_a)
        / jnp.where(denom_a == 0.0, 1.0, denom_a),
        0.0,
    )
    c1_a = jnp.where(
        dg_a > 0.0, c0_a * K / (2.0 * alpha_Q * G * jnp.where(dg_a == 0.0, 1.0, dg_a)), 0.0
    )
    C_ap = (c0_a * K)[..., None, None] * oo + c1_a[..., None, None] * on

    C_ep = jnp.where(
        classical[..., None, None], C_cl, jnp.where(apex[..., None, None], C_ap, C_el)
    )

    # Failure flag: fully degraded strength (used by the damage drivers)
    failed = plastic & (kappa_out <= J2_degradated)

    return DruckerPragerOut(tau, tau_zz, bemi_new, bemi_zz_new, eps_out, kappa_out, W, failed, C_ep)
