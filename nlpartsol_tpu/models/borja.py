"""Borja (2003) frictional family: Matsuoka-Nakai / Lade-Duncan yield with a
monolithic 5x5 Newton return mapping in principal stress space — batched.

Reference: /root/reference/nl-partsol/src/Constitutive/Plasticity/
Matsuoka-Nakai.c and Lade-Duncan.c (same skeleton; development harnesses in
scripts/Borja-Constitutive-Models/Frictional-Monolithic*.c):

  trial principal Kirchhoff stress T_tr = AA·E_h^tr − c·cotφ  (:828-838)
  yield  MN: F = ∛((9+κ_φ)·I3) − ∛(I1·I2)                     (MN :961-967)
         LD: F = ∛((27+κ_φ)·I3) − I1                           (LD __F)
  hardening κ_φ = a0·Λ·exp(a1·I1)·exp(−a2·Λ), κ_ψ = α·κ_φ     (:933-940)
  unknowns z = (T₁,T₂,T₃, κ_φ, Δλ); residual
    R = [CC·(T+c·cotφ) − E_h^tr + Δλ·∂G/∂T ;  κ_φ − κ̂(Λ,I1) ;  F]  (:1057-1084)
  5x5 Newton with line search (:455-645); apex collapse when
  |tr(T)/3| < 0.1 (:545-556); b_e corrector from E_h(T) (:751).

Batched design: masked fixed-bound Newton; the reference's quadratic
line-search loop is replaced by a fixed backtracking candidate set; the
reference's residual-on-the-diagonal "preconditioner" (:520-525) is not
reproduced (plain Newton solves the same fixed point).  Divisions by
principal stresses are magnitude-clamped instead of relying on the apex
catch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import config
from .materials import lame_parameters
from .spectral import hencky_from_wm1, rebuild, trial_bemi, wm1_from_hencky

TOL_APEX = 0.1


class BorjaOut(NamedTuple):
    tau: jax.Array
    tau_zz: jax.Array
    bemi: jax.Array
    bemi_zz: jax.Array
    eps: jax.Array  # Λ (total plastic multiplier)
    kappa: jax.Array  # κ_φ
    W: jax.Array
    C_ep: jax.Array  # (..., 3, 3) principal tangent


def _safe(x, eps=1e-8):
    return jnp.where(jnp.abs(x) < eps, jnp.where(x < 0, -eps, eps), x)


def _invariants(T):
    I1 = jnp.sum(T, axis=-1)
    I2 = T[..., 0] * T[..., 1] + T[..., 1] * T[..., 2] + T[..., 0] * T[..., 2]
    I3 = T[..., 0] * T[..., 1] * T[..., 2]
    return I1, I2, I3


def _kappa_hat(a1_, a2_, a3_, Lam, I1):
    """κ̂_φ = a0·Λ·e^{a1·I1}·e^{−a2·Λ} (reference a[0..2]; :933-940)."""
    return a1_ * Lam * jnp.exp(a2_ * I1) * jnp.exp(-a3_ * Lam)


def _d_kappa_d_I1(a1_, a2_, a3_, Lam, I1):
    return a1_ * a2_ * Lam * jnp.exp(a2_ * I1) * jnp.exp(-a3_ * Lam)


def _d_kappa_d_lambda(a1_, a2_, a3_, Lam, I1):
    return (1.0 - a3_ * Lam) * a1_ * jnp.exp(a2_ * I1) * jnp.exp(-a3_ * Lam)


def _yield_fns(kind: str, pa=0.0, m=0.0):
    """Returns (F, dF_dT, dF_dkappa, dG_dT, ddG_ddT, ddG_dT_dkpsi).

    ``pa``/``m`` (atmospheric pressure / pressure-sensitivity exponent) are
    only used by the modified-lade-duncan branch: K = c0 + κ·(pa/I1)^m
    (Modified-Lade-Duncan.c:1063-1197; the general form is the reference's
    own Borja harness eval_K1/eval_b1,
    scripts/Borja-Constitutive-Models/Frictional-Monolithic.c:659-717)."""
    cbrt = jnp.cbrt

    if kind == "matsuoka-nakai":

        def F(T, kap):
            I1, I2, I3 = _invariants(T)
            return cbrt((9.0 + kap) * I3) - cbrt(I1 * I2)

        def grad_f(T):
            I1, I2, I3 = _invariants(T)
            denom = 3.0 * cbrt(_safe(I1 * I2)) ** 2
            return (I1[..., None] * (I1[..., None] - T) + I2[..., None]) / _safe(denom)[..., None]

        def dF_dT(T, kap):
            I1, I2, I3 = _invariants(T)
            K1 = 9.0 + kap
            return cbrt(K1 * I3)[..., None] / (3.0 * _safe(T)) - grad_f(T)

        def dF_dkappa(T, kap):
            _, _, I3 = _invariants(T)
            K1 = 9.0 + kap
            return (1.0 / 3.0) * cbrt(_safe(K1)) ** (-2.0) * cbrt(I3)

        def dG_dT(T, kpsi):
            I1, I2, I3 = _invariants(T)
            K2 = 9.0 + kpsi
            return cbrt(K2 * I3)[..., None] / (3.0 * _safe(T)) - grad_f(T)

        def ddG_ddT(T, kpsi):
            I1, I2, I3 = _invariants(T)
            K2 = 9.0 + kpsi
            dg = grad_f(T)
            i1i2 = _safe(I1 * I2)
            # dd_g: ∂²∛(I1·I2)
            TA = T[..., :, None]
            TB = T[..., None, :]
            eye = jnp.eye(3, dtype=T.dtype)
            dd_g = (
                (cbrt(i1i2) ** (-2.0) / 3.0)[..., None, None]
                * (3.0 * I1[..., None, None] - TA - TB - I1[..., None, None] * eye)
                - (2.0 / cbrt(i1i2))[..., None, None] * dg[..., :, None] * dg[..., None, :]
            )
            Ts = _safe(T)
            dd_main = (1.0 / 3.0) * cbrt(K2 * I3)[..., None, None] * (
                1.0 / (3.0 * Ts[..., :, None] * Ts[..., None, :])
                - eye / (Ts[..., :, None] ** 2)
            )
            return dd_main - dd_g

        def ddG_dT_dkpsi(T, kpsi):
            _, _, I3 = _invariants(T)
            K2 = 9.0 + kpsi
            return (cbrt(I3)[..., None] / (3.0 * _safe(T))) / (
                3.0 * cbrt(_safe(K2))[..., None] ** 2
            )

    elif kind == "lade-duncan":

        def F(T, kap):
            I1, _, I3 = _invariants(T)
            return cbrt((27.0 + kap) * I3) - I1

        def dF_dT(T, kap):
            _, _, I3 = _invariants(T)
            K1 = 27.0 + kap
            return cbrt(K1 * I3)[..., None] / (3.0 * _safe(T)) - 1.0

        def dF_dkappa(T, kap):
            _, _, I3 = _invariants(T)
            K1 = 27.0 + kap
            return (1.0 / 3.0) * cbrt(_safe(K1)) ** (-2.0) * cbrt(I3)

        def dG_dT(T, kpsi):
            _, _, I3 = _invariants(T)
            K2 = 27.0 + kpsi
            return cbrt(K2 * I3)[..., None] / (3.0 * _safe(T)) - 1.0

        def ddG_ddT(T, kpsi):
            _, _, I3 = _invariants(T)
            K2 = 27.0 + kpsi
            Ts = _safe(T)
            eye = jnp.eye(3, dtype=T.dtype)
            return (1.0 / 3.0) * cbrt(K2 * I3)[..., None, None] * (
                1.0 / (3.0 * Ts[..., :, None] * Ts[..., None, :])
                - eye / (Ts[..., :, None] ** 2)
            )

        def ddG_dT_dkpsi(T, kpsi):
            _, _, I3 = _invariants(T)
            K2 = 27.0 + kpsi
            return (cbrt(I3)[..., None] / (3.0 * _safe(T))) / (
                3.0 * cbrt(_safe(K2))[..., None] ** 2
            )

    elif kind == "modified-lade-duncan":
        # K = 27 + κ·(pa/I1)^m; pressure-sensitive Lade-Duncan cone.
        # b = m·κ·(pa/I1)^m·(∛I3/I1) is the I1-derivative correction.

        def pw(I1):
            # (pa/I1)^m — both pa and I1 are negative in compression, so
            # the ratio is positive; floor it against stray tensile states
            return jnp.power(jnp.maximum(pa / _safe(I1), 1e-12), m)

        def F(T, kap):
            I1, _, I3 = _invariants(T)
            K1 = 27.0 + kap * pw(I1)
            return cbrt(K1 * I3) - I1

        def dF_dT(T, kap):
            I1, _, I3 = _invariants(T)
            K1 = 27.0 + kap * pw(I1)
            b1 = m * kap * pw(I1) * cbrt(I3) / _safe(I1)
            return (
                cbrt(K1 * I3)[..., None] / (3.0 * _safe(T))
                - (b1 / (3.0 * cbrt(_safe(K1)) ** 2))[..., None]
                - 1.0
            )

        def dF_dkappa(T, kap):
            I1, _, I3 = _invariants(T)
            K1 = 27.0 + kap * pw(I1)
            return cbrt(I3) / (3.0 * cbrt(_safe(K1)) ** 2) * pw(I1)

        def dG_dT(T, kpsi):
            I1, _, I3 = _invariants(T)
            K2 = 27.0 + kpsi * pw(I1)
            b2 = m * kpsi * pw(I1) * cbrt(I3) / _safe(I1)
            return (
                cbrt(K2 * I3)[..., None] / (3.0 * _safe(T))
                - (b2 / (3.0 * cbrt(_safe(K2)) ** 2))[..., None]
                - 1.0
            )

        def ddG_ddT(T, kpsi):
            I1, _, I3 = _invariants(T)
            K2 = 27.0 + kpsi * pw(I1)
            b2 = m * kpsi * pw(I1) * cbrt(I3) / _safe(I1)
            dK2 = -(m * kpsi / _safe(I1)) * pw(I1)  # same for every comp.
            Ts = _safe(T)
            db2_B = (b2 / _safe(I1))[..., None] * (
                I1[..., None] / (3.0 * Ts) - m - 1.0
            )
            eye = jnp.eye(3, dtype=T.dtype)
            K2s = _safe(K2)
            main = (1.0 / 3.0) * cbrt(K2 * I3)[..., None, None] * (
                1.0 / (3.0 * Ts[..., :, None] * Ts[..., None, :])
                - eye / (Ts[..., :, None] ** 2)
            )
            second = (
                (cbrt(I3)[..., None] / Ts + (2.0 * b2 / K2s)[..., None])[..., :, None]
                * dK2[..., None, None]
                / (9.0 * cbrt(K2s)[..., None, None] ** 2)
            )
            third = db2_B[..., None, :] / (3.0 * cbrt(K2s)[..., None, None] ** 2)
            return main + second - third

        def ddG_dT_dkpsi(T, kpsi):
            I1, _, I3 = _invariants(T)
            K2 = 27.0 + kpsi * pw(I1)
            b2 = m * kpsi * pw(I1) * cbrt(I3) / _safe(I1)
            K2s = _safe(K2)
            return (
                pw(I1)[..., None]
                * (
                    cbrt(I3)[..., None] / (3.0 * _safe(T))
                    + (2.0 * b2 / (3.0 * K2s))[..., None]
                    - (m * cbrt(I3) / _safe(I1))[..., None]
                )
                / (3.0 * cbrt(K2s)[..., None] ** 2)
            )

    else:
        raise ValueError(f"unknown Borja yield kind: {kind}")

    return F, dF_dT, dF_dkappa, dG_dT, ddG_ddT, ddG_dT_dkpsi


def borja_frictional(
    bemi,
    bemi_zz,
    DF,
    eps,
    kappa,
    *,
    yield_kind: str,
    E,
    nu,
    m,
    c0,
    phi,
    psi,
    a1,
    a2,
    a3,
    alpha,
    cohesion=0.0,
    pa=0.0,
    n_iter: int = 30,
    tol: float = 1e-10,
) -> BorjaOut:
    """Batched Borja stress update.  ``eps`` carries Λ; ``kappa`` carries κ_φ."""
    del c0, psi  # reference MN/LD/MLD paths hard-code the c0 constants
    F, dF_dT, dF_dkappa, dG_dT, ddG_ddT, ddG_dT_dkpsi = _yield_fns(
        yield_kind, pa=pa, m=m
    )

    lam_e, G_e = lame_parameters(E, nu)
    rad_phi = jnp.deg2rad(phi)
    c_cotphi = jnp.where(rad_phi > 0.0, cohesion / jnp.tan(_safe(rad_phi)), 0.0)

    # elastic stiffness AA / compliance CC in principal space (3x3)
    ones = jnp.ones(jnp.shape(E) + (3, 3)) if jnp.ndim(E) else jnp.ones((3, 3))
    eye3 = jnp.eye(3)
    AA = lam_e[..., None, None] * jnp.ones_like(eye3) + 2.0 * G_e[..., None, None] * eye3
    CC = (1.0 / E)[..., None, None] * eye3 + (-nu / E)[..., None, None] * (
        jnp.ones_like(eye3) - eye3
    )
    del ones

    wm1, V = trial_bemi(bemi, bemi_zz, DF)
    Eh_tr = hencky_from_wm1(wm1)  # (..., 3)

    T_tr = jnp.einsum("...ij,...j->...i", AA, Eh_tr) - c_cotphi[..., None]

    Lam_n = eps
    kap_n = kappa
    F0 = F(T_tr, kap_n)
    plastic = F0 > config.TOL_NR
    F0_safe = jnp.where(F0 == 0.0, 1.0, F0)

    def residual(T, kap, dlam, Lam):
        I1, _, _ = _invariants(T)
        Eh_k = jnp.einsum("...ij,...j->...i", CC, T + c_cotphi[..., None])
        kap_hat = _kappa_hat(a1, a2, a3, Lam, I1)
        r_strain = Eh_k - Eh_tr + dlam[..., None] * dG_dT(T, alpha * kap)
        r_kap = kap - kap_hat
        r_F = F(T, kap)
        R = jnp.concatenate(
            [r_strain, r_kap[..., None], r_F[..., None]], axis=-1
        )  # (...,5)
        return R, jnp.linalg.norm(R, axis=-1)

    R0, nR0 = residual(T_tr, kap_n, jnp.zeros_like(F0), Lam_n)
    nR0_safe = jnp.where(nR0 == 0.0, 1.0, nR0)

    def body(_, carry):
        T, kap, dlam, done, apexed = carry
        Lam = Lam_n + dlam
        R, nR = residual(T, kap, dlam, Lam)
        Fk = F(T, kap)
        converged = (jnp.abs(nR / nR0_safe) < tol) | (jnp.abs(Fk / F0_safe) < tol)
        live = plastic & ~done & ~converged & ~apexed

        I1, _, I3 = _invariants(T)
        kpsi = alpha * kap
        dk_dI1 = _d_kappa_d_I1(a1, a2, a3, Lam, I1)
        dk_dlam = _d_kappa_d_lambda(a1, a2, a3, Lam, I1)
        dFdT = dF_dT(T, kap)
        dFdk = dF_dkappa(T, kap)
        dGdT = dG_dT(T, kpsi)
        ddG = ddG_ddT(T, kpsi)
        ddGk = ddG_dT_dkpsi(T, kpsi)

        # assemble (...,5,5) tangent (reference :478-517)
        Tg = jnp.zeros(T.shape[:-1] + (5, 5), T.dtype)
        Tg = Tg.at[..., :3, :3].set(CC + dlam[..., None, None] * ddG)
        Tg = Tg.at[..., :3, 3].set(alpha[..., None] * dlam[..., None] * ddGk)
        Tg = Tg.at[..., :3, 4].set(dGdT)
        Tg = Tg.at[..., 3, :3].set(-dk_dI1[..., None] * jnp.ones_like(T))
        Tg = Tg.at[..., 3, 3].set(1.0)
        Tg = Tg.at[..., 3, 4].set(-dk_dlam)
        Tg = Tg.at[..., 4, :3].set(dFdT)
        Tg = Tg.at[..., 4, 3].set(dFdk)
        # regularise the (4,4) zero for solvability
        Tg = Tg.at[..., 4, 4].set(1e-14)

        dz = jnp.linalg.solve(Tg, R[..., None])[..., 0]  # (...,5)

        # fixed backtracking: evaluate candidate steps, take the best
        def cand(delta):
            T_c = T - delta * dz[..., :3]
            kap_c = kap - delta * dz[..., 3]
            dlam_c = dlam - delta * dz[..., 4]
            _, n_c = residual(T_c, kap_c, dlam_c, Lam_n + dlam_c)
            # forbid Λ < 0
            n_c = jnp.where(Lam_n + dlam_c < 0.0, jnp.inf, n_c)
            return T_c, kap_c, dlam_c, n_c

        deltas = (1.0, 0.5, 0.25, 0.0625)
        cands = [cand(dl) for dl in deltas]
        norms = jnp.stack([c[3] for c in cands], axis=-1)
        k = jnp.argmin(norms, axis=-1)
        Ts = jnp.stack([c[0] for c in cands], axis=0)  # (4, ..., 3)
        kaps = jnp.stack([c[1] for c in cands], axis=0)
        dlams = jnp.stack([c[2] for c in cands], axis=0)
        T_new = jnp.take_along_axis(
            jnp.moveaxis(Ts, 0, -1), k[..., None, None], axis=-1
        )[..., 0]
        kap_new = jnp.take_along_axis(jnp.moveaxis(kaps, 0, -1), k[..., None], axis=-1)[..., 0]
        dlam_new = jnp.take_along_axis(jnp.moveaxis(dlams, 0, -1), k[..., None], axis=-1)[..., 0]

        # Λ-negativity across all candidates ⇒ stop at current state
        all_neg = jnp.all(jnp.isinf(norms), axis=-1)

        # apex collapse (reference :545-556)
        hit_apex = jnp.abs(jnp.mean(T_new, axis=-1)) < TOL_APEX
        T_new = jnp.where(hit_apex[..., None], 0.0, T_new)
        kap_new = jnp.where(hit_apex, kap_n, kap_new)
        dlam_new = jnp.where(hit_apex, 0.0, dlam_new)

        sel = lambda a, b: jnp.where(live[..., None] if a.ndim > live.ndim else live, a, b)
        T = sel(T_new, T)
        kap = sel(kap_new, kap)
        dlam = sel(dlam_new, dlam)
        done = done | (live & all_neg) | converged
        apexed = apexed | (live & hit_apex)
        return (T, kap, dlam, done, apexed)

    z0 = (
        T_tr,
        kap_n,
        jnp.zeros_like(F0),
        jnp.zeros_like(plastic),
        jnp.zeros_like(plastic),
    )
    T_k, kap_k, dlam_k, done, apexed = jax.lax.fori_loop(0, n_iter, body, z0)

    T_fin = jnp.where(plastic[..., None], T_k, T_tr)
    kap_fin = jnp.where(plastic, kap_k, kap_n)
    Lam_fin = jnp.where(plastic & ~apexed, Lam_n + dlam_k, Lam_n)

    # outputs: nominal stress adds back c·cotφ (:853-880, :1110+)
    T_out = T_fin + c_cotphi[..., None]
    Eh_k = jnp.einsum("...ij,...j->...i", CC, T_out)
    bemi_new, bemi_zz_new = rebuild(wm1_from_hencky(Eh_k), V)
    tau, tau_zz = rebuild(T_out, V)
    W = 0.5 * jnp.sum(T_out * Eh_tr, axis=-1)

    dlam_eff = jnp.where(plastic & ~apexed, dlam_k, 0.0)
    ddG_fin = ddG_ddT(_safe(T_fin), alpha * kap_fin)
    C_ep_pl = jnp.linalg.inv(CC + dlam_eff[..., None, None] * ddG_fin)
    C_ep = jnp.where(plastic[..., None, None], C_ep_pl, AA)

    return BorjaOut(tau, tau_zz, bemi_new, bemi_zz_new, Lam_fin, kap_fin, W, C_ep)
