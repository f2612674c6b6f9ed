"""Constitutive model tests vs independent NumPy float64 oracles
(the reference's own verification pattern: tests/Constitutive/*.py drive the
C kernels against einsum references, SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nlpartsol_tpu.models import hyperelastic, materials as M
from nlpartsol_tpu.models.vonmises import von_mises
from nlpartsol_tpu.models.druckerprager import drucker_prager, cone_parameters
from nlpartsol_tpu.models.dispatch import stress_integration

E_, NU = 1e7, 0.3
LAM = E_ * NU / ((1 + NU) * (1 - 2 * NU))
G_ = E_ / (2 * (1 + NU))
K_ = E_ / (3 * (1 - 2 * NU))


def rand_F(rng, n, d, scale=0.05):
    return (np.eye(d) + scale * rng.standard_normal((n, d, d))).astype(np.float32)


@pytest.mark.parametrize("d", [2, 3])
def test_neo_hookean_oracle(d):
    rng = np.random.default_rng(0)
    F = rand_F(rng, 16, d)
    tau, tau_zz, W = hyperelastic.neo_hookean(
        jnp.asarray(F), jnp.float32(E_), jnp.float32(NU)
    )
    F64 = F.astype(np.float64)
    J = np.linalg.det(F64)
    b = F64 @ F64.transpose(0, 2, 1)
    ref = 0.5 * LAM * (J**2 - 1)[:, None, None] * np.eye(d) + G_ * (b - np.eye(d))
    np.testing.assert_allclose(np.asarray(tau), ref, rtol=1e-4, atol=5.0)
    np.testing.assert_allclose(np.asarray(tau_zz), 0.5 * LAM * (J**2 - 1), rtol=1e-4, atol=1e-1)


@pytest.mark.parametrize("d", [2, 3])
def test_svk_oracle(d):
    rng = np.random.default_rng(1)
    F = rand_F(rng, 16, d)
    tau, tau_zz, W = hyperelastic.saint_venant_kirchhoff(
        jnp.asarray(F), jnp.float32(E_), jnp.float32(NU)
    )
    F64 = F.astype(np.float64)
    Egr = 0.5 * (F64.transpose(0, 2, 1) @ F64 - np.eye(d))
    S = LAM * np.trace(Egr, axis1=1, axis2=2)[:, None, None] * np.eye(d) + 2 * G_ * Egr
    ref = F64 @ S @ F64.transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(tau), ref, rtol=1e-4, atol=5.0)


def test_hencky_small_strain_limit():
    """For infinitesimal strains Hencky ≈ linear elasticity."""
    rng = np.random.default_rng(2)
    d = 3
    F = rand_F(rng, 16, d, scale=1e-4)
    tau_h, _, _ = hyperelastic.hencky(jnp.asarray(F), jnp.float32(E_), jnp.float32(NU))
    tau_l, _, _ = hyperelastic.linear_elastic(jnp.asarray(F), jnp.float32(E_), jnp.float32(NU))
    np.testing.assert_allclose(np.asarray(tau_h), np.asarray(tau_l), rtol=5e-2, atol=2.0)


def _vm_oracle_uniaxial(be, DF, eps_n, sigma_y, H):
    """NumPy float64 J2 radial return with linear isotropic hardening."""
    be_tr = DF @ be @ DF.T
    w, V = np.linalg.eigh(be_tr)
    Eh = 0.5 * np.log(w)
    trE = Eh.sum()
    T_vol = K_ * trE * np.ones(3)
    T_dev = 2 * G_ * (Eh - trE / 3.0)
    J2 = np.linalg.norm(T_dev)
    s23 = np.sqrt(2.0 / 3.0)
    phi = J2 - s23 * (sigma_y + H * eps_n)
    if phi <= 0:
        return V @ np.diag(T_vol + T_dev) @ V.T, eps_n
    n = T_dev / J2
    # linear hardening closed form: J2 - s23*(sy+H*(eps_n+s23*dg)) - 2G dg = 0
    dg = phi / (2 * G_ + s23 * H * s23)
    eps_k = eps_n + s23 * dg
    T = T_vol + T_dev - 2 * G_ * dg * n
    return V @ np.diag(T) @ V.T, eps_k


def test_von_mises_oracle_3d():
    rng = np.random.default_rng(3)
    n = 12
    d = 3
    DF = rand_F(rng, n, d, scale=0.01)
    be = np.broadcast_to(np.eye(d, dtype=np.float32), (n, d, d)).copy()
    sigma_y, H = 2e4, 1e5
    out = von_mises(
        jnp.zeros((n, d, d), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.asarray(DF),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n, 3), jnp.float32),
        E=jnp.float32(E_),
        nu=jnp.float32(NU),
        sigma_y=jnp.float32(sigma_y),
        H=jnp.float32(H),
        theta=jnp.float32(1.0),
        K0=jnp.float32(0.0),
        Kinf=jnp.float32(0.0),
        delta=jnp.float32(0.0),
    )
    for i in range(n):
        ref_tau, ref_eps = _vm_oracle_uniaxial(
            be[i].astype(np.float64), DF[i].astype(np.float64), 0.0, sigma_y, H
        )
        np.testing.assert_allclose(np.asarray(out.tau)[i], ref_tau, rtol=2e-3, atol=30.0)
        np.testing.assert_allclose(np.asarray(out.eps)[i], ref_eps, rtol=2e-3, atol=1e-6)
    # plastic particles must exist in this sample for the test to mean much
    assert np.asarray(out.eps).max() > 0


def test_von_mises_plane_strain_zz():
    """2D plane strain tracks the zz channel: uniaxial in-plane stretch with
    yield produces out-of-plane plastic flow (be_zz ≠ 1)."""
    DF = jnp.asarray(np.array([[[1.01, 0.0], [0.0, 1.0]]], np.float32))
    out = von_mises(
        jnp.zeros((1, 2, 2), jnp.float32),
        jnp.zeros((1,), jnp.float32),
        DF,
        jnp.zeros((1,), jnp.float32),
        jnp.zeros((1, 3), jnp.float32),
        E=jnp.float32(E_),
        nu=jnp.float32(NU),
        sigma_y=jnp.float32(1e4),
        H=jnp.float32(0.0),
        theta=jnp.float32(1.0),
        K0=jnp.float32(0.0),
        Kinf=jnp.float32(0.0),
        delta=jnp.float32(0.0),
    )
    assert float(out.eps[0]) > 0  # yielded
    assert abs(float(out.bemi_zz[0])) > 1e-6  # zz plastic flow happened


def test_drucker_prager_elastic_matches_hencky():
    """Below yield DP returns the Hencky elastic stress."""
    rng = np.random.default_rng(4)
    n, d = 8, 3
    DF = rand_F(rng, n, d, scale=1e-4)
    be = np.broadcast_to(np.eye(d, dtype=np.float32), (n, d, d)).copy()
    kw = dict(
        E=jnp.float32(E_),
        nu=jnp.float32(NU),
        kappa0=jnp.float32(1e9),  # huge strength: stays elastic
        friction_angle=jnp.float32(30.0),
        dilatancy_angle=jnp.float32(30.0),
        exponent_ortiz=jnp.float32(2.0),
        plastic_strain_0=jnp.float32(1e-3),
        cohesion=jnp.float32(0.0),
        J2_degradated=jnp.float32(0.0),
    )
    out = drucker_prager(
        jnp.zeros((n, d, d), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.asarray(DF),
        jnp.zeros((n,), jnp.float32),
        jnp.full((n,), 1e9, jnp.float32),
        **kw,
    )
    tau_ref, _, _ = hyperelastic.hencky(jnp.asarray(DF), jnp.float32(E_), jnp.float32(NU))
    np.testing.assert_allclose(np.asarray(out.tau), np.asarray(tau_ref), rtol=1e-3, atol=5.0)
    assert not np.any(np.asarray(out.eps) > 0)


def test_drucker_prager_yield_consistency():
    """A plastically-returning state must end on the (hardened) yield surface:
    Φ(T_ppal, κ_k) ≈ 0 for classical-region returns."""
    d = 3
    # strong deviatoric shear, compressive
    DF = np.eye(d, dtype=np.float32)
    DF[0, 1] = 0.05
    DF[0, 0] = 0.98
    DF = DF[None]
    kappa0 = 1e4
    out = drucker_prager(
        jnp.zeros((1, d, d), jnp.float32),
        jnp.zeros((1,), jnp.float32),
        jnp.asarray(DF),
        jnp.zeros((1,), jnp.float32),
        jnp.full((1,), kappa0, jnp.float32),
        E=jnp.float32(E_),
        nu=jnp.float32(NU),
        kappa0=jnp.float32(kappa0),
        friction_angle=jnp.float32(20.0),
        dilatancy_angle=jnp.float32(20.0),
        exponent_ortiz=jnp.float32(2.0),
        plastic_strain_0=jnp.float32(1e-3),
        cohesion=jnp.float32(0.0),
        J2_degradated=jnp.float32(0.0),
    )
    assert float(out.eps[0]) > 0, "expected plastic step"
    # Recompute Φ from the returned principal stress
    alpha_F, alpha_Q, beta = (
        float(x) for x in cone_parameters(jnp.float32(20.0), jnp.float32(20.0), d)
    )
    w, _ = np.linalg.eigh(np.asarray(out.tau)[0].astype(np.float64))
    p = w.sum() / 3.0
    dev = w - p
    J2 = np.linalg.norm(dev)
    phi = J2 - 3 * alpha_F * (-p) - beta * float(out.kappa[0])
    assert abs(phi) < 1e-2 * (J2 + 1.0), f"not on yield surface: phi={phi}"


def test_dispatch_mixed_materials():
    mats = M.material_table(
        [
            M.material(kind="Neo-Hookean-Wriggers", E=E_, nu=NU),
            M.material(kind="Von-Mises", E=E_, nu=NU, kappa0=1e4),
        ]
    )
    rng = np.random.default_rng(5)
    n, d = 10, 2
    F = rand_F(rng, n, d, scale=0.02)
    DF = F  # starting from identity
    mat_id = jnp.asarray(rng.integers(0, 2, n), jnp.int32)
    out = stress_integration(
        F_n1=jnp.asarray(F),
        DF=jnp.asarray(DF),
        dFdt_n1=jnp.zeros((n, d, d), jnp.float32),
        bemi=jnp.zeros((n, d, d), jnp.float32),
        bemi_zz=jnp.zeros((n,), jnp.float32),
        eps=jnp.zeros((n,), jnp.float32),
        kappa=jnp.zeros((n,), jnp.float32),
        back_stress=jnp.zeros((n, 3), jnp.float32),
        mat_id=mat_id,
        mats=mats,
        kinds=mats.kinds_present(),
    )
    # Neo-Hookean rows match the standalone model
    tau_nh, _, _ = hyperelastic.neo_hookean(jnp.asarray(F), jnp.float32(E_), jnp.float32(NU))
    sel = np.asarray(mat_id) == 0
    np.testing.assert_allclose(
        np.asarray(out.tau)[sel], np.asarray(tau_nh)[sel], rtol=1e-5
    )
    assert np.all(np.isfinite(np.asarray(out.tau)))
