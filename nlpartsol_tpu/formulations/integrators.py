"""Additional explicit integrators: Forward-Euler (momentum form) and
Generalized-α.

References:
* U_Forward_Euler — legacy momentum-form MPM (USL/FLIP): P2G mass+momentum,
  nodal p += Δt·F, FLIP velocity update + position from nodal momentum
  (/root/reference/nl-partsol/src/Formulations/Displacements/
  U-Forward-Euler.c:19-370).
* U_Generalized_alpha — nodal kinetics {m, a0, a1, v} with spectral-radius
  parameterisation α = (2r_b−1)/(1+r_b), β = (5−3r_b)/((1+r_b)²(2−r_b)),
  γ = 3/2 − α (U-Generalized-Alpha.c:107-180); a1 = (F/m − α·a0)/(1−α);
  particle updates at :423-545.

Both reuse the fused shape-function evaluation + transfer engine of the
Newmark predictor-corrector driver; nodal a0 for generalized-α is recovered
by mass-weighted P2G of the particle accelerations each step (the reference
persists it the same way through its Nodal_Kinetics block).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models import dispatch as con
from ..models.materials import MaterialTable
from ..ops import windowed
from ..ops import tensor as tn
from ..ops.sparse import nnz as count_nnz
from ..types import Grid, Particles
from . import kinematics as kin
from .common import found_lost, make_engine, shapefun_eval
from .explicit import ExplicitConfig


def generalized_alpha_parameters(rb: float):
    """(α, β, γ) from the spectral radius r_b (U-Generalized-Alpha.c:126-129)."""
    alpha = (2.0 * rb - 1.0) / (1.0 + rb)
    beta = (5.0 - 3.0 * rb) / ((1.0 + rb) ** 2 * (2.0 - rb))
    gamma = 1.5 - alpha
    return alpha, beta, gamma


def forward_euler_step(
    p: Particles,
    grid: Grid,
    mats: MaterialTable,
    cfg: ExplicitConfig,
    body_accel: jax.Array,
    traction: Optional[jax.Array] = None,
    traction_area: Optional[jax.Array] = None,
):
    """One momentum-form forward-Euler step (U_Forward_Euler)."""
    dt = cfg.dt
    d = p.dim
    lost = jnp.zeros((), jnp.int32)
    if cfg.transfer == "windowed":
        binning = windowed.bin_particles(grid, cfg.active_box, p.x, p.active)
        p = windowed.permute_to_slots(p, binning)
        lost = binning.lost
    act = p.active

    sf, offsets = shapefun_eval(cfg, grid, p)
    N, dN, mask = sf["N"], sf["dN"], sf["mask"] & act[:, None]
    lost = lost + found_lost(sf, act)
    eng = make_engine(cfg, grid, sf, offsets, mask)

    m_nodes = eng.p2g(N * p.mass[:, None])
    m_safe = jnp.maximum(m_nodes, cfg.mass_tol)[:, None]
    mom_nodes = eng.p2g((N * p.mass[:, None])[..., None] * p.v[:, None, :])
    if grid.dirichlet_mask is not None:
        mom_nodes = jnp.where(
            grid.dirichlet_mask, grid.dirichlet_value * m_safe, mom_nodes
        )
    v_nodes = mom_nodes / m_safe

    # local state from nodal velocity: ΔF = I + Δt Σ v_A ⊗ ∇N_A (:560-620)
    v_edges = eng.edge_gather(v_nodes)
    grad_v = kin.disp_gradient(v_edges, dN)
    DF = dt * grad_v + jnp.eye(d, dtype=grad_v.dtype)
    F_n1 = tn.bmm(DF, p.F)
    J_n1 = tn.det(F_n1)
    J_n1 = jnp.where(J_n1 > 0.0, J_n1, 0.0)
    dFdt_n1 = kin.rate_deformation_gradient_n1(grad_v, p.F, DF, p.dFdt)

    cs = con.stress_integration(
        F_n1=F_n1,
        DF=DF,
        dFdt_n1=dFdt_n1,
        bemi=p.bemi,
        bemi_zz=p.bemi_zz,
        eps=p.eps,
        kappa=p.kappa,
        back_stress=p.back_stress,
        mat_id=p.mat_id,
        mats=mats,
        kinds=cfg.kinds,
    )
    tau_eff = cs.tau * (1.0 - p.damage)[:, None, None]
    dN1 = kin.push_forward_dN(dN, DF)
    fi = -jnp.einsum("pij,pkj->pki", tau_eff * p.vol0[:, None, None], dN1)
    forces = eng.p2g(fi)
    if traction is not None:
        tr = (N * traction_area[:, None])[..., None] * traction[:, None, :]
        forces = forces + eng.p2g(tr)
    forces = forces + m_nodes[:, None] * body_accel[None, :]
    if grid.dirichlet_mask is not None:
        forces = jnp.where(grid.dirichlet_mask, 0.0, forces)

    # nodal momentum update (:296-340), FLIP particle update (:423-470)
    mom_new = mom_nodes + dt * forces
    dv_p = dt * eng.g2p(N, forces / m_safe)
    du_p = dt * eng.g2p(N, mom_new / m_safe)

    sel = act[:, None]
    p_out = p.replace(
        x=jnp.where(sel, p.x + du_p, p.x),
        dis=p.dis + jnp.where(sel, du_p, 0.0),
        v=jnp.where(sel, p.v + dv_p, p.v),
        a=jnp.where(sel, eng.g2p(N, forces / m_safe), p.a),
        rho=p.mass / (p.vol0 * jnp.maximum(J_n1, 1e-12)),
        F=F_n1,
        dFdt=dFdt_n1,
        J=J_n1,
        bemi=cs.bemi,
        bemi_zz=cs.bemi_zz,
        stress=cs.tau,
        stress_zz=cs.tau_zz,
        eps=cs.eps,
        kappa=cs.kappa,
        back_stress=cs.back_stress,
        W=cs.W,
        lme_lambda=sf["lam"] if sf["lam"] is not None else p.lme_lambda,
    )
    return p_out, dict(nnz=count_nnz(mask), lost=lost)


def generalized_alpha_step(
    p: Particles,
    grid: Grid,
    mats: MaterialTable,
    cfg: ExplicitConfig,
    body_accel: jax.Array,
    rb: float = 0.6,
    traction: Optional[jax.Array] = None,
    traction_area: Optional[jax.Array] = None,
):
    """One generalized-α step (U_Generalized_alpha)."""
    dt = cfg.dt
    d = p.dim
    alpha, beta, gamma = generalized_alpha_parameters(rb)

    lost = jnp.zeros((), jnp.int32)
    if cfg.transfer == "windowed":
        binning = windowed.bin_particles(grid, cfg.active_box, p.x, p.active)
        p = windowed.permute_to_slots(p, binning)
        lost = binning.lost
    act = p.active

    sf, offsets = shapefun_eval(cfg, grid, p)
    N, dN, mask = sf["N"], sf["dN"], sf["mask"] & act[:, None]
    lost = lost + found_lost(sf, act)
    eng = make_engine(cfg, grid, sf, offsets, mask)

    m_nodes = eng.p2g(N * p.mass[:, None])
    m_safe = jnp.maximum(m_nodes, cfg.mass_tol)[:, None]
    mN = (N * p.mass[:, None])[..., None]
    v_nodes = eng.p2g(mN * p.v[:, None, :]) / m_safe
    a0_nodes = eng.p2g(mN * p.a[:, None, :]) / m_safe
    if grid.dirichlet_mask is not None:
        v_nodes = jnp.where(grid.dirichlet_mask, grid.dirichlet_value, v_nodes)
        a0_nodes = jnp.where(grid.dirichlet_mask, 0.0, a0_nodes)

    # local state from nodal velocity (α-midpoint ΔF)
    v_edges = eng.edge_gather(v_nodes)
    grad_v = kin.disp_gradient(v_edges, dN)
    DF = dt * grad_v + jnp.eye(d, dtype=grad_v.dtype)
    F_n1 = tn.bmm(DF, p.F)
    J_n1 = jnp.maximum(tn.det(F_n1), 0.0)
    dFdt_n1 = kin.rate_deformation_gradient_n1(grad_v, p.F, DF, p.dFdt)

    cs = con.stress_integration(
        F_n1=F_n1,
        DF=DF,
        dFdt_n1=dFdt_n1,
        bemi=p.bemi,
        bemi_zz=p.bemi_zz,
        eps=p.eps,
        kappa=p.kappa,
        back_stress=p.back_stress,
        mat_id=p.mat_id,
        mats=mats,
        kinds=cfg.kinds,
    )
    tau_eff = cs.tau * (1.0 - p.damage)[:, None, None]
    dN1 = kin.push_forward_dN(dN, DF)
    fi = -jnp.einsum("pij,pkj->pki", tau_eff * p.vol0[:, None, None], dN1)
    forces = eng.p2g(fi)
    if traction is not None:
        tr = (N * traction_area[:, None])[..., None] * traction[:, None, :]
        forces = forces + eng.p2g(tr)
    forces = forces + m_nodes[:, None] * body_accel[None, :]

    # a1 = (F/m − α a0)/(1−α)   (:157-162)
    a1_nodes = (forces / m_safe - alpha * a0_nodes) / (1.0 - alpha)
    if grid.dirichlet_mask is not None:
        a1_nodes = jnp.where(grid.dirichlet_mask, 0.0, a1_nodes)

    # particle updates (:423-545)
    a_p = eng.g2p(N, a1_nodes)
    dv_p = dt * eng.g2p(N, (1.0 - gamma) * a0_nodes + gamma * a1_nodes)
    du_p = dt * eng.g2p(N, v_nodes) + dt * dt * eng.g2p(
        N, (0.5 - beta) * a0_nodes + beta * a1_nodes
    )

    sel = act[:, None]
    p_out = p.replace(
        x=jnp.where(sel, p.x + du_p, p.x),
        dis=p.dis + jnp.where(sel, du_p, 0.0),
        v=jnp.where(sel, p.v + dv_p, p.v),
        a=jnp.where(sel, a_p, p.a),
        rho=p.mass / (p.vol0 * jnp.maximum(J_n1, 1e-12)),
        F=F_n1,
        dFdt=dFdt_n1,
        J=J_n1,
        bemi=cs.bemi,
        bemi_zz=cs.bemi_zz,
        stress=cs.tau,
        stress_zz=cs.tau_zz,
        eps=cs.eps,
        kappa=cs.kappa,
        back_stress=cs.back_stress,
        W=cs.W,
        lme_lambda=sf["lam"] if sf["lam"] is not None else p.lme_lambda,
    )
    return p_out, dict(nnz=count_nnz(mask), lost=lost)
