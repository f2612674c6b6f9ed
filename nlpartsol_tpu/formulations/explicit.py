"""Explicit Newmark predictor-corrector MPM step (single-phase -u).

Completes the reference's intended explicit path
(/root/reference/nl-partsol/src/Formulations/Displacements/U-Verlet.c — note
the force/equilibrium stages are commented out in the reference's current
revision, U-Verlet.c:137-149; this implements the full scheme):

  per step:
    local search + shape functions            (:93)   — one fused evaluation
    lumped mass P2G                           (:166)
    particle predictor  Δu_p = Δt·v + Δt²/2·a;  v += (1−γ)Δt·a   (:229)
    P2G displacement increment (mass-weighted) + diagonal solve  (:301)
    Dirichlet on nodal increments             (:458)
    ΔF → F_{n+1} → J → stress                 (:530)
    internal + traction forces                (:703,805)
    lumped equilibrium  a_A = b + f_A/m_A, reactions on fixed dofs (:906)
    G2P accel/displacement + corrector  v += γΔt·a, x += Δu  (:1024)

One jitted pure function: Particles × nodal inputs → Particles.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..models import dispatch as con
from ..models.materials import MaterialTable
from ..ops import sparse
from ..ops import tensor as tn
from ..shapefun import fem, lme
from ..types import Grid, Particles
from . import kinematics as kin


@struct.dataclass
class ExplicitConfig:
    dt: float = struct.field(pytree_node=False)
    gamma: float = struct.field(pytree_node=False, default=0.5)
    shapefun: str = struct.field(pytree_node=False, default="lme")
    lme_params: lme.LMEParams = struct.field(
        pytree_node=False, default_factory=lme.LMEParams
    )
    kinds: tuple = struct.field(pytree_node=False, default=(3,))  # NEO_HOOKEAN
    mass_tol: float = struct.field(pytree_node=False, default=1e-12)


def _shapefun(cfg: ExplicitConfig, grid: Grid, p: Particles):
    if cfg.shapefun == "lme":
        return lme.evaluate(grid, p.x, p.lme_lambda, cfg.lme_params)
    if cfg.shapefun == "fem":
        return fem.evaluate(grid, p.x)
    raise ValueError(f"unknown shapefun {cfg.shapefun}")


def explicit_step(
    p: Particles,
    grid: Grid,
    mats: MaterialTable,
    cfg: ExplicitConfig,
    body_accel: jax.Array,  # (d,) gravity/body acceleration this step
    traction: Optional[jax.Array] = None,  # (Np, d) nominal traction t̄
    traction_area: Optional[jax.Array] = None,  # (Np,) reference area A0_p
):
    """One explicit step.  Returns (particles_{n+1}, diagnostics)."""
    dt = cfg.dt
    gamma = cfg.gamma
    d = p.dim
    n_nodes = grid.n_nodes
    act = p.active

    # --- shape functions (fused local search + N + ∇N) ---
    sf = _shapefun(cfg, grid, p)
    ids, N, dN, mask = sf["node_ids"], sf["N"], sf["dN"], sf["mask"]
    mask = mask & act[:, None]

    # --- lumped mass ---
    m_nodes = sparse.masked_lumped_mass(ids, mask, N, p.mass, n_nodes)
    m_safe = jnp.maximum(m_nodes, cfg.mass_tol)[:, None]

    # --- particle predictor ---
    d_dis_p = dt * p.v + 0.5 * dt * dt * p.a
    v_pred = p.v + (1.0 - gamma) * dt * p.a

    # --- P2G displacement increment, mass-weighted recovery ---
    mom = (N * p.mass[:, None])[..., None] * d_dis_p[:, None, :]  # (Np,K,d)
    d_dis_nodes = sparse.p2g(ids, mask, mom, n_nodes) / m_safe

    # --- Dirichlet on nodal displacement increments ---
    if grid.dirichlet_mask is not None:
        d_dis_nodes = jnp.where(
            grid.dirichlet_mask, grid.dirichlet_value, d_dis_nodes
        )

    # --- local compatibility: ΔF, F_{n+1}, J ---
    DF = kin.incremental_deformation_gradient(ids, mask, dN, d_dis_nodes)
    F_n1 = DF @ p.F
    J_n1 = tn.det(F_n1)
    J_n1 = jnp.where(J_n1 > 0.0, J_n1, 0.0)  # negative-J clamp (U-Newmark-beta.c:1137)
    dt_DF = kin.rate_increment_deformation_gradient(
        ids, mask, dN, d_dis_nodes / dt
    )
    dFdt_n1 = kin.rate_deformation_gradient_n1(dt_DF, p.F, DF, p.dFdt)

    # --- constitutive update ---
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

    # --- internal forces: f_A = −Σ_p V0 τ ∇N^{n+1}  ---
    dN1 = kin.push_forward_dN(dN, DF)
    f_int_contrib = -jnp.einsum(
        "pij,pkj->pki", tau_eff * p.vol0[:, None, None], dN1
    )
    forces = sparse.p2g(ids, mask, f_int_contrib, n_nodes)

    # --- traction (Neumann) forces: f_A += Σ_p N A0 t̄ ---
    if traction is not None:
        tr = (N * traction_area[:, None])[..., None] * traction[:, None, :]
        forces = forces + sparse.p2g(ids, mask, tr, n_nodes)

    # --- lumped equilibrium + reactions ---
    accel_nodes = body_accel[None, :] + forces / m_safe
    if grid.dirichlet_mask is not None:
        reactions = jnp.where(grid.dirichlet_mask, forces, 0.0)
        accel_nodes = jnp.where(grid.dirichlet_mask, 0.0, accel_nodes)
    else:
        reactions = jnp.zeros_like(forces)

    # --- G2P + corrector ---
    a_p = sparse.g2p(ids, mask, N, accel_nodes)
    d_dis_p_smooth = sparse.g2p(ids, mask, N, d_dis_nodes)
    v_new = v_pred + gamma * dt * a_p
    x_new = p.x + d_dis_p_smooth

    rho_new = p.mass / (p.vol0 * jnp.maximum(J_n1, 1e-12))

    p_out = p.replace(
        x=jnp.where(act[:, None], x_new, p.x),
        v=jnp.where(act[:, None], v_new, p.v),
        a=jnp.where(act[:, None], a_p, p.a),
        dis=p.dis + jnp.where(act[:, None], d_dis_p_smooth, 0.0),
        rho=rho_new,
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
    diag = dict(
        nnz=sparse.nnz(mask),
        reactions=reactions,
        kinetic_energy=0.5 * jnp.sum(p.mass[:, None] * v_new * v_new, where=act[:, None]),
        strain_energy=jnp.sum(cs.W * p.vol0, where=act),
    )
    return p_out, diag


def run(
    p: Particles,
    grid: Grid,
    mats: MaterialTable,
    cfg: ExplicitConfig,
    n_steps: int,
    body_accel=None,
):
    """Time loop under lax.scan (whole trajectory jitted)."""
    d = p.dim
    if body_accel is None:
        body_accel = jnp.zeros((d,), p.x.dtype)

    def body(carry, _):
        pp = carry
        pp, diag = explicit_step(pp, grid, mats, cfg, body_accel)
        return pp, (diag["kinetic_energy"], diag["strain_energy"])

    p_final, (ke, se) = jax.lax.scan(body, p, None, length=n_steps)
    return p_final, dict(kinetic_energy=ke, strain_energy=se)
