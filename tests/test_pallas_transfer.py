"""Fused Pallas transfer kernels vs the XLA windowed engine (oracle).

Runs in Pallas interpret mode on CPU; the same code path compiles with
Mosaic on TPU.  Parity must hold for: λ solve, N-weighted P2G, grad-weighted
P2G (Σ G·∇N), N-gather, and the displacement-gradient gather.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nlpartsol_tpu.types import Grid, make_particles
from nlpartsol_tpu.ops import pallas_transfer as pt
from nlpartsol_tpu.ops import windowed
from nlpartsol_tpu.shapefun import lme
from nlpartsol_tpu.formulations.explicit import to_slot_layout


def _problem(seed=0, n_side=12, n_particles=150):
    rng = np.random.default_rng(seed)
    h = 1.0 / (n_side - 1)
    grid = Grid(dims=(n_side, n_side), spacing=h, origin=(0.0, 0.0))
    x = rng.uniform(0.15, 0.85, size=(n_particles, 2)).astype(np.float32)
    p = make_particles(
        x,
        mass=rng.uniform(0.5, 2.0, n_particles).astype(np.float32),
        vol0=np.full(n_particles, h * h / 4, np.float32),
    )
    probe = windowed.box_for_extent(grid, [0.1, 0.1], [0.9, 0.9], capacity=1, margin=1)
    cap = windowed.required_capacity(grid, probe, x)
    box = probe.replace(capacity=max(8, cap))
    p = to_slot_layout(p, grid, box)
    params = lme.LMEParams(gamma=3.0)
    return grid, box, p, params


def _oracle(grid, box, p, params):
    sf = lme.evaluate(grid, p.x, p.lme_lambda, params)
    offsets = lme.offsets_for(2, params)
    mask = sf["mask"] & p.active[:, None]
    return sf, offsets, mask


def _tr(p, box):
    C, nc = box.capacity, box.n_cells
    x_t = pt.to_channel_leading(p.x, C, nc)
    lam_t = pt.to_channel_leading(p.lme_lambda, C, nc)
    act_t = pt.to_channel_leading(p.active.astype(jnp.float32), C, nc)
    return x_t, lam_t, act_t


def test_scatter_matches_windowed_p2g():
    grid, box, p, params = _problem()
    sf, offsets, mask = _oracle(grid, box, p, params)
    N = jnp.where(mask, sf["N"], 0.0)

    # oracle: mass + momentum P2G
    rng = np.random.default_rng(1)
    vel = jnp.asarray(rng.standard_normal((p.count, 2)), jnp.float32)
    m_ref = windowed.p2g(N * p.mass[:, None], box, grid, offsets)
    mom = (N * p.mass[:, None])[..., None] * vel[:, None, :]
    mom_ref = windowed.p2g(mom, box, grid, offsets)

    x_t, lam_t, act_t = _tr(p, box)
    C, nc = box.capacity, box.n_cells
    fN = jnp.stack(
        [
            pt.to_channel_leading(p.mass, C, nc)[0],
            pt.to_channel_leading(p.mass * vel[:, 0], C, nc)[0],
            pt.to_channel_leading(p.mass * vel[:, 1], C, nc)[0],
        ]
    )
    nodes, lam_new, nnz = pt.fused_scatter(grid, box, params, x_t, lam_t, act_t, fN)
    np.testing.assert_allclose(np.asarray(nodes[:, 0]), np.asarray(m_ref),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(nodes[:, 1:]), np.asarray(mom_ref),
                               rtol=2e-5, atol=1e-6)
    # λ parity with the XLA solver
    lam_ref = sf["lam"]
    lam_got = pt.from_channel_leading(lam_new)
    sel = np.asarray(p.active)
    np.testing.assert_allclose(np.asarray(lam_got)[sel], np.asarray(lam_ref)[sel],
                               rtol=1e-3, atol=1e-3 / grid.spacing * 1e-3)


def test_scatter_grad_weighted_matches_forces():
    grid, box, p, params = _problem(seed=2)
    sf, offsets, mask = _oracle(grid, box, p, params)
    dN = jnp.where(mask[..., None], sf["dN"], 0.0)

    rng = np.random.default_rng(3)
    G = jnp.asarray(rng.standard_normal((p.count, 2, 2)), jnp.float32)
    fi = jnp.einsum("pij,pkj->pki", G, dN)
    f_ref = windowed.p2g(fi, box, grid, offsets)

    x_t, lam_t, act_t = _tr(p, box)
    C, nc = box.capacity, box.n_cells
    fN = pt.to_channel_leading(p.mass, C, nc)  # dummy N channel
    G_t = pt.to_channel_leading(G.reshape(-1, 4), C, nc)
    nodes, _, _ = pt.fused_scatter(grid, box, params, x_t, lam_t, act_t, fN, G_t=G_t)
    np.testing.assert_allclose(np.asarray(nodes[:, 1:]), np.asarray(f_ref),
                               rtol=3e-4, atol=3e-5)


def test_gather_matches_windowed_g2p_and_gradient():
    grid, box, p, params = _problem(seed=4)
    sf, offsets, mask = _oracle(grid, box, p, params)
    N = jnp.where(mask, sf["N"], 0.0)
    dN = jnp.where(mask[..., None], sf["dN"], 0.0)

    rng = np.random.default_rng(5)
    field = jnp.asarray(rng.standard_normal((grid.n_nodes, 2)), jnp.float32)
    out_ref = windowed.g2p(field, N, box, grid, offsets)
    # displacement gradient: Σ_A u_A ⊗ ∇N_A
    u_edges = field[sf["node_ids"]]
    u_edges = jnp.where(mask[..., None], u_edges, 0.0)
    grad_ref = jnp.einsum("pki,pkj->pij", u_edges, dN)

    x_t, lam_t, act_t = _tr(p, box)
    # gathers run at the λ the step's scatter solved (the oracle's sf["lam"])
    C, nc = box.capacity, box.n_cells
    lam_conv = pt.to_channel_leading(sf["lam"], C, nc)
    outN, grad = pt.fused_gather(
        grid, box, params, x_t, lam_conv, act_t, gN=field, g_grad=field
    )
    sel = np.asarray(p.active)
    np.testing.assert_allclose(np.asarray(outN)[sel], np.asarray(out_ref)[sel],
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grad)[sel], np.asarray(grad_ref)[sel],
                               rtol=3e-4, atol=3e-5)


def test_explicit_step_pallas_matches_windowed():
    """Full explicit step: fused-Pallas path vs windowed path, several steps
    (positions, velocities, F, stress must track within f32 tolerance)."""
    from nlpartsol_tpu.formulations.explicit import ExplicitConfig, explicit_step
    from nlpartsol_tpu.models import materials as M

    grid, box, p, params = _problem(seed=7, n_side=14, n_particles=200)
    rng = np.random.default_rng(8)
    p = p.replace(
        v=jnp.asarray(0.05 * rng.standard_normal((p.count, 2)), jnp.float32),
        vol0=jnp.full((p.count,), grid.spacing**2 / 4, jnp.float32),
    )
    mats = M.material_table(
        [M.material(kind="Neo-Hookean-Wriggers", E=1e6, nu=0.3, rho0=1000.0)]
    )
    dt = 0.1 * grid.spacing / np.sqrt(1e6 / 1e3)
    kw = dict(dt=dt, shapefun="lme", lme_params=params, kinds=(M.NEO_HOOKEAN,),
              active_box=box)
    cfg_w = ExplicitConfig(transfer="windowed", **kw)
    cfg_p = ExplicitConfig(transfer="pallas", **kw)
    body = jnp.asarray([0.0, -9.81], jnp.float32)

    pw = pp = p
    for _ in range(3):
        pw, dw = explicit_step(pw, grid, mats, cfg_w, body)
        pp, dp = explicit_step(pp, grid, mats, cfg_p, body)

    sel = np.asarray(pw.active)
    assert int(dp["nnz"]) == int(dw["nnz"])
    np.testing.assert_allclose(np.asarray(pp.x)[sel], np.asarray(pw.x)[sel],
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(pp.v)[sel], np.asarray(pw.v)[sel],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pp.F)[sel], np.asarray(pw.F)[sel],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pp.stress)[sel], np.asarray(pw.stress)[sel],
                               rtol=2e-3, atol=1.0)


def test_rebin_every_matches_per_step_binning():
    """rebin_every=4 with the 1-cell drift margin must reproduce per-step
    binning (the radius mask makes the widened-window basis identical)."""
    from nlpartsol_tpu.formulations.explicit import ExplicitConfig, run
    from nlpartsol_tpu.models import materials as M

    grid, box, p, params = _problem(seed=11, n_side=9, n_particles=60)
    rng = np.random.default_rng(12)
    p = p.replace(
        v=jnp.asarray(0.1 * rng.standard_normal((p.count, 2)), jnp.float32),
        vol0=jnp.full((p.count,), grid.spacing**2 / 4, jnp.float32),
    )
    mats = M.material_table(
        [M.material(kind="Neo-Hookean-Wriggers", E=1e6, nu=0.3, rho0=1000.0)]
    )
    dt = 0.2 * grid.spacing / np.sqrt(1e6 / 1e3)
    kw = dict(dt=dt, shapefun="lme", lme_params=params, kinds=(M.NEO_HOOKEAN,),
              active_box=box, transfer="pallas")
    p1, _ = run(p, grid, mats, ExplicitConfig(rebin_every=1, **kw), 3)
    p4, _ = run(p, grid, mats, ExplicitConfig(rebin_every=3, **kw), 3)

    # same particles survive; compare by pid (slot layouts may differ)
    def by_pid(pp):
        sel = np.asarray(pp.active)
        order = np.argsort(np.asarray(pp.pid)[sel])
        return (np.asarray(pp.x)[sel][order], np.asarray(pp.v)[sel][order],
                np.asarray(pp.F)[sel][order])
    x1, v1, F1 = by_pid(p1)
    x4, v4, F4 = by_pid(p4)
    np.testing.assert_allclose(x4, x1, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(v4, v1, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(F4, F1, rtol=1e-5, atol=1e-7)


def test_mosaic_kernels_interpret_parity():
    """The REAL Mosaic kernels (interpret mode) vs the XLA fallback on a
    tiny problem — guards the kernel code itself on CPU; TPU runs use it
    compiled.  Covers margin=0 and the widened margin=1 window."""
    grid, box, p, params = _problem(seed=21, n_side=8, n_particles=40)
    sf, offsets, mask = _oracle(grid, box, p, params)
    x_t, lam_t, act_t = _tr(p, box)
    C, nc = box.capacity, box.n_cells
    lam_conv = pt.to_channel_leading(sf["lam"], C, nc)
    fN = pt.to_channel_leading(p.mass, C, nc)
    rng = np.random.default_rng(22)
    G_t = pt.to_channel_leading(
        jnp.asarray(rng.standard_normal((p.count, 4)), jnp.float32), C, nc
    )
    field = jnp.asarray(rng.standard_normal((grid.n_nodes, 2)), jnp.float32)

    # one margin (=1, the widened window) keeps interpret cost bounded;
    # margin=0 differs only in the static window halfwidth
    margin = 1
    ref_sc = pt.fused_scatter(grid, box, params, x_t, lam_t, act_t, fN,
                              G_t=G_t, solve=True, margin=margin)
    ref_ga = pt.fused_gather(grid, box, params, x_t, lam_conv, act_t,
                             gN=field, g_grad=field, margin=margin)
    pt.FORCE_INTERPRET = True
    try:
        got_sc = pt.fused_scatter(grid, box, params, x_t, lam_t, act_t, fN,
                                  G_t=G_t, solve=True, margin=margin)
        got_ga = pt.fused_gather(grid, box, params, x_t, lam_conv, act_t,
                                 gN=field, g_grad=field, margin=margin)
    finally:
        pt.FORCE_INTERPRET = False
    np.testing.assert_allclose(np.asarray(got_sc[0]), np.asarray(ref_sc[0]),
                               rtol=2e-4, atol=1e-5)
    assert int(got_sc[2]) == int(ref_sc[2])
    sel = np.asarray(p.active)
    np.testing.assert_allclose(np.asarray(got_ga[0])[sel],
                               np.asarray(ref_ga[0])[sel], rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_ga[1])[sel],
                               np.asarray(ref_ga[1])[sel], rtol=2e-3, atol=1e-4)


def test_implicit_step_pallas_matches_windowed():
    """Implicit Newmark step: fused-Pallas path (custom-JVP linear ops
    through the kernels) vs the windowed path — dU, stress, convergence."""
    from nlpartsol_tpu.formulations.implicit import ImplicitConfig, implicit_step
    from nlpartsol_tpu.models import materials as M

    grid, box, p, params = _problem(seed=9, n_side=14, n_particles=180)
    rng = np.random.default_rng(10)
    p = p.replace(
        v=jnp.asarray(0.02 * rng.standard_normal((p.count, 2)), jnp.float32),
        vol0=jnp.full((p.count,), grid.spacing**2 / 4, jnp.float32),
    )
    mats = M.material_table(
        [M.material(kind="Neo-Hookean-Wriggers", E=1e6, nu=0.3, rho0=1000.0)]
    )
    dt = 0.5 * grid.spacing / np.sqrt(1e6 / 1e3)
    kw = dict(dt=dt, shapefun="lme", lme_params=params, kinds=(M.NEO_HOOKEAN,),
              active_box=box, cg_maxiter=100)
    cfg_w = ImplicitConfig(transfer="windowed", **kw)
    cfg_p = ImplicitConfig(transfer="pallas", **kw)
    body = jnp.asarray([0.0, -9.81], jnp.float32)

    pw = pp = p
    for _ in range(2):
        pw, dw = implicit_step(pw, grid, mats, cfg_w, body)
        pp, dp = implicit_step(pp, grid, mats, cfg_p, body)
        assert bool(dw["converged"]) and bool(dp["converged"])
        assert int(dp["lost"]) == 0

    # compare by pid (slot orders may differ between binning flavours)
    def by_pid(q, arr):
        a = np.asarray(arr)[np.asarray(q.active)]
        return a[np.argsort(np.asarray(q.pid)[np.asarray(q.active)])]

    assert int(dp["nnz"]) == int(dw["nnz"])
    np.testing.assert_allclose(by_pid(pp, pp.x), by_pid(pw, pw.x),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(by_pid(pp, pp.v), by_pid(pw, pw.v),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(by_pid(pp, pp.F), by_pid(pw, pw.F),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(by_pid(pp, pp.stress), by_pid(pw, pw.stress),
                               rtol=5e-3, atol=10.0)
