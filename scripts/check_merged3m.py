"""Quick dev check: merged-lane 3D kernels (interpret mode, CPU) vs the
XLA fallback oracle.  Run: JAX_PLATFORMS=cpu python scripts/check_merged3m.py"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from nlpartsol_tpu.types import Grid, make_particles
from nlpartsol_tpu.ops import pallas_transfer as pt
from nlpartsol_tpu.ops import pallas_transfer3d as pt3
from nlpartsol_tpu.ops import windowed
from nlpartsol_tpu.shapefun import lme
from nlpartsol_tpu.formulations.explicit import to_slot_layout


def problem(seed=0, n_side=7, n_particles=30, gamma=5.0):
    rng = np.random.default_rng(seed)
    h = 1.0 / (n_side - 1)
    grid = Grid(dims=(n_side,) * 3, spacing=h, origin=(0.0, 0.0, 0.0))
    x = rng.uniform(0.2, 0.8, size=(n_particles, 3)).astype(np.float32)
    p = make_particles(
        x,
        mass=rng.uniform(0.5, 2.0, n_particles).astype(np.float32),
        vol0=np.full(n_particles, h ** 3 / 8, np.float32),
    )
    probe = windowed.box_for_extent(grid, [0.15] * 3, [0.85] * 3, capacity=1,
                                    margin=1)
    cap = windowed.required_capacity(grid, probe, x)
    box = probe.replace(capacity=max(4, cap))
    p = to_slot_layout(p, grid, box)
    params = lme.LMEParams(gamma=gamma, tol_zero=1e-6)
    return grid, box, p, params


def main():
    grid, box, p, params = problem()
    sf = lme.evaluate(grid, p.x, p.lme_lambda, params)
    C, nc = box.capacity, box.n_cells
    x_t = pt.to_channel_leading(p.x, C, nc)
    lam_t = pt.to_channel_leading(p.lme_lambda, C, nc)
    lam_conv = pt.to_channel_leading(sf["lam"], C, nc)
    act_t = pt.to_channel_leading(p.active.astype(jnp.float32), C, nc)
    fN = pt.to_channel_leading(p.mass, C, nc)
    rng = np.random.default_rng(1)
    G_t = pt.to_channel_leading(
        jnp.asarray(rng.standard_normal((p.count, 9)), jnp.float32), C, nc
    )
    field = jnp.asarray(rng.standard_normal((grid.n_nodes, 3)), jnp.float32)

    gm = _Geom = pt3._Geom3M(grid, box, params, 0)
    print(f"geom: S={gm.S} L={gm.L} Lin={gm.Lin} Lout={gm.Lout} "
          f"R0={gm.R0} Csub={gm.Csub} Csp={gm.Csp} nprog={gm.nprog} "
          f"w={gm.w} trips={len(gm.trips)} C={gm.C} cdims={box.cdims}")

    # view roundtrip
    v = pt3._to_view3m(gm, x_t, 3)
    back = pt3._from_view3m(gm, v, 3)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x_t))
    print("view roundtrip OK")

    ref_sc = pt.fused_scatter(grid, box, params, x_t, lam_t, act_t, fN,
                              G_t=G_t, solve=True)
    ref_ga = pt.fused_gather(grid, box, params, x_t, lam_conv, act_t,
                             gN=field, g_grad=field)
    pt.FORCE_INTERPRET = True
    pt3.FORCE_INTERPRET = True
    pt3.LAYOUT3D = "merged"
    try:
        got_sc = pt.fused_scatter(grid, box, params, x_t, lam_t, act_t, fN,
                                  G_t=G_t, solve=True)
        got_ga = pt.fused_gather(grid, box, params, x_t, lam_conv, act_t,
                                 gN=field, g_grad=field)
    finally:
        pt.FORCE_INTERPRET = False
        pt3.FORCE_INTERPRET = False
        pt3.LAYOUT3D = "auto"
    np.testing.assert_allclose(np.asarray(got_sc[0]), np.asarray(ref_sc[0]),
                               rtol=2e-4, atol=1e-5)
    print("scatter nodes OK; nnz", int(got_sc[2]), "vs", int(ref_sc[2]))
    assert int(got_sc[2]) == int(ref_sc[2])
    sel = np.asarray(p.active)
    np.testing.assert_allclose(np.asarray(got_ga[0])[sel],
                               np.asarray(ref_ga[0])[sel], rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_ga[1])[sel],
                               np.asarray(ref_ga[1])[sel], rtol=2e-3, atol=1e-4)
    print("gather OK")


if __name__ == "__main__":
    main()
