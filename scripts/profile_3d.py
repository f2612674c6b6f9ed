"""Stage timing of the 3D merged-lane step at the bench geometry.

Times each fused transfer call, the view marshalling, and the local rebin
in isolation on the device.  Run on TPU:
  NLPS_3D_LAYOUT=merged python scripts/profile_3d.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    os.makedirs("/root/jaxcache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from bench3d import build_problem3
    from nlpartsol_tpu.formulations.explicit import to_slot_layout
    from nlpartsol_tpu.ops import pallas_transfer as pt
    from nlpartsol_tpu.ops import pallas_transfer3d as pt3
    from nlpartsol_tpu.ops import windowed
    from nlpartsol_tpu.shapefun import lme

    n_side = int(os.environ.get("BENCH_GRID", "96"))
    grid, p, mats, h = build_problem3(n_side=n_side)
    box = windowed.ActiveBox(
        offset=(n_side // 4 - 2,) * 3,
        cdims=(n_side // 2 + 4,) * 3,
        capacity=2,
    )
    params = lme.LMEParams(gamma=3.0)
    p = to_slot_layout(p, grid, box)
    C, nc = box.capacity, box.n_cells
    x_t = pt.to_channel_leading(p.x, C, nc)
    lam_t = pt.to_channel_leading(p.lme_lambda, C, nc)
    act_t = pt.to_channel_leading(p.active.astype(jnp.float32), C, nc)
    fN4 = jnp.concatenate(
        [pt.to_channel_leading(p.mass, C, nc)] * 4, axis=0
    )
    fN1 = pt.to_channel_leading(p.mass, C, nc)
    rng = np.random.default_rng(0)
    G_t = pt.to_channel_leading(
        jnp.asarray(rng.standard_normal((p.count, 9)), jnp.float32), C, nc
    )
    field = jnp.asarray(
        rng.standard_normal((grid.n_nodes, 3)), jnp.float32
    )

    mkviews = jax.jit(
        lambda x, l, a: pt3.make_views3(grid, box, params, x, l, a, 0)
    )
    xv, lamv, av = mkviews(x_t, lam_t, act_t)
    tv = dict(xv=xv, lamv=lamv, av=av)
    print(f"views marshal: {timeit(mkviews, x_t, lam_t, act_t)*1e3:7.2f} ms")

    sc1 = jax.jit(lambda fN, xv, lamv, av: pt.fused_scatter(
        grid, box, params, x_t, lam_t, act_t, fN, solve=True,
        xv=xv, lamv=lamv, av=av, lam_view_out=True))
    t = timeit(sc1, fN4, xv, lamv, av)
    print(f"scatter1 (solve, cN=4): {t*1e3:7.2f} ms")
    lamv2 = sc1(fN4, xv, lamv, av)[1]
    tv["lamv"] = lamv2

    sc1n = jax.jit(lambda fN, xv, lamv, av: pt.fused_scatter(
        grid, box, params, x_t, lam_t, act_t, fN, solve=False,
        xv=xv, lamv=lamv, av=av, lam_view_out=True))
    print(f"scatter1 (nosolve, cN=4): {timeit(sc1n, fN4, xv, lamv2, av)*1e3:7.2f} ms")

    ga1 = jax.jit(lambda f, xv, lamv, av: pt.fused_gather(
        grid, box, params, x_t, lam_t, act_t, gN=f, g_grad=f,
        xv=xv, lamv=lamv, av=av))
    print(f"gather1 (N+grad): {timeit(ga1, field, xv, lamv2, av)*1e3:7.2f} ms")

    sc2 = jax.jit(lambda fN, G, xv, lamv, av: pt.fused_scatter(
        grid, box, params, x_t, lam_t, act_t, fN, G_t=G, solve=False,
        xv=xv, lamv=lamv, av=av, lam_view_out=True))
    print(f"scatter2 (G): {timeit(sc2, fN1, G_t, xv, lamv2, av)*1e3:7.2f} ms")

    ga2 = jax.jit(lambda f, xv, lamv, av: pt.fused_gather(
        grid, box, params, x_t, lam_t, act_t, gN=f,
        xv=xv, lamv=lamv, av=av))
    print(f"gather2 (N only): {timeit(ga2, field, xv, lamv2, av)*1e3:7.2f} ms")

    reb = jax.jit(lambda pp: windowed.local_rebin(pp, grid, box))
    print(f"local_rebin: {timeit(reb, p)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
