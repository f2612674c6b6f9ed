"""Shared step machinery: shape-function dispatch + transfer-engine build."""

from __future__ import annotations

from ..ops import transfer
from ..shapefun import alme, fem, femesh, gimp, lme


def shapefun_eval(cfg, grid, p):
    """Evaluate the configured shape functions.  Returns (sf dict,
    offsets (K, d) static numpy array)."""
    if isinstance(grid, femesh.FEMesh):
        # unstructured T3/Q4/T4/H8 background mesh: isoparametric elements
        # or meshfree LME over the node cloud (window offsets are
        # meaningless — the ScatterEngine routes P2G/G2P through the
        # per-particle node_ids pattern; the binned fast path stages
        # candidates by static bin shifts instead, ops/binpair.py)
        if cfg.shapefun == "fem":
            return femesh.evaluate(grid, p.x), None
        if cfg.shapefun == "lme":
            if cfg.transfer == "binned":
                return (
                    femesh.evaluate_lme_binned(
                        grid, p.x, p.lme_lambda, p.active, cfg.lme_params,
                        cfg.active_box,
                    ),
                    None,
                )
            return femesh.evaluate_lme(grid, p.x, p.lme_lambda, cfg.lme_params), None
        raise ValueError(
            "unstructured background meshes support shapefun='fem' or 'lme'"
        )
    if cfg.shapefun == "lme":
        sf = lme.evaluate(grid, p.x, p.lme_lambda, cfg.lme_params)
        return sf, lme.offsets_for(grid.dim, cfg.lme_params)
    if cfg.shapefun == "fem":
        return fem.evaluate(grid, p.x), fem.offsets_for(grid.dim)
    if cfg.shapefun == "gimp":
        lp = gimp.voxel_halfwidth(p.vol0, grid.dim)
        return gimp.evaluate(grid, p.x, lp), gimp.offsets_for(grid.dim)
    if cfg.shapefun == "alme":
        sf = alme.evaluate(grid, p.x, p.lme_lambda, p.lme_beta, cfg.alme_params)
        return sf, alme.offsets_for(grid.dim, cfg.alme_params)
    raise ValueError(f"unknown shapefun {cfg.shapefun}")


def make_engine(cfg, grid, sf, offsets, mask):
    if cfg.transfer == "pallas":
        # Steps that dispatch to fused-Pallas kernels do so BEFORE calling
        # make_engine (explicit/implicit _*_step_pallas); any step reaching
        # here with 'pallas' has no fused path — falling through to the
        # ScatterEngine would be silently WRONG under halo sharding (its
        # psum over the grid axis would sum different local strips as if
        # the grid were replicated).  Fail loudly instead.
        raise ValueError(
            f"{type(cfg).__name__} has no fused-pallas transfer path; use "
            "transfer='windowed' (same physics, XLA slot-layout engine)"
        )
    if cfg.transfer == "windowed":
        if cfg.active_box is None:
            raise ValueError("windowed transfer requires cfg.active_box")
        if getattr(cfg, "halo", None) is not None:
            # block-partitioned grid strip with ppermute halo exchange
            # (parallel/domain.py); grid/active_box are the LOCAL templates
            return transfer.HaloEngine(grid, cfg.active_box, offsets, mask, cfg.halo)
        return transfer.WindowedEngine(grid, cfg.active_box, offsets, mask, cfg.axis_name)
    if cfg.transfer == "binned":
        from ..ops.binpair import BinPairEngine

        if not isinstance(grid, femesh.FEMesh) or cfg.shapefun != "lme":
            raise ValueError(
                "binned transfer is the meshfree-LME fast path on FEMesh "
                "node clouds (shapefun='lme')"
            )
        if cfg.active_box is None:
            raise ValueError("binned transfer requires cfg.active_box "
                             "(femesh.bin_box)")
        return BinPairEngine(grid, cfg.active_box, mask)
    return transfer.ScatterEngine(grid, sf["node_ids"], mask, cfg.axis_name)


def found_lost(sf, act):
    """Particles an unstructured FEMesh could not locate (``found`` flag,
    shapefun/femesh.py) — counted into the ``lost`` diagnostic so
    run_simulation's loud-loss check fires instead of silently freezing."""
    import jax.numpy as jnp

    if sf.get("found") is not None:
        return jnp.sum(act & ~sf["found"], dtype=jnp.int32)
    return jnp.zeros((), jnp.int32)
