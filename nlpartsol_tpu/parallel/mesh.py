"""Device-mesh parallelism for the MPM pipeline.

Reference parallelism (SURVEY.md §2.9): OpenMP threads + sequential PETSc —
no multi-device story at all.  The TPU-native decomposition implemented
here:

* **particle data parallelism** (this module): particles are sharded over
  the mesh axis ``'p'``; the background grid vectors are replicated.  All
  particle-local work (shape functions, kinematics, constitutive — the
  overwhelming FLOP share) is embarrassingly parallel; the single collective
  seam is the P2G scatter, combined with an ``psum`` over ICI
  (ops/sparse.py).  G2P is a local gather from the replicated grid.
* grid-domain (block-row) partitioning with halo exchange is the planned
  second axis for grids too large to replicate (SURVEY.md §7 step 7).

Everything rides ``jax.sharding.Mesh`` + ``shard_map``; the same code runs
on one chip (axis absent) or N chips.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..types import Particles

PARTICLE_AXIS = "p"


def make_mesh(n_devices: int = None, devices=None) -> Mesh:
    """1-D device mesh over the particle axis."""
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devices), (PARTICLE_AXIS,))


def pad_particles(p: Particles, multiple: int) -> Particles:
    """Pad the particle set so Np divides the mesh axis; padding is inactive."""
    n = p.count
    rem = (-n) % multiple
    if rem == 0:
        return p

    def pad(arr):
        pad_width = [(0, rem)] + [(0, 0)] * (arr.ndim - 1)
        return jnp.pad(arr, pad_width)

    padded = jax.tree_util.tree_map(pad, p)
    active = padded.active.at[n:].set(False)
    # keep padded particles inside the grid (position 0 is always in-domain)
    return padded.replace(active=active)


def sharded_explicit(mesh: Mesh, cfg):
    """shard_map'd explicit step: particles sharded, grid replicated."""
    from jax import shard_map

    from ..formulations.explicit import explicit_step

    pspec = P(PARTICLE_AXIS)
    rep = P()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(pspec, rep, rep, rep),
        out_specs=(pspec, rep),
        check_vma=True,
    )
    def step(p, grid, mats, body_accel):
        return explicit_step(p, grid, mats, cfg, body_accel)

    return step


def sharded_implicit(mesh: Mesh, cfg):
    """shard_map'd implicit Newmark step.

    Grid vectors (and the whole Newton-CG solve) are replicated — every
    device redundantly runs the identical CG on the psum'd residual, which
    is bitwise-consistent and avoids a second collective per CG iteration.
    """
    from jax import shard_map

    from ..formulations.implicit import implicit_step

    pspec = P(PARTICLE_AXIS)
    rep = P()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(pspec, rep, rep, rep),
        out_specs=(pspec, rep),
        check_vma=True,
    )
    def step(p, grid, mats, body_accel):
        return implicit_step(p, grid, mats, cfg, body_accel)

    return step
