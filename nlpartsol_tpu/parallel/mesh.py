"""REPLICATED-GRID BASELINE FIXTURE — not the production backend.

The production distributed backend is ``parallel/domain.py`` (grid-domain
decomposition: sharded grid strips, ppermute halo exchange, seam particle
migration) plus ``parallel/multihost.py``.  This module is kept ONLY as the
simplest-possible oracle for it: particles sharded over a 1-D mesh axis
``'p'`` with the background grid fully REPLICATED (the direct analog of the
reference's OpenMP particle loops, SURVEY.md §2.9).  The single collective
is a ``psum`` of the P2G scatter over the replicated grid, so its output is
trivially equal to the single-device step — which is exactly what makes it
a useful cross-check for the domain-decomposed engine in
``tests/test_parallel.py``.  It does not scale to grids too large to
replicate; do not build features on it — use ``domain.py``.
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
