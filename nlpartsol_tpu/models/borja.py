"""Borja (2003) frictional family: Matsuoka-Nakai / Lade-Duncan yield with
monolithic Newton return mapping in principal space.

Reference: /root/reference/nl-partsol/src/Constitutive/Plasticity/
{Matsuoka-Nakai,Lade-Duncan}.c (and the development harnesses in
scripts/Borja-Constitutive-Models/).

Implemented in this round as a later milestone; the dispatcher wiring and
parameter plumbing are already in place.
"""

from __future__ import annotations

from typing import NamedTuple

import jax


class BorjaOut(NamedTuple):
    tau: jax.Array
    tau_zz: jax.Array
    be: jax.Array
    be_zz: jax.Array
    eps: jax.Array
    kappa: jax.Array
    W: jax.Array
    C_ep: jax.Array


def borja_frictional(be, be_zz, DF, eps, kappa, *, yield_kind, **params) -> BorjaOut:
    raise NotImplementedError(
        "Borja frictional models (Matsuoka-Nakai / Lade-Duncan) land with the "
        "3D soil-slope milestone; see SURVEY.md §7 step 4."
    )
