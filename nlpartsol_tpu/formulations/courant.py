"""CFL time-step control (reference src/Formulations/Courant.c).

Δt = CFL · h / c_max with c the material celerity; the reference's
velocity-augmented variant (DynamicTimeStep) is off by default (Courant.c:14)
— provided here for completeness.
"""

from __future__ import annotations

import jax.numpy as jnp


def courant_dt(cfl: float, h: float, cel: float) -> float:
    """Static Δt (U_DeltaT__SolversLib__, Courant.c:6-56)."""
    return cfl * h / cel


def courant_dt_dynamic(cfl: float, h: float, cel: float, vel) -> jnp.ndarray:
    """Velocity-augmented Δt (the DynamicTimeStep branch)."""
    cmax = cel + jnp.max(jnp.abs(vel))
    return cfl * h / cmax


def celerity(E: float, rho: float) -> float:
    """1D elastic wave speed sqrt(E/ρ) (DeltaT_Coussy__SolversLib__ uses the
    mixture analog, Courant.c:60-145)."""
    import math

    return math.sqrt(E / rho)
