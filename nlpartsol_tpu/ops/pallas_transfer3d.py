"""Fused Pallas TPU kernels for the 3D LME particle↔grid transfers.

3D counterpart of ops/pallas_transfer.py (see that module's design notes);
replaces the H8-window XLA transfers for 3D runs (reference element analog:
/root/reference/nl-partsol/src/Nodes/H8.c).  Same storage-free design: the
LME basis (λ-Newton + N + ∇N; LME.c:272-353,700-891) is recomputed in VMEM
per pass and contracted immediately — no (Ns, K, …) edge tensors ever reach
HBM, which at K = (2w+1)³ = 343 (γ=3) matters even more than in 2D.

Two kernel layouts share the λ-Newton/moment numerics:

**rows** (`_Geom3`, round-3 original):

* lane axis (128-wide) = cell axis 2; in-kernel lane-offset folding with
  ``pltpu.roll`` turns the o2 window axis into per-(o0,o1) banks;
* sublane axis = R=8 cell rows along axis 1 × capacity C (flat row-major);
* program grid = c0 · ceil(c1/R): one program per (plane, row-block) — the
  o0 (plane) and o1 (row) window axes become K1² output banks combined by
  a static-slice XLA epilogue.

**merged** (`_Geom3M`, round-5 — the PERF.md §3D "merged-lane (c1·c2)"
layout): the rows layout pads the box's c2 ≈ 52 cells to 128 lanes (2.46×
dead lanes in EVERY basis sweep).  Here the lane axis carries BOTH lateral
cell axes, flattened with per-row guard columns: lane = r·S + c with
S = c2 + 2w, so an (o1, o2) window offset is a single in-lane
``pltpu.roll`` by (o1+w)·S + (o2+w) — the guard columns absorb the o2
range and the row stride turns o1 into an exact multiple.  Sublane =
R0 = 8//C planes × capacity; program grid = c0/R0; only the K1 o0 banks
remain for the XLA epilogue (vs K1² = 49).  Lane occupancy rises from
52/128 = 41 % to c1·c2/L ≈ 78 % and the sweep-element count halves.

The λ-Newton moment sweeps run statically unrolled over the RADIUS-CULLED
offset list (343 → 160 at γ=3, margin 0; offsets whose closest approach to
any particle position in the slot cell exceeds the support radius can never
contribute, so they are dropped at trace time — see _Geom3.trips).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..shapefun import lme as lme_mod
from ..types import Grid
from .vma import kernel_strip, out_struct
from . import windowed


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _offs(w: int):
    return list(range(-w, w + 1))


def _f(v):
    return jnp.asarray(v, jnp.float32) if not isinstance(v, (int, float)) else jnp.float32(v)


class _Geom3:
    R = 8  # cell rows (axis 1) per program

    def __init__(self, grid: Grid, box: windowed.ActiveBox, params: lme_mod.LMEParams,
                 margin: int = 0):
        assert grid.dim == 3
        self.h = grid.spacing
        self.beta = lme_mod.beta_of(params, grid.spacing)
        r_sup = lme_mod.support_radius(params, grid.spacing)
        self.r2max = r_sup * r_sup
        self.w = lme_mod.window_halfwidth(params, 1.0) + margin
        self.K1 = 2 * self.w + 1
        self.K = self.K1 ** 3
        self.c0, self.c1, self.c2 = box.cdims
        self.c2p = ((self.c2 + 127) // 128) * 128
        self.c2p2 = ((self.c2 + 2 * self.w + 127) // 128) * 128
        self.C = box.capacity
        self.nc = box.n_cells
        self.n0, self.n1, self.n2 = grid.dims
        self.o0b, self.o1b, self.o2b = box.offset
        self.c1p = ((self.c1 + self.R - 1) // self.R) * self.R
        self.nprog1 = self.c1p // self.R
        self.nprog = self.c0 * self.nprog1
        self.RC = self.R * self.C
        self.params = params
        self.margin = margin
        # radius culling (see pallas_transfer._Geom): offsets whose closest
        # approach to a particle (within ±(0.5+margin) cells of its slot
        # cell) exceeds the support radius can never contribute —
        # 343 → 160 offsets at γ=3 margin 0, a ~2.1× cut of every basis
        # sweep (the 3D kernels are sweep-bound, PERF.md)
        # asymmetric closest approach: see pallas_transfer._Geom
        def _md(o):
            return max(0.0, o - 1.0 - margin, -o - margin)

        rm = r_sup / grid.spacing
        self.trips = [
            (o0, o1, o2)
            for o0 in range(-self.w, self.w + 1)
            for o1 in range(-self.w, self.w + 1)
            for o2 in range(-self.w, self.w + 1)
            if _md(o0) ** 2 + _md(o1) ** 2 + _md(o2) ** 2 <= rm * rm
        ]


def _row_iota3(g: _Geom3):
    return jax.lax.broadcasted_iota(jnp.int32, (g.RC, g.c2p), 0) // g.C


def _row_sum_matrix3(g: _Geom3):
    i = jax.lax.broadcasted_iota(jnp.int32, (g.R, g.RC), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (g.R, g.RC), 1)
    return (j // g.C == i).astype(jnp.float32)


def _row_rep_matrix3(g: _Geom3):
    i = jax.lax.broadcasted_iota(jnp.int32, (g.RC, g.R), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (g.RC, g.R), 1)
    return (i // g.C == j).astype(jnp.float32)


def _to_view3(g: _Geom3, a: jax.Array, ch: int) -> jax.Array:
    """(ch, C, nc) → (nprog, ch, RC, c2p)."""
    v = a.reshape(ch, g.C, g.c0, g.c1, g.c2)
    v = jnp.moveaxis(v, (2, 3), (0, 1))  # (c0, c1, ch, C, c2)
    v = jnp.pad(v, ((0, 0), (0, g.c1p - g.c1), (0, 0), (0, 0), (0, g.c2p - g.c2)))
    v = v.reshape(g.c0, g.nprog1, g.R, ch, g.C, g.c2p).transpose(0, 1, 3, 2, 4, 5)
    return v.reshape(g.nprog, ch, g.RC, g.c2p)


def _from_view3(g: _Geom3, v: jax.Array, ch: int) -> jax.Array:
    v = v.reshape(g.c0, g.nprog1, ch, g.R, g.C, g.c2p).transpose(0, 1, 3, 2, 4, 5)
    v = v.reshape(g.c0, g.c1p, ch, g.C, g.c2p)[:, : g.c1, :, :, : g.c2]
    return jnp.moveaxis(v, (0, 1), (2, 3)).reshape(ch, g.C, g.nc)


def _slot_spec3(g: _Geom3, ch: int):
    return pl.BlockSpec(
        (1, ch, g.RC, g.c2p), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )


# ---------------------------------------------------------------------------
# merged-lane geometry (round 5; PERF.md §3D)
# ---------------------------------------------------------------------------

# layout override: "auto" picks merged when its VMEM footprint fits,
# "rows"/"merged" force a layout (A/B benching; scripts/bench3d.py)
LAYOUT3D = os.environ.get("NLPS_3D_LAYOUT", "auto")


class _Geom3M:
    """Merged-lane geometry: lane = r·S + c over BOTH lateral cell axes
    (S = c2 + 2w row stride with built-in guard columns), sublane =
    R0 planes × capacity, one program per R0-plane slab."""

    def __init__(self, grid: Grid, box: windowed.ActiveBox, params: lme_mod.LMEParams,
                 margin: int = 0):
        assert grid.dim == 3
        self.h = grid.spacing
        self.beta = lme_mod.beta_of(params, grid.spacing)
        r_sup = lme_mod.support_radius(params, grid.spacing)
        self.r2max = r_sup * r_sup
        self.w = lme_mod.window_halfwidth(params, 1.0) + margin
        self.K1 = 2 * self.w + 1
        self.c0, self.c1, self.c2 = box.cdims
        self.C = box.capacity
        self.nc = box.n_cells
        self.n0, self.n1, self.n2 = grid.dims
        self.o0b, self.o1b, self.o2b = box.offset
        self.S = self.c2 + 2 * self.w          # merged-row stride
        self.Lin = self.c1 * self.S            # input slot lanes
        self.Lout = (self.c1 + 2 * self.w) * self.S
        self.L = ((self.Lout + 127) // 128) * 128
        self.R0 = max(1, 8 // self.C)          # planes per program
        self.Csub = self.R0 * self.C
        self.Csp = ((self.Csub + 7) // 8) * 8  # sublane-padded
        self.c0p = ((self.c0 + self.R0 - 1) // self.R0) * self.R0
        self.nprog = self.c0p // self.R0
        self.params = params
        self.margin = margin

        def _md(o):
            return max(0.0, o - 1.0 - margin, -o - margin)

        rm = r_sup / grid.spacing
        self.trips = [
            (o0, o1, o2)
            for o0 in range(-self.w, self.w + 1)
            for o1 in range(-self.w, self.w + 1)
            for o2 in range(-self.w, self.w + 1)
            if _md(o0) ** 2 + _md(o1) ** 2 + _md(o2) ** 2 <= rm * rm
        ]


def _use_merged(grid, box, params, margin) -> bool:
    """Pick the merged-lane layout when its per-program VMEM footprint
    fits; big boxes fall back to the rows layout (its per-program state is
    a single 128-lane strip, bounded regardless of box size)."""
    if LAYOUT3D == "rows":
        return False
    g = _Geom3M(grid, box, params, margin)
    if g.w > 4:
        return False  # gather plane staging assumes w ≤ 4
    if LAYOUT3D == "merged":
        return True
    # Mosaic keeps a few hundred sweep temps of (Csp, L) f32 live on the
    # kernel stack; measured total program VMEM: 96³ box (Csp·L = 8·3456)
    # fits under the raised _VMEM_LIMIT, 128³ (8·5504) needs 157 MB > the
    # 128 MB physical VMEM.  Calibrated gate: Csp·L at most ~1.25× the
    # measured-good point; larger boxes use the rows layout (bounded
    # per-program footprint)
    return g.Csp * g.L <= 8 * 4352


# per-kernel VMEM cap for the merged layout (v5e/v5p have 128 MB VMEM;
# the default 16 MB scoped limit is sized for small-footprint kernels)
_VMEM_LIMIT = 100 * 2**20


def _to_view3m(g: _Geom3M, a: jax.Array, ch: int) -> jax.Array:
    """(ch, C, nc) → (nprog, ch, Csp, L); lane = r·S + c."""
    v = a.reshape(ch, g.C, g.c0, g.c1, g.c2)
    v = jnp.pad(v, ((0, 0), (0, 0), (0, g.c0p - g.c0), (0, 0),
                    (0, g.S - g.c2)))
    v = v.reshape(ch, g.C, g.c0p, g.c1 * g.S)
    v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, g.L - g.c1 * g.S)))
    v = v.transpose(2, 0, 1, 3).reshape(g.nprog, g.R0, ch, g.C, g.L)
    v = v.transpose(0, 2, 1, 3, 4).reshape(g.nprog, ch, g.Csub, g.L)
    if g.Csp > g.Csub:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, g.Csp - g.Csub), (0, 0)))
    return v


def _from_view3m(g: _Geom3M, v: jax.Array, ch: int) -> jax.Array:
    v = v[:, :, : g.Csub, :].reshape(g.nprog, ch, g.R0, g.C, g.L)
    v = v.transpose(0, 2, 1, 3, 4).reshape(g.c0p, ch, g.C, g.L)
    v = v[: g.c0, :, :, : g.c1 * g.S].reshape(g.c0, ch, g.C, g.c1, g.S)
    v = v[..., : g.c2]
    return jnp.moveaxis(v, 0, 2).reshape(ch, g.C, g.nc)


def _slot_spec3m(g: _Geom3M, ch: int):
    return pl.BlockSpec(
        (1, ch, g.Csp, g.L), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )


def _terms3m(g: _Geom3M, x0, x1, x2, act, p, vlo=None, vhi=None,
             vlo1=None, vhi1=None, vlo2=None, vhi2=None):
    """rel / valid closures for the merged layout: slot coordinates are
    decoded from (sublane, lane) as plane = p·R0 + sub//C, row = lane//S,
    col = lane%S (padding slots carry act = 0)."""
    h = g.h
    lane = jax.lax.broadcasted_iota(jnp.int32, x0.shape, 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, x0.shape, 0)
    plane = p * g.R0 + sub // g.C
    row = lane // g.S
    col = lane - row * g.S
    planef = plane.astype(jnp.float32)
    rowf = row.astype(jnp.float32)
    colf = col.astype(jnp.float32)

    def rel(o0, o1, o2):
        n0 = (planef + _f(g.o0b) + _f(o0)) * h
        n1 = (rowf + _f(g.o1b) + _f(o1)) * h
        n2 = (colf + _f(g.o2b) + _f(o2)) * h
        return x0 - n0, x1 - n1, x2 - n2

    lo0 = 0 if vlo is None else vlo
    hi0 = g.n0 - 1 if vhi is None else vhi
    lo1 = 0 if vlo1 is None else vlo1
    hi1 = g.n1 - 1 if vhi1 is None else vhi1
    lo2 = 0 if vlo2 is None else vlo2
    hi2 = g.n2 - 1 if vhi2 is None else vhi2

    def valid(o0, o1, o2):
        i0 = plane + g.o0b + o0
        i1 = row + g.o1b + o1
        i2 = col + g.o2b + o2
        return (
            act
            & (i0 >= lo0) & (i0 <= hi0)
            & (i1 >= lo1) & (i1 <= hi1)
            & (i2 >= lo2) & (i2 <= hi2)
        )

    return rel, valid


def _cap_sum_matrix3m(g: _Geom3M):
    """(R0, Csp) 0/1: sums the C capacity sublanes of each plane."""
    i = jax.lax.broadcasted_iota(jnp.int32, (g.R0, g.Csp), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (g.R0, g.Csp), 1)
    return ((j // g.C == i) & (j < g.Csub)).astype(jnp.float32)


def _inv3_damped(j00, j01, j02, j11, j12, j22):
    """Damped closed-form symmetric 3×3 inverse (LME Hessian solve;
    replaces the rcond<1e-8 abort, LME.c:308-313).  Returns the 6 unique
    inverse entries."""
    tr = j00 + j11 + j22
    eps = 1e-10 * jnp.maximum(tr, 1e-30)
    j00 = j00 + eps
    j11 = j11 + eps
    j22 = j22 + eps
    a00 = j11 * j22 - j12 * j12
    a01 = -(j01 * j22 - j02 * j12)
    a02 = j01 * j12 - j02 * j11
    a11 = j00 * j22 - j02 * j02
    a12 = -(j00 * j12 - j01 * j02)
    a22 = j00 * j11 - j01 * j01
    det = j00 * a00 + j01 * a01 + j02 * a02
    det = jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    inv = 1.0 / det
    return a00 * inv, a01 * inv, a02 * inv, a11 * inv, a12 * inv, a22 * inv


def _terms3(g: _Geom3, x0, x1, x2, act, pz, cy, vlo=None, vhi=None,
            vlo1=None, vhi1=None, vlo2=None, vhi2=None):
    """rel / valid closures over a window offset (static or traced).
    ``vlo``/``vhi`` bound valid node planes along axis 0 (halo strips mask
    phantom planes beyond the global grid; parallel/domain.py)."""
    h = g.h
    lane = jax.lax.broadcasted_iota(jnp.int32, x0.shape, 1)
    lanef = lane.astype(jnp.float32)
    cyf = cy.astype(jnp.float32)
    pzf = _f(pz)

    def rel(o0, o1, o2):
        n0 = (pzf + _f(g.o0b) + _f(o0)) * h
        n1 = (cyf + _f(g.o1b) + _f(o1)) * h
        n2 = (lanef + _f(g.o2b) + _f(o2)) * h
        return x0 - n0, x1 - n1, x2 - n2

    lo0 = 0 if vlo is None else vlo
    hi0 = g.n0 - 1 if vhi is None else vhi
    lo1 = 0 if vlo1 is None else vlo1
    hi1 = g.n1 - 1 if vhi1 is None else vhi1
    lo2 = 0 if vlo2 is None else vlo2
    hi2 = g.n2 - 1 if vhi2 is None else vhi2

    def valid(o0, o1, o2):
        i0 = pz + g.o0b + o0
        i1 = cy + g.o1b + o1
        i2 = lane + g.o2b + o2
        return (
            act
            & (i0 >= lo0) & (i0 <= hi0)
            & (i1 >= lo1) & (i1 <= hi1)
            & (i2 >= lo2) & (i2 <= hi2)
        )

    return rel, valid


def _f_of(g: _Geom3, rel, valid, lam0, lam1, lam2):
    neg = jnp.float32(-1e30)

    def f_of(o0, o1, o2):
        r0, r1, r2 = rel(o0, o1, o2)
        sq = r0 * r0 + r1 * r1 + r2 * r2
        f = -g.beta * sq + lam0 * r0 + lam1 * r1 + lam2 * r2
        return jnp.where(valid(o0, o1, o2) & (sq <= g.r2max), f, neg)

    return f_of, neg


def _fmax_sweep(g, f_of, shape):
    neg = jnp.float32(-1e30)
    fmax = jnp.full(shape, neg, jnp.float32)
    for o0, o1, o2 in g.trips:
        fmax = jnp.maximum(fmax, f_of(o0, o1, o2))
    return fmax


def _lambda_newton3(g, rel, valid, shape, act, lam0, lam1, lam2):
    """Guarded in-kernel λ-Newton (LME.c:272-353 semantics): moment sweeps
    over the radius-culled offsets, damped closed-form Hessian solve.
    Layout-agnostic — ``rel``/``valid`` carry the slot geometry."""
    mx = g.params.max_iter
    tol2 = g.params.tol_lambda * g.params.tol_lambda * g.r2max

    def body(state):
        lam0, lam1, lam2, _, it = state
        f_of, neg = _f_of(g, rel, valid, lam0, lam1, lam2)
        fmax = _fmax_sweep(g, f_of, shape)

        def bk(tr, acc):
            o0, o1, o2 = tr
            f = f_of(o0, o1, o2)
            e = jnp.where(f > neg * 0.5, jnp.exp(f - fmax), 0.0)
            l0, l1, l2 = rel(o0, o1, o2)
            S0, S1_0, S1_1, S1_2, S00, S01, S02, S11, S12, S22 = acc
            return (
                S0 + e,
                S1_0 + e * l0, S1_1 + e * l1, S1_2 + e * l2,
                S00 + e * l0 * l0, S01 + e * l0 * l1, S02 + e * l0 * l2,
                S11 + e * l1 * l1, S12 + e * l1 * l2, S22 + e * l2 * l2,
            )

        zero = jnp.zeros(shape, jnp.float32)
        acc = (zero,) * 10
        for tr in g.trips:
            acc = bk(tr, acc)
        S0, S1_0, S1_1, S1_2, S00, S01, S02, S11, S12, S22 = acc
        Zs = jnp.maximum(S0, 1e-30)
        r0 = S1_0 / Zs
        r1 = S1_1 / Zs
        r2 = S1_2 / Zs
        j00 = S00 / Zs - r0 * r0
        j01 = S01 / Zs - r0 * r1
        j02 = S02 / Zs - r0 * r2
        j11 = S11 / Zs - r1 * r1
        j12 = S12 / Zs - r1 * r2
        j22 = S22 / Zs - r2 * r2
        i00, i01, i02, i11, i12, i22 = _inv3_damped(
            j00, j01, j02, j11, j12, j22
        )
        live = act & (S0 > 0.0)
        rn2 = jnp.where(live, r0 * r0 + r1 * r1 + r2 * r2, 0.0)
        conv = rn2 <= tol2
        lam0 = jnp.where(conv, lam0, lam0 - (i00 * r0 + i01 * r1 + i02 * r2))
        lam1 = jnp.where(conv, lam1, lam1 - (i01 * r0 + i11 * r1 + i12 * r2))
        lam2 = jnp.where(conv, lam2, lam2 - (i02 * r0 + i12 * r1 + i22 * r2))
        return lam0, lam1, lam2, jnp.all(conv), it + jnp.int32(1)

    def cond(state):
        return jnp.logical_not(state[3]) & (state[4] < mx)

    # kernel_strip: see pallas_transfer.py / ops/vma.py
    lam0, lam1, lam2, _, _ = jax.lax.while_loop(
        cond, body,
        (kernel_strip(lam0), kernel_strip(lam1), kernel_strip(lam2),
         jnp.asarray(False), jnp.int32(0)),
    )
    return lam0, lam1, lam2


def _norm_moments3(g, rel, e_of, Zs, shape):
    """r and J⁻¹ moments of the normalised basis (LME.c:766,795) — the
    ∇N ingredients shared by both kernel layouts."""
    zero = jnp.zeros(shape, jnp.float32)
    acc9 = (zero,) * 9
    for o0_, o1_, o2_ in g.trips:
        p = e_of(o0_, o1_, o2_) / Zs
        l0, l1, l2 = rel(o0_, o1_, o2_)
        (r0, r1, r2, S00, S01, S02, S11, S12, S22) = acc9
        acc9 = (
            r0 + p * l0, r1 + p * l1, r2 + p * l2,
            S00 + p * l0 * l0, S01 + p * l0 * l1, S02 + p * l0 * l2,
            S11 + p * l1 * l1, S12 + p * l1 * l2, S22 + p * l2 * l2,
        )
    r0, r1, r2, S00, S01, S02, S11, S12, S22 = acc9
    i00, i01, i02, i11, i12, i22 = _inv3_damped(
        S00 - r0 * r0, S01 - r0 * r1, S02 - r0 * r2,
        S11 - r1 * r1, S12 - r1 * r2, S22 - r2 * r2,
    )
    return (r0, r1, r2), (i00, i01, i02, i11, i12, i22)


# ---------------------------------------------------------------------------
# scatter
# ---------------------------------------------------------------------------


def _make_scatter_kernel3(g: _Geom3, cN: int, has_G: bool, solve: bool,
                          gnorm: bool = False):
    w, K1 = g.w, g.K1
    cout = cN + (3 if has_G else 0) + (1 if gnorm else 0)
    need_dn = has_G or gnorm

    def kernel(vb_ref, x_ref, lam_ref, act_ref, fN_ref, G_ref, out_ref,
               lam_out_ref, cnt_ref):
        i = pl.program_id(0)
        pz = i // g.nprog1
        iy = i % g.nprog1
        x0 = x_ref[0, 0]
        x1 = x_ref[0, 1]
        x2 = x_ref[0, 2]
        act = act_ref[0, 0] > 0.5
        lam0 = lam_ref[0, 0]
        lam1 = lam_ref[0, 1]
        lam2 = lam_ref[0, 2]
        cy = iy * g.R + _row_iota3(g)
        rel, valid = _terms3(g, x0, x1, x2, act, pz, cy,
                             vlo=vb_ref[0, 0], vhi=vb_ref[0, 1],
                             vlo1=vb_ref[0, 2], vhi1=vb_ref[0, 3],
                             vlo2=vb_ref[0, 4], vhi2=vb_ref[0, 5])
        sel = _row_sum_matrix3(g)
        shape = x0.shape

        if solve:
            lam0, lam1, lam2 = _lambda_newton3(
                g, rel, valid, shape, act, lam0, lam1, lam2
            )
        lam_out_ref[0, 0] = lam0
        lam_out_ref[0, 1] = lam1
        lam_out_ref[0, 2] = lam2

        # converged-basis passes: fmax, then Z + edge count
        f_of, neg = _f_of(g, rel, valid, lam0, lam1, lam2)
        fmax = _fmax_sweep(g, f_of, shape)

        zero = jnp.zeros(shape, jnp.float32)
        Z, cnt = zero, zero
        for o0, o1, o2 in g.trips:
            f = f_of(o0, o1, o2)
            e = jnp.where(f > neg * 0.5, jnp.exp(f - fmax), 0.0)
            Z = Z + e
            cnt = cnt + (e > 0.0).astype(jnp.float32)
        Zs = jnp.maximum(Z, 1e-30)
        total = jnp.sum(cnt)
        onehot = (
            (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0)
            & (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == 0)
        )
        cnt_ref[0] = jnp.where(onehot, total, 0.0)

        def e_of(o0, o1, o2):
            f = f_of(o0, o1, o2)
            return jnp.where(f > neg * 0.5, jnp.exp(f - fmax), 0.0)

        if need_dn:
            (r0, r1, r2), (i00, i01, i02, i11, i12, i22) = _norm_moments3(
                g, rel, e_of, Zs, shape
            )
        if has_G:
            g00, g01, g02 = G_ref[0, 0], G_ref[0, 1], G_ref[0, 2]
            g10, g11, g12 = G_ref[0, 3], G_ref[0, 4], G_ref[0, 5]
            g20, g21, g22 = G_ref[0, 6], G_ref[0, 7], G_ref[0, 8]

        lanepad = g.c2p2 - g.c2p
        # contraction sweep (unrolled: static roll shifts + bank stores)
        for o0 in _offs(w):
            for o1 in _offs(w):
                acc = [jnp.zeros((g.R, g.c2p2), jnp.float32) for _ in range(cout)]
                for o2 in [c for (a, b, c) in g.trips if a == o0 and b == o1]:
                    N_k = e_of(o0, o1, o2) / Zs
                    shift = o2 + w
                    for c in range(cN):
                        rows = jnp.dot(sel, N_k * fN_ref[0, c],
                                       preferred_element_type=jnp.float32)
                        rows = jnp.pad(rows, ((0, 0), (0, lanepad)))
                        acc[c] = acc[c] + pltpu.roll(rows, shift, 1)
                    if need_dn:
                        l0, l1, l2 = rel(o0, o1, o2)
                        a0 = l0 - r0
                        a1 = l1 - r1
                        a2 = l2 - r2
                        dn0 = -N_k * (i00 * a0 + i01 * a1 + i02 * a2)
                        dn1 = -N_k * (i01 * a0 + i11 * a1 + i12 * a2)
                        dn2 = -N_k * (i02 * a0 + i12 * a1 + i22 * a2)
                        extra = []
                        if has_G:
                            extra += [
                                (cN, g00 * dn0 + g01 * dn1 + g02 * dn2),
                                (cN + 1, g10 * dn0 + g11 * dn1 + g12 * dn2),
                                (cN + 2, g20 * dn0 + g21 * dn1 + g22 * dn2),
                            ]
                        if gnorm:
                            extra += [(cout - 1,
                                       fN_ref[0, cN - 1]
                                       * (dn0 * dn0 + dn1 * dn1 + dn2 * dn2))]
                        for c, v in extra:
                            rows = jnp.dot(sel, v, preferred_element_type=jnp.float32)
                            rows = jnp.pad(rows, ((0, 0), (0, lanepad)))
                            acc[c] = acc[c] + pltpu.roll(rows, shift, 1)
                bank = (o0 + w) * K1 + (o1 + w)
                for c in range(cout):
                    out_ref[0, :, bank * cout + c, :] = acc[c]

    return kernel


def _make_scatter_kernel3m(g: _Geom3M, cN: int, has_G: bool, solve: bool,
                           gnorm: bool = False):
    w, S = g.w, g.S
    cout = cN + (3 if has_G else 0) + (1 if gnorm else 0)
    need_dn = has_G or gnorm

    def kernel(vb_ref, x_ref, lam_ref, act_ref, fN_ref, G_ref, out_ref,
               lam_out_ref, cnt_ref):
        p = pl.program_id(0)
        x0 = x_ref[0, 0]
        x1 = x_ref[0, 1]
        x2 = x_ref[0, 2]
        act = act_ref[0, 0] > 0.5
        lam0 = lam_ref[0, 0]
        lam1 = lam_ref[0, 1]
        lam2 = lam_ref[0, 2]
        rel, valid = _terms3m(g, x0, x1, x2, act, p,
                              vlo=vb_ref[0, 0], vhi=vb_ref[0, 1],
                              vlo1=vb_ref[0, 2], vhi1=vb_ref[0, 3],
                              vlo2=vb_ref[0, 4], vhi2=vb_ref[0, 5])
        shape = x0.shape

        if solve:
            lam0, lam1, lam2 = _lambda_newton3(
                g, rel, valid, shape, act, lam0, lam1, lam2
            )
        lam_out_ref[0, 0] = lam0
        lam_out_ref[0, 1] = lam1
        lam_out_ref[0, 2] = lam2

        f_of, neg = _f_of(g, rel, valid, lam0, lam1, lam2)
        fmax = _fmax_sweep(g, f_of, shape)

        zero = jnp.zeros(shape, jnp.float32)
        Z, cnt = zero, zero
        for o0, o1, o2 in g.trips:
            f = f_of(o0, o1, o2)
            e = jnp.where(f > neg * 0.5, jnp.exp(f - fmax), 0.0)
            Z = Z + e
            cnt = cnt + (e > 0.0).astype(jnp.float32)
        Zs = jnp.maximum(Z, 1e-30)
        total = jnp.sum(cnt)
        onehot = (
            (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0)
            & (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == 0)
        )
        cnt_ref[0] = jnp.where(onehot, total, 0.0)

        def e_of(o0, o1, o2):
            f = f_of(o0, o1, o2)
            return jnp.where(f > neg * 0.5, jnp.exp(f - fmax), 0.0)

        if need_dn:
            (r0, r1, r2), (i00, i01, i02, i11, i12, i22) = _norm_moments3(
                g, rel, e_of, Zs, shape
            )
        if has_G:
            g00, g01, g02 = G_ref[0, 0], G_ref[0, 1], G_ref[0, 2]
            g10, g11, g12 = G_ref[0, 3], G_ref[0, 4], G_ref[0, 5]
            g20, g21, g22 = G_ref[0, 6], G_ref[0, 7], G_ref[0, 8]

        sel = _cap_sum_matrix3m(g)
        # contraction sweep: one K1-bank per o0 plane offset; (o1, o2)
        # fold into a SINGLE in-lane roll by s = (o1+w)·S + (o2+w) — the
        # merged layout's whole point (guard columns absorb o2, the row
        # stride turns o1 into an exact lane multiple).  The rolls are
        # CHAINED on the accumulator (trips in descending-s order:
        # acc ← roll(acc, s_prev − s) + v, final roll by s_min), because
        # Mosaic's stack allocator keeps every independent roll temp live
        # across an unrolled loop — N independent rolls of (R0, L) blew
        # the 16 MB scoped-VMEM limit at 96³ (36.8 MB observed); the chain
        # keeps O(1) buffers per channel
        for o0 in _offs(w):
            bank = o0 + w
            sub = sorted(
                [(b, c) for (a, b, c) in g.trips if a == o0],
                key=lambda t: -((t[0] + w) * S + (t[1] + w)),
            )
            if not sub:
                for c in range(cout):
                    out_ref[0, :, bank * cout + c, :] = jnp.zeros(
                        (g.R0, g.L), jnp.float32
                    )
                continue
            acc = [None] * cout
            s_prev = None
            for o1, o2 in sub:
                s = (o1 + w) * S + (o2 + w)
                N_k = e_of(o0, o1, o2) / Zs
                vals = [(c, N_k * fN_ref[0, c]) for c in range(cN)]
                if need_dn:
                    l0, l1, l2 = rel(o0, o1, o2)
                    a0 = l0 - r0
                    a1 = l1 - r1
                    a2 = l2 - r2
                    dn0 = -N_k * (i00 * a0 + i01 * a1 + i02 * a2)
                    dn1 = -N_k * (i01 * a0 + i11 * a1 + i12 * a2)
                    dn2 = -N_k * (i02 * a0 + i12 * a1 + i22 * a2)
                    if has_G:
                        vals += [
                            (cN, g00 * dn0 + g01 * dn1 + g02 * dn2),
                            (cN + 1, g10 * dn0 + g11 * dn1 + g12 * dn2),
                            (cN + 2, g20 * dn0 + g21 * dn1 + g22 * dn2),
                        ]
                    if gnorm:
                        vals += [(cout - 1,
                                  fN_ref[0, cN - 1]
                                  * (dn0 * dn0 + dn1 * dn1 + dn2 * dn2))]
                delta = None if s_prev is None else s_prev - s
                for c, v in vals:
                    rows = jnp.dot(sel, v, preferred_element_type=jnp.float32)
                    if acc[c] is None:
                        acc[c] = rows
                    else:
                        acc[c] = pltpu.roll(acc[c], delta, 1) + rows
                s_prev = s
            for c in range(cout):
                out_ref[0, :, bank * cout + c, :] = (
                    pltpu.roll(acc[c], s_prev, 1) if s_prev else acc[c]
                )

    return kernel


def _fold_mat_np(n: int, K1: int, dtype):
    """(n + K1 − 1, n·K1) one-hot overlap-add: q = b + k diagonal sums
    ride the MXU (the round-4 DUS-epilogue fix; PERF.md §3D)."""
    q = np.arange(n + K1 - 1)[:, None]
    b = np.arange(n)[None, :, None]
    k = np.arange(K1)[None, None, :]
    return jnp.asarray((q[..., None] == (b + k)).reshape(n + K1 - 1, n * K1),
                       dtype)


def _scatter_pallas3m(g: _Geom3M, grid, box, params, x_t, lam_t, act_t, fN_t,
                      G_t, solve, margin, gnorm, valid_lo, valid_hi,
                      xv, lamv, av, lam_view_out):
    from .pallas_transfer import _valid_bounds, _vb_spec

    cN = fN_t.shape[0]
    has_G = G_t is not None
    cout = cN + (3 if has_G else 0) + (1 if gnorm else 0)
    dt = x_t.dtype
    vb = _valid_bounds(None, valid_lo, valid_hi, dims=(g.n0, g.n1, g.n2))
    if xv is None:
        org = jnp.asarray(grid.origin, dt)
        xv = _to_view3m(g, x_t - org[:, None, None], 3)
    if lamv is None:
        lamv = _to_view3m(g, lam_t, 3)
    if av is None:
        av = _to_view3m(g, act_t, 1)
    fNv = _to_view3m(g, fN_t, cN)
    Gv = (
        _to_view3m(g, G_t, 9)
        if has_G
        else jnp.zeros((g.nprog, 9, g.Csp, g.L), dt)
    )
    kernel = _make_scatter_kernel3m(g, cN, has_G, solve, gnorm)
    nb = g.K1 * cout
    out, lam_new, cnt = pl.pallas_call(
        kernel,
        grid=(g.nprog,),
        in_specs=[_vb_spec(3),
                  _slot_spec3m(g, 3), _slot_spec3m(g, 3), _slot_spec3m(g, 1),
                  _slot_spec3m(g, cN), _slot_spec3m(g, 9)],
        out_specs=[
            pl.BlockSpec((1, g.R0, nb, g.L), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            _slot_spec3m(g, 3),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            out_struct((g.nprog, g.R0, nb, g.L), dt, x_t),
            out_struct((g.nprog, 3, g.Csp, g.L), dt, x_t),
            out_struct((g.nprog, 8, 128), jnp.float32, x_t),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=not _on_tpu(),
    )(vb, xv, lamv, av, fNv, Gv)

    # epilogue: only the K1 o0 banks remain — one one-hot fold across
    # planes, then the merged lane axis factors EXACTLY into the padded
    # (c1+2w, c2+2w) node box
    part = out.reshape(g.nprog * g.R0, g.K1, cout, g.L)[: g.c0]
    t0 = part.reshape(g.c0 * g.K1, cout * g.L)
    acc0 = (_fold_mat_np(g.c0, g.K1, dt) @ t0).reshape(
        g.c0 + 2 * g.w, cout, g.L
    )
    acc0 = acc0[:, :, : g.Lout].reshape(
        g.c0 + 2 * g.w, cout, g.c1 + 2 * g.w, g.S
    ).transpose(0, 2, 3, 1)  # (c0+2w, c1+2w, S, cout)
    nodes = jnp.zeros((g.n0, g.n1, g.n2, cout), dt)
    b0, b1, b2 = g.o0b - g.w, g.o1b - g.w, g.o2b - g.w
    l0, h0 = max(0, -b0), min(g.c0 + 2 * g.w, g.n0 - b0)
    l1, h1 = max(0, -b1), min(g.c1 + 2 * g.w, g.n1 - b1)
    l2, h2 = max(0, -b2), min(g.S, g.n2 - b2)
    if h0 > l0 and h1 > l1 and h2 > l2:
        nodes = nodes.at[
            b0 + l0 : b0 + h0, b1 + l1 : b1 + h1, b2 + l2 : b2 + h2, :
        ].set(acc0[l0:h0, l1:h1, l2:h2])
    if not lam_view_out:
        lam_new = _from_view3m(g, lam_new, 3)
    return (
        nodes.reshape(g.n0 * g.n1 * g.n2, cout),
        lam_new,
        jnp.sum(cnt[:, 0, 0]).astype(jnp.int32),
    )


def _xla_basis3(g: _Geom3, grid, box, params, x_t, lam_t, act_t, solve,
                valid_lo=None, valid_hi=None):
    """Widened-window 3D LME basis in plain XLA (non-TPU semantics oracle)."""
    from ..shapefun.window import window_offsets
    from . import tensor as tn

    x = from_channel_leading(x_t)
    lam0 = from_channel_leading(lam_t)
    act = from_channel_leading(act_t)[:, 0] > 0.5
    offs = window_offsets(3, -g.w, g.w)
    cells = jnp.asarray(windowed.slot_cells(box))
    multi = cells[:, None, :] + jnp.asarray(offs)[None, :, :]
    dims = jnp.asarray(grid.dims)
    inb = jnp.all((multi >= 0) & (multi < dims), axis=-1)
    if valid_lo is not None:
        vlo_a = jnp.asarray(valid_lo, jnp.int32).reshape(-1)
        inb = inb & (
            jnp.all(multi >= vlo_a, axis=-1)
            if vlo_a.shape[0] > 1
            else (multi[..., 0] >= vlo_a[0])
        )
    if valid_hi is not None:
        vhi_a = jnp.asarray(valid_hi, jnp.int32).reshape(-1)
        inb = inb & (
            jnp.all(multi <= vhi_a, axis=-1)
            if vhi_a.shape[0] > 1
            else (multi[..., 0] <= vhi_a[0])
        )
    node_pos = multi.astype(x.dtype) * g.h + jnp.asarray(grid.origin, x.dtype)
    rel = x[:, None, :] - node_pos
    sq = jnp.sum(rel * rel, axis=-1)
    mask = inb & (sq <= g.r2max) & act[:, None]
    if solve:
        lam = lme_mod.solve_lambda(rel, mask, lam0, g.beta, params)
    else:
        lam = lam0
    f = -g.beta * sq + jnp.einsum("pi,pki->pk", lam, rel)
    neg = jnp.asarray(-1e30, f.dtype)
    f = jnp.where(mask, f, neg)
    fmax = jnp.max(f, axis=-1, keepdims=True)
    e = jnp.where(mask, jnp.exp(f - fmax), 0.0)
    Z = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    N = e / Z
    r = jnp.einsum("pk,pki->pi", N, rel)
    J = jnp.einsum("pk,pki,pkj->pij", N, rel, rel) - r[:, :, None] * r[:, None, :]
    Jd = J + 1e-10 * tn.trace(J)[..., None, None] * jnp.eye(3, dtype=J.dtype)
    dN = -N[..., None] * jnp.einsum("pij,pkj->pki", tn.inv(Jd), rel - r[:, None, :])
    return offs, N, dN, mask, lam


def _scatter_xla3(grid, box, params, x_t, lam_t, act_t, fN_t, G_t, solve, margin,
                  gnorm=False, valid_lo=None, valid_hi=None):
    g = _Geom3(grid, box, params, margin)
    offs, N, dN, mask, lam = _xla_basis3(
        g, grid, box, params, x_t, lam_t, act_t, solve,
        valid_lo=valid_lo, valid_hi=valid_hi,
    )
    C, nc = box.capacity, box.n_cells
    cols = []
    fN = from_channel_leading(fN_t)
    cols.append(N[..., None] * fN[:, None, :])
    if G_t is not None:
        G = from_channel_leading(G_t).reshape(-1, 3, 3)
        cols.append(jnp.einsum("pij,pkj->pki", G, dN))
    if gnorm:
        s = fN[:, -1]
        cols.append((s[:, None] * jnp.sum(dN * dN, axis=-1))[..., None])
    vals = jnp.concatenate(cols, axis=-1)
    vals = jnp.where(mask[..., None], vals, 0.0)
    nodes = windowed.p2g(vals, box, grid, offs)
    nnz = jnp.sum(mask.astype(jnp.int32))
    return nodes, to_channel_leading(lam, C, nc), nnz


def _gather_xla3(grid, box, params, x_t, lam_t, act_t, gN, g_grad, margin,
                 valid_lo=None, valid_hi=None):
    g = _Geom3(grid, box, params, margin)
    offs, N, dN, mask, _ = _xla_basis3(
        g, grid, box, params, x_t, lam_t, act_t, solve=False,
        valid_lo=valid_lo, valid_hi=valid_hi,
    )
    Nm = jnp.where(mask, N, 0.0)
    outN = windowed.g2p(gN, Nm, box, grid, offs) if gN is not None else None
    grad = None
    if g_grad is not None:
        per_cell = windowed.cell_edge_field(g_grad, box, grid, offs)
        K = offs.shape[0]
        nc = box.n_cells
        u = jnp.broadcast_to(
            per_cell.reshape((1, nc, K, 3)), (box.capacity, nc, K, 3)
        ).reshape(box.n_slots, K, 3)
        dNm = jnp.where(mask[..., None], dN, 0.0)
        grad = jnp.einsum("pki,pkj->pij", u, dNm)
    return outN, grad


def _make_gather_kernel3m(g: _Geom3M, cN: int, has_grad: bool, cg: int,
                          base: int):
    w, S = g.w, g.S
    assert w <= 4, "window halfwidth > 4 needs more plane blocks"

    def kernel(vb_ref, x_ref, lam_ref, act_ref, pb0_ref, pb1_ref, pb2_ref,
               outN_ref, outG_ref, scr):
        p = pl.program_id(0)
        x0 = x_ref[0, 0]
        x1 = x_ref[0, 1]
        x2 = x_ref[0, 2]
        act = act_ref[0, 0] > 0.5
        lam0 = lam_ref[0, 0]
        lam1 = lam_ref[0, 1]
        lam2 = lam_ref[0, 2]
        rel, valid = _terms3m(g, x0, x1, x2, act, p,
                              vlo=vb_ref[0, 0], vhi=vb_ref[0, 1],
                              vlo1=vb_ref[0, 2], vhi1=vb_ref[0, 3],
                              vlo2=vb_ref[0, 4], vhi2=vb_ref[0, 5])
        shape = x0.shape
        f_of, neg = _f_of(g, rel, valid, lam0, lam1, lam2)
        fmax = _fmax_sweep(g, f_of, shape)

        Z = jnp.zeros(shape, jnp.float32)
        for o0, o1, o2 in g.trips:
            f = f_of(o0, o1, o2)
            Z = Z + jnp.where(f > neg * 0.5, jnp.exp(f - fmax), 0.0)
        Zs = jnp.maximum(Z, 1e-30)

        def e_of(o0, o1, o2):
            f = f_of(o0, o1, o2)
            return jnp.where(f > neg * 0.5, jnp.exp(f - fmax), 0.0)

        if has_grad:
            (r0, r1, r2), (i00, i01, i02, i11, i12, i22) = _norm_moments3(
                g, rel, e_of, Zs, shape
            )

        # stage 24 node planes in merged-lane layout
        scr[:, 0:8, :] = pb0_ref[...]
        scr[:, 8:16, :] = pb1_ref[...]
        scr[:, 16:24, :] = pb2_ref[...]
        rem = (p * g.R0 + base) % 8

        jj = jax.lax.broadcasted_iota(jnp.int32, (g.Csp, 24), 0) // g.C
        ll = jax.lax.broadcasted_iota(jnp.int32, (g.Csp, 24), 1)
        accN = [jnp.zeros(shape, jnp.float32) for _ in range(cN)]
        accG = [jnp.zeros(shape, jnp.float32) for _ in range(9)]
        for o0 in _offs(w):
            # broadcast each sublane's (plane + o0) node plane into its
            # capacity sublanes: one small 0/1 matmul per o0
            sel = (ll == rem + w + o0 + jj).astype(jnp.float32)
            rows = [jnp.dot(sel, scr[c], preferred_element_type=jnp.float32)
                    for c in range(cg)]
            # chained rolls (see the scatter kernel's note): the staged
            # node rows advance by the small delta between consecutive
            # shifts instead of one independent roll per trip
            s_prev = 0
            for o1, o2 in sorted(
                [(b, c) for (a, b, c) in g.trips if a == o0],
                key=lambda t: (t[0] + w) * S + (t[1] + w),
            ):
                shift = (o1 + w) * S + (o2 + w)
                delta = shift - s_prev
                if delta:
                    rows = [pltpu.roll(r_, g.L - delta, 1) for r_ in rows]
                s_prev = shift
                N_k = e_of(o0, o1, o2) / Zs
                if has_grad:
                    l0, l1, l2 = rel(o0, o1, o2)
                    a0 = l0 - r0
                    a1 = l1 - r1
                    a2 = l2 - r2
                    dn = (
                        -N_k * (i00 * a0 + i01 * a1 + i02 * a2),
                        -N_k * (i01 * a0 + i11 * a1 + i12 * a2),
                        -N_k * (i02 * a0 + i12 * a1 + i22 * a2),
                    )
                for c in range(cN):
                    accN[c] = accN[c] + N_k * rows[c]
                if has_grad:
                    for ui in range(3):
                        u = rows[cN + ui]
                        for vj in range(3):
                            accG[3 * ui + vj] = accG[3 * ui + vj] + u * dn[vj]
        if cN:
            for c in range(cN):
                outN_ref[0, c] = accN[c]
        else:
            outN_ref[0, 0] = jnp.zeros(shape, jnp.float32)
        for c in range(9):
            outG_ref[0, c] = accG[c]

    return kernel


def _gather_pallas3m(g: _Geom3M, grid, box, params, x_t, lam_t, act_t, gN,
                     g_grad, margin, valid_lo, valid_hi, xv, lamv, av):
    from .pallas_transfer import _valid_bounds, _vb_spec

    dt = x_t.dtype
    cN = 0 if gN is None else gN.shape[1]
    has_grad = g_grad is not None
    fields = ([] if gN is None else [gN]) + ([g_grad] if has_grad else [])
    cg = cN + (3 if has_grad else 0)
    if cg == 0:
        raise ValueError("nothing to gather")
    g_all = jnp.concatenate(fields, axis=1).reshape(g.n0, g.n1, g.n2, cg)

    # merged-lane node staging: plane q ↦ global plane q − ptf; lane
    # m = R·S + C₂ over node rows [o1b−w, o1b+c1+w) × cols [o2b−w, +S)
    ptf = max(0, g.w - g.o0b)
    base = g.o0b - g.w + ptf
    P = 8 * (((g.nprog - 1) * g.R0 + base) // 8 + 3)
    pf1 = max(0, g.w - g.o1b)
    pf2 = max(0, g.w - g.o2b)
    r_start = g.o1b - g.w + pf1
    c_start = g.o2b - g.w + pf2
    gp = jnp.pad(
        g_all,
        (
            (ptf, max(0, P - g.n0 - ptf)),
            (pf1, max(0, r_start + g.c1 + 2 * g.w - g.n1 - pf1)),
            (pf2, max(0, c_start + g.S - g.n2 - pf2)),
            (0, 0),
        ),
    )
    gm = gp[:P, r_start : r_start + g.c1 + 2 * g.w,
            c_start : c_start + g.S, :]
    gm = gm.reshape(P, g.Lout, cg)
    gm = jnp.pad(gm, ((0, 0), (0, g.L - g.Lout), (0, 0)))
    gm = jnp.moveaxis(gm, 2, 0)  # (cg, P, L)

    if xv is None:
        org = jnp.asarray(grid.origin, dt)
        xv = _to_view3m(g, x_t - org[:, None, None], 3)
    if lamv is None:
        lamv = _to_view3m(g, lam_t, 3)
    if av is None:
        av = _to_view3m(g, act_t, 1)

    def blk_spec(k):
        return pl.BlockSpec(
            (cg, 8, g.L),
            lambda i: (0, (i * g.R0 + base) // 8 + k, 0),
            memory_space=pltpu.VMEM,
        )

    vb = _valid_bounds(None, valid_lo, valid_hi, dims=(g.n0, g.n1, g.n2))
    kernel = _make_gather_kernel3m(g, cN, has_grad, cg, base)
    outN, outG = pl.pallas_call(
        kernel,
        grid=(g.nprog,),
        in_specs=[
            _vb_spec(3),
            _slot_spec3m(g, 3), _slot_spec3m(g, 3), _slot_spec3m(g, 1),
            blk_spec(0), blk_spec(1), blk_spec(2),
        ],
        out_specs=[_slot_spec3m(g, max(cN, 1)), _slot_spec3m(g, 9)],
        out_shape=[
            out_struct((g.nprog, max(cN, 1), g.Csp, g.L), dt, x_t),
            out_struct((g.nprog, 9, g.Csp, g.L), dt, x_t),
        ],
        scratch_shapes=[
            pltpu.VMEM((cg, 24, g.L), dt),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=not _on_tpu(),
    )(vb, xv, lamv, av, gm, gm, gm)

    ns = g.C * g.nc
    outN_r = (
        jnp.moveaxis(_from_view3m(g, outN, max(cN, 1)).reshape(max(cN, 1), ns),
                     0, 1)
        if cN
        else None
    )
    grad_r = (
        jnp.moveaxis(_from_view3m(g, outG, 9).reshape(9, ns), 0, 1)
        .reshape(ns, 3, 3)
        if has_grad
        else None
    )
    return outN_r, grad_r


# Test hook (mirrors pallas_transfer.FORCE_INTERPRET)
FORCE_INTERPRET = False


def make_views3(grid, box, params, x_t, lam_t, act_t, margin=0):
    """Kernel-layout views of the per-step-invariant slot arrays
    (positions origin-shifted, λ warm start, active mask) — compute ONCE
    per step and pass to every fused_scatter3/fused_gather3 call via
    xv/lamv/av.  The layout (rows vs merged-lane) is derived from the same
    (grid, box, params, margin) in every entry point, so cached views stay
    consistent across the step's transfer calls."""
    dt = x_t.dtype
    org = jnp.asarray(grid.origin, dt)
    if _use_merged(grid, box, params, margin):
        g = _Geom3M(grid, box, params, margin)
        return (
            _to_view3m(g, x_t - org[:, None, None], 3),
            _to_view3m(g, lam_t, 3),
            _to_view3m(g, act_t, 1),
        )
    g = _Geom3(grid, box, params, margin)
    return (
        _to_view3(g, x_t - org[:, None, None], 3),
        _to_view3(g, lam_t, 3),
        _to_view3(g, act_t, 1),
    )


def lam_from_view3(grid, box, params, lamv, margin=0):
    """Convert a view-layout λ (fused_scatter3 lam_view_out=True) back to
    the (3, C, nc) slot layout."""
    if _use_merged(grid, box, params, margin):
        return _from_view3m(_Geom3M(grid, box, params, margin), lamv, 3)
    g = _Geom3(grid, box, params, margin)
    return _from_view3(g, lamv, 3)


def fused_scatter3(
    grid: Grid,
    box: windowed.ActiveBox,
    params: lme_mod.LMEParams,
    x_t: jax.Array,     # (3, C, nc)
    lam_t: jax.Array,   # (3, C, nc)
    act_t: jax.Array,   # (1, C, nc)
    fN_t: jax.Array,    # (cN, C, nc)
    G_t: Optional[jax.Array] = None,  # (9, C, nc) row-major 3×3
    solve: bool = True,
    margin: int = 0,
    gnorm: bool = False,
    valid_lo=None,
    valid_hi=None,
    xv=None,
    lamv=None,
    av=None,
    lam_view_out: bool = False,
):
    """Fused 3D LME+P2G.  Returns (nodes (n_nodes, cout), lam (3, C, nc),
    nnz); cout = cN (+3 when G_t given; +1 when gnorm).

    ``xv``/``lamv``/``av``: kernel-layout views from :func:`make_views3`
    (cached across the step's transfer calls — the per-call relayouts
    were ~40 % of the traced 3D step).  ``lam_view_out`` keeps the solved
    λ in view layout (feed back via ``lamv``; convert once at step end
    with :func:`lam_from_view3`)."""
    if not _on_tpu() and not FORCE_INTERPRET:
        assert xv is None and lamv is None and av is None
        return _scatter_xla3(
            grid, box, params, x_t, lam_t, act_t, fN_t, G_t, solve, margin,
            gnorm, valid_lo=valid_lo, valid_hi=valid_hi,
        )
    if _use_merged(grid, box, params, margin):
        return _scatter_pallas3m(
            _Geom3M(grid, box, params, margin), grid, box, params,
            x_t, lam_t, act_t, fN_t, G_t, solve, margin, gnorm,
            valid_lo, valid_hi, xv, lamv, av, lam_view_out,
        )
    g = _Geom3(grid, box, params, margin)
    cN = fN_t.shape[0]
    has_G = G_t is not None
    cout = cN + (3 if has_G else 0) + (1 if gnorm else 0)
    dt = x_t.dtype

    from .pallas_transfer import _valid_bounds, _vb_spec

    vb = _valid_bounds(None, valid_lo, valid_hi, dims=(g.n0, g.n1, g.n2))
    if xv is None:
        org = jnp.asarray(grid.origin, dt)
        xv = _to_view3(g, x_t - org[:, None, None], 3)
    if lamv is None:
        lamv = _to_view3(g, lam_t, 3)
    if av is None:
        av = _to_view3(g, act_t, 1)
    fNv = _to_view3(g, fN_t, cN)
    # zero G: build the zero VIEW directly (27 MB of relayouted zeros
    # otherwise)
    Gv = (
        _to_view3(g, G_t, 9)
        if has_G
        else jnp.zeros((g.nprog, 9, g.RC, g.c2p), dt)
    )
    kernel = _make_scatter_kernel3(g, cN, has_G, solve, gnorm)
    nb = g.K1 * g.K1 * cout
    out, lam_new, cnt = pl.pallas_call(
        kernel,
        grid=(g.nprog,),
        in_specs=[_vb_spec(3),
                  _slot_spec3(g, 3), _slot_spec3(g, 3), _slot_spec3(g, 1),
                  _slot_spec3(g, cN), _slot_spec3(g, 9)],
        out_specs=[
            pl.BlockSpec((1, g.R, nb, g.c2p2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            _slot_spec3(g, 3),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            out_struct((g.nprog, g.R, nb, g.c2p2), dt, x_t),
            out_struct((g.nprog, 3, g.RC, g.c2p), dt, x_t),
            out_struct((g.nprog, 8, 128), jnp.float32, x_t),
        ],
        interpret=not _on_tpu(),
    )(vb, xv, lamv, av, fNv, Gv)

    # XLA epilogue: K1² (o0, o1) banks; lane axis already o2-folded.
    # Hierarchical DENSE pad+add folds instead of per-bank interior
    # .at[].add: the 49 dynamic-update-slices cost 28 ms/step at 96³
    # (traced round 4 — 75% of the whole step was XLA glue), while equal-
    # shape adds of zero-padded strips are plain bandwidth.
    W2 = min(g.c2 + 2 * g.w, g.c2p2)
    part = (
        out.reshape(g.c0, g.nprog1, g.R, g.K1 * g.K1, cout, g.c2p2)
        .reshape(g.c0, g.c1p, g.K1 * g.K1, cout, g.c2p2)[:, : g.c1, :, :, :W2]
        .reshape(g.c0, g.c1, g.K1, g.K1, cout, W2)
    )
    # overlap-add folds as ONE-HOT MATMULS (q = b + k diagonal sums): a
    # static 0/1 matrix contraction rides the MXU at full bandwidth where
    # both per-bank interior .at[].add (49 dynamic-update-slices, 28 ms)
    # and zero-pad sums (7+7 materialised pads, worse) crawl
    def fold_mat(n, K1):
        q = np.arange(n + 2 * g.w)[:, None]
        b = np.arange(n)[None, :, None]
        k = np.arange(K1)[None, None, :]
        return jnp.asarray(
            (q[..., None] == (b + k)).reshape(n + 2 * g.w, n * K1), dt
        )

    # fold o1: (c0, c1, K1₀, K1₁, cout, W2) → (c1+2w, c0, K1₀, cout, W2)
    t1 = part.transpose(1, 3, 0, 2, 4, 5).reshape(g.c1 * g.K1, -1)
    f1 = (fold_mat(g.c1, g.K1) @ t1).reshape(
        g.c1 + 2 * g.w, g.c0, g.K1, cout, W2
    )
    # fold o0: → (c0+2w, c1+2w, cout, W2)
    t0 = f1.transpose(1, 2, 0, 3, 4).reshape(g.c0 * g.K1, -1)
    acc0 = (fold_mat(g.c0, g.K1) @ t0).reshape(
        g.c0 + 2 * g.w, g.c1 + 2 * g.w, cout, W2
    )
    # embed once into the global node box (single static-slice add per axis
    # clip; plane/row/lane origins: box offset − w)
    nodes = jnp.zeros((g.n0, g.n1, g.n2, cout), dt)
    b0, b1, cb = g.o0b - g.w, g.o1b - g.w, g.o2b - g.w
    l0, h0 = max(0, -b0), min(g.c0 + 2 * g.w, g.n0 - b0)
    l1, h1 = max(0, -b1), min(g.c1 + 2 * g.w, g.n1 - b1)
    clo, chi = max(0, -cb), min(W2, g.n2 - cb)
    if h0 > l0 and h1 > l1 and chi > clo:
        nodes = nodes.at[
            b0 + l0 : b0 + h0, b1 + l1 : b1 + h1, cb + clo : cb + chi, :
        ].set(jnp.moveaxis(acc0[l0:h0, l1:h1, :, clo:chi], 2, 3))
    if not lam_view_out:
        lam_new = _from_view3(g, lam_new, 3)
    return (
        nodes.reshape(g.n0 * g.n1 * g.n2, cout),
        lam_new,
        jnp.sum(cnt[:, 0, 0]).astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# gather
# ---------------------------------------------------------------------------


def _make_gather_kernel3(g: _Geom3, cN: int, has_grad: bool, cg: int):
    w, K1 = g.w, g.K1
    assert w <= 4, "window halfwidth > 4 needs more plane/row blocks"

    def kernel(vb_ref, x_ref, lam_ref, act_ref,
               p0r0_ref, p0r1_ref, p1r0_ref, p1r1_ref, p2r0_ref, p2r1_ref,
               outN_ref, outG_ref, rows_scr):
        i = pl.program_id(0)
        pz = i // g.nprog1
        iy = i % g.nprog1
        x0 = x_ref[0, 0]
        x1 = x_ref[0, 1]
        x2 = x_ref[0, 2]
        act = act_ref[0, 0] > 0.5
        lam0 = lam_ref[0, 0]
        lam1 = lam_ref[0, 1]
        lam2 = lam_ref[0, 2]
        cy = iy * g.R + _row_iota3(g)
        rel, valid = _terms3(g, x0, x1, x2, act, pz, cy,
                             vlo=vb_ref[0, 0], vhi=vb_ref[0, 1],
                             vlo1=vb_ref[0, 2], vhi1=vb_ref[0, 3],
                             vlo2=vb_ref[0, 4], vhi2=vb_ref[0, 5])
        rep = _row_rep_matrix3(g)
        shape = x0.shape
        f_of, neg = _f_of(g, rel, valid, lam0, lam1, lam2)
        fmax = _fmax_sweep(g, f_of, shape)

        Z = jnp.zeros(shape, jnp.float32)
        for o0, o1, o2 in g.trips:
            f = f_of(o0, o1, o2)
            Z = Z + jnp.where(f > neg * 0.5, jnp.exp(f - fmax), 0.0)
        Zs = jnp.maximum(Z, 1e-30)

        def e_of(o0, o1, o2):
            f = f_of(o0, o1, o2)
            return jnp.where(f > neg * 0.5, jnp.exp(f - fmax), 0.0)

        if has_grad:
            (r0, r1, r2), (i00, i01, i02, i11, i12, i22) = _norm_moments3(
                g, rel, e_of, Zs, shape
            )

        # stage 24 planes × 16 rows of the padded node field
        rows_scr[:, 0:8, 0:8, :] = p0r0_ref[:, :, :, :]
        rows_scr[:, 0:8, 8:16, :] = p0r1_ref[:, :, :, :]
        rows_scr[:, 8:16, 0:8, :] = p1r0_ref[:, :, :, :]
        rows_scr[:, 8:16, 8:16, :] = p1r1_ref[:, :, :, :]
        rows_scr[:, 16:24, 0:8, :] = p2r0_ref[:, :, :, :]
        rows_scr[:, 16:24, 8:16, :] = p2r1_ref[:, :, :, :]

        pz_mod8 = pz - 8 * (pz // 8)
        accN = [jnp.zeros(shape, jnp.float32) for _ in range(cN)]
        accG = [jnp.zeros(shape, jnp.float32) for _ in range(9)]
        for o0 in _offs(w):
            plane_l = pz_mod8 + (8 + o0)  # staged-plane index (traced)
            for o1 in _offs(w):
                lrow = w + o1  # padded-row of cell row r=0 (static)
                for o2 in [c for (a, b, c) in g.trips if a == o0 and b == o1]:
                    col = g.o2b + o2 + w  # static padded col of cell j=0
                    N_k = e_of(o0, o1, o2) / Zs
                    blk = rows_scr[
                        :, pl.ds(plane_l, 1), lrow : lrow + 8, col : col + g.c2p
                    ]  # (cg, 1, 8, c2p)
                    if has_grad:
                        l0, l1, l2 = rel(o0, o1, o2)
                        a0 = l0 - r0
                        a1 = l1 - r1
                        a2 = l2 - r2
                        dn = (
                            -N_k * (i00 * a0 + i01 * a1 + i02 * a2),
                            -N_k * (i01 * a0 + i11 * a1 + i12 * a2),
                            -N_k * (i02 * a0 + i12 * a1 + i22 * a2),
                        )
                    for c in range(cN):
                        gv = jnp.dot(rep, blk[c, 0],
                                     preferred_element_type=jnp.float32)
                        accN[c] = accN[c] + N_k * gv
                    if has_grad:
                        for ui in range(3):
                            u = jnp.dot(rep, blk[cN + ui, 0],
                                        preferred_element_type=jnp.float32)
                            for vj in range(3):
                                accG[3 * ui + vj] = accG[3 * ui + vj] + u * dn[vj]
        if cN:
            for c in range(cN):
                outN_ref[0, c] = accN[c]
        else:
            outN_ref[0, 0] = jnp.zeros(shape, jnp.float32)
        for c in range(9):
            outG_ref[0, c] = accG[c]

    return kernel


def fused_gather3(
    grid: Grid,
    box: windowed.ActiveBox,
    params: lme_mod.LMEParams,
    x_t: jax.Array,     # (3, C, nc)
    lam_t: jax.Array,   # (3, C, nc) converged λ
    act_t: jax.Array,   # (1, C, nc)
    gN: Optional[jax.Array] = None,      # (n_nodes, cN)
    g_grad: Optional[jax.Array] = None,  # (n_nodes, 3)
    margin: int = 0,
    valid_lo=None,
    valid_hi=None,
    xv=None,
    lamv=None,
    av=None,
):
    """Fused 3D LME+G2P.  Returns (outN (Ns, cN) | None,
    grad (Ns, 3, 3) | None).  ``xv``/``lamv``/``av``: see fused_scatter3."""
    if not _on_tpu() and not FORCE_INTERPRET:
        assert xv is None and lamv is None and av is None
        return _gather_xla3(grid, box, params, x_t, lam_t, act_t, gN, g_grad,
                            margin, valid_lo=valid_lo, valid_hi=valid_hi)
    if _use_merged(grid, box, params, margin):
        return _gather_pallas3m(
            _Geom3M(grid, box, params, margin), grid, box, params,
            x_t, lam_t, act_t, gN, g_grad, margin,
            valid_lo, valid_hi, xv, lamv, av,
        )
    g = _Geom3(grid, box, params, margin)
    dt = x_t.dtype
    cN = 0 if gN is None else gN.shape[1]
    has_grad = g_grad is not None
    fields = ([] if gN is None else [gN]) + ([g_grad] if has_grad else [])
    cg = cN + (3 if has_grad else 0)
    if cg == 0:
        raise ValueError("nothing to gather")
    g_all = jnp.concatenate(fields, axis=1).reshape(g.n0, g.n1, g.n2, cg)

    # plane padding: front pad ptf with (o0b + ptf) ≡ 0 (mod 8) and an extra
    # aligned block so plane block (base − 1) exists; see kernel plane_l
    ptf = ((-g.o0b) % 8) + 8
    bp0 = (g.o0b + ptf) // 8 - 1  # first fetched plane block for pz = 0
    n_planes = 8 * (bp0 + (g.c0 - 1) // 8 + 3)
    # row padding: a = o1b − w + pt_r ≡ 0 (mod 8), pt_r ≥ w
    pt_r = g.w + ((-g.o1b) % 8)
    a = g.o1b - g.w + pt_r
    n_rows = a + 8 * (g.nprog1 - 1) + 16
    W = max(g.n2 + 2 * g.w, g.o2b + 2 * g.w + g.c2p)
    gpad = jnp.pad(
        g_all,
        (
            (ptf, max(0, n_planes - g.n0 - ptf)),
            (pt_r, max(0, n_rows - g.n1 - pt_r)),
            (g.w, W - g.n2 - g.w),
            (0, 0),
        ),
    )
    gpad = jnp.moveaxis(gpad, 3, 0)  # (cg, planes, rows, W)
    a8 = a // 8

    if xv is None:
        org = jnp.asarray(grid.origin, dt)
        xv = _to_view3(g, x_t - org[:, None, None], 3)
    if lamv is None:
        lamv = _to_view3(g, lam_t, 3)
    if av is None:
        av = _to_view3(g, act_t, 1)

    def blk_spec(sp, sr):
        return pl.BlockSpec(
            (cg, 8, 8, W),
            lambda i: (0, bp0 + (i // g.nprog1) // 8 + sp, a8 + (i % g.nprog1) + sr, 0),
            memory_space=pltpu.VMEM,
        )

    from .pallas_transfer import _valid_bounds, _vb_spec

    vb = _valid_bounds(None, valid_lo, valid_hi, dims=(g.n0, g.n1, g.n2))
    kernel = _make_gather_kernel3(g, cN, has_grad, cg)
    outN, outG = pl.pallas_call(
        kernel,
        grid=(g.nprog,),
        in_specs=[
            _vb_spec(3),
            _slot_spec3(g, 3), _slot_spec3(g, 3), _slot_spec3(g, 1),
            blk_spec(0, 0), blk_spec(0, 1),
            blk_spec(1, 0), blk_spec(1, 1),
            blk_spec(2, 0), blk_spec(2, 1),
        ],
        out_specs=[_slot_spec3(g, max(cN, 1)), _slot_spec3(g, 9)],
        out_shape=[
            out_struct((g.nprog, max(cN, 1), g.RC, g.c2p), dt, x_t),
            out_struct((g.nprog, 9, g.RC, g.c2p), dt, x_t),
        ],
        scratch_shapes=[
            pltpu.VMEM((cg, 24, 16, W), dt),
        ],
        interpret=not _on_tpu(),
    )(vb, xv, lamv, av, gpad, gpad, gpad, gpad, gpad, gpad)

    ns = g.C * g.nc
    outN_r = (
        jnp.moveaxis(_from_view3(g, outN, max(cN, 1)).reshape(max(cN, 1), ns), 0, 1)
        if cN
        else None
    )
    grad_r = (
        jnp.moveaxis(_from_view3(g, outG, 9).reshape(9, ns), 0, 1).reshape(ns, 3, 3)
        if has_grad
        else None
    )
    return outN_r, grad_r


# layout helpers shared with the 2D module
def to_channel_leading(a: jax.Array, C: int, nc: int) -> jax.Array:
    if a.ndim == 1:
        return a.reshape(1, C, nc)
    return jnp.moveaxis(a, 1, 0).reshape(a.shape[1], C, nc)


def from_channel_leading(a: jax.Array) -> jax.Array:
    return jnp.moveaxis(a.reshape(a.shape[0], -1), 0, 1)
