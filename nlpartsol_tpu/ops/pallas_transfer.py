"""Fused Pallas TPU kernels for the LME particle↔grid transfer pipeline.

The XLA 'windowed' engine (ops/windowed.py) materialises the per-edge
tensors N (Ns, K), dN (Ns, K, d) and every per-edge value array in HBM; at
K = 49 (2D LME, γ=3) those are hundreds of MB per step, and a trailing
K=49 or d=2 axis occupies a 128-wide lane tile, so the step is bandwidth-
bound on padded edge traffic.

These kernels never materialise edge tensors: for each *row of active-box
cells*, the LME basis (λ-Newton + N + ∇N; src/Nodes/LME.c:272-353,700-891)
is (re)computed in VMEM from slot positions and the warm-start λ, and
immediately contracted:

* ``fused_scatter`` — P2G: per-slot channel values (N-weighted) and/or
  per-slot 2×2 matrices G (gradient-weighted: contributes G·∇N_A to node
  A) accumulate into a per-row node-strip buffer; a KY-fold shifted add
  outside the kernel produces the node field.  Optionally runs the λ
  Newton solve (once per step) and emits the converged λ.
* ``fused_gather`` — G2P: the KY node rows a cell-row touches are DMA'd
  into VMEM and contracted against N (channel gather) and ∇N
  (displacement-gradient gather) per slot.

HBM traffic per call is O(Ns·channels + node strips) instead of
O(Ns·K·channels·padding).

Axis convention (2D): grid dims = (n0, n1), flat node = i0·n1 + i1.
Kernel rows run over box axis 0; box axis 1 rides the 128-lane dimension.
Slot arrays are capacity-major (ops/windowed.py) and passed channel-leading
as (ch, C, n_cells); coordinate channel c is the position along grid axis c.
3D inputs dispatch to the lane-folded kernel bank of pallas_transfer3d.py
(see fused_scatter/fused_gather below).
"""

from __future__ import annotations

import functools
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


# Test hook: force interpret-mode pallas on CPU (slow; kernel-parity tests
# only).  Off-TPU production/test calls use the pure-XLA fallback below,
# which implements the identical slot-cell-centered widened-window
# semantics with the existing lme/windowed building blocks.
FORCE_INTERPRET = False


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _offs(w: int):
    return list(range(-w, w + 1))


class _Geom:
    """Static geometry shared by both kernels."""

    #: cell rows processed per kernel program — elementwise math runs on
    #: flat (R·C, c1p) tiles so VPU ops amortise over 8 sublane tiles
    #: instead of one partially-filled (C, c1p) tile per program.
    R = 8

    def __init__(self, grid: Grid, box: windowed.ActiveBox, params: lme_mod.LMEParams,
                 margin: int = 0, rows: int = None):
        # rows-per-program override: the margin-widened scatter kernel's
        # K1-banked output grows ~(K1/7)x — 4 rows keeps it inside the 16 MB
        # scoped-VMEM budget (the gather kernel's row staging is R=8-tied
        # and has no banked output, so it stays at 8)
        if rows is not None:
            self.R = rows
        assert grid.dim == 2, "pallas transfer is 2D; windowed engine covers 3D"
        self.h = grid.spacing
        self.beta = lme_mod.beta_of(params, grid.spacing)
        r_sup = lme_mod.support_radius(params, grid.spacing)
        self.r2max = r_sup * r_sup
        # margin widens the window so particles may drift up to `margin`
        # cells from their binned slot cell between re-binnings: the radius
        # mask r² ≤ R² keeps the evaluated basis exact regardless of which
        # cell inside the widened window the particle actually occupies.
        self.w = lme_mod.window_halfwidth(params, 1.0) + margin
        self.K1 = 2 * self.w + 1
        self.K = self.K1 * self.K1
        self.c0, self.c1 = box.cdims
        self.c1p = ((self.c1 + 127) // 128) * 128  # 128-aligned lane width
        # scatter bank width: cell cols + 2w window spill, 128-aligned
        self.c1p2 = ((self.c1 + 2 * self.w + 127) // 128) * 128
        self.C = box.capacity
        self.nc = box.n_cells
        self.n0, self.n1 = grid.dims
        self.o0, self.o1 = box.offset  # box cell origin (grid frame)
        self.c0p = ((self.c0 + self.R - 1) // self.R) * self.R
        self.nprog = self.c0p // self.R
        self.RC = self.R * self.C
        self.params = params
        self.margin = margin
        # radius culling: a particle sits within ±(0.5 + margin) cells of
        # its slot cell, so window offsets whose CLOSEST approach exceeds
        # the support radius can never contribute (the radius mask zeroes
        # them); skipping them statically cuts the basis sweeps
        # (49 → 37 offsets at margin 0, 81 → 69 at margin 1)
        # particle position within its slot cell spans [0, 1) cells (+
        # margin drift), so the closest approach to the node at offset o is
        # ASYMMETRIC: max(0, o − 1 − margin) above, max(0, −o − margin)
        # below (node(cell) is the cell's LOWER corner)
        def _md(o):
            return max(0.0, o - 1.0 - margin, -o - margin)

        rm = r_sup / grid.spacing
        self.pairs = [
            (o0, o1)
            for o0 in range(-self.w, self.w + 1)
            for o1 in range(-self.w, self.w + 1)
            if _md(o0) ** 2 + _md(o1) ** 2 <= rm * rm
        ]


def _basis_terms(g: _Geom, x0, x1, lam0, lam1, act, cy, vlo=None, vhi=None,
                 vlo1=None, vhi1=None):
    """Per-offset closures: rel components and validity for offset (o0, o1).

    ``cy`` is the cell row per element (array broadcastable to x0.shape).
    ``vlo``/``vhi`` (traced int32 scalars) bound the valid node planes along
    axis 0 — halo strips mask phantom planes beyond the GLOBAL grid edge
    per device (parallel/domain.py); defaults are the local grid bounds."""
    h = g.h
    c1_idx = jax.lax.broadcasted_iota(jnp.int32, x0.shape, 1).astype(jnp.float32)
    cyf = cy.astype(jnp.float32)

    def rel(o0, o1):
        # node multi-index = (g.o0 + cy + o0, g.o1 + c1_idx + o1)
        n0pos = (jnp.float32(g.o0 + o0) + cyf) * h
        n1pos = (c1_idx + (g.o1 + o1)) * h
        return x0 - n0pos, x1 - n1pos

    cyi = cy.astype(jnp.int32)
    lo0 = 0 if vlo is None else vlo
    hi0 = g.n0 - 1 if vhi is None else vhi
    lo1 = 0 if vlo1 is None else vlo1
    hi1 = g.n1 - 1 if vhi1 is None else vhi1

    def valid(o0, o1):
        i0 = g.o0 + o0 + cyi
        in0 = (i0 >= lo0) & (i0 <= hi0)
        i1 = c1_idx + (g.o1 + o1)
        in1 = (i1 >= lo1) & (i1 <= hi1)
        return act & in0 & in1

    return rel, valid


def _row_iota(g: _Geom):
    """(RC, c1p) int32: cell row (within the program's 8-row block) of each
    flat element — flat layout is (row, capacity) row-major."""
    return jax.lax.broadcasted_iota(jnp.int32, (g.RC, g.c1p), 0) // g.C


def _row_sum_matrix(g: _Geom):
    """(R, RC) f32 selection matrix: dot(sel, flat) sums capacity slots of
    each cell row — an MXU-friendly segment reduction."""
    i = jax.lax.broadcasted_iota(jnp.int32, (g.R, g.RC), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (g.R, g.RC), 1)
    return (j // g.C == i).astype(jnp.float32)


def _row_rep_matrix(g: _Geom):
    """(RC, R) f32: dot(rep, rows8) repeats each of 8 node-row values into
    the C capacity slots of that cell row."""
    i = jax.lax.broadcasted_iota(jnp.int32, (g.RC, g.R), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (g.RC, g.R), 1)
    return (i // g.C == j).astype(jnp.float32)


def _to_view(g: _Geom, a: jax.Array, ch: int) -> jax.Array:
    """(ch, C, nc) slot array → (nprog, ch, R·C, c1p) kernel view (flat
    row-major (row, capacity) sublane axis; zero-padded rows/lanes)."""
    v = jnp.moveaxis(a.reshape((ch, g.C, g.c0, g.c1)), 2, 0)  # (c0, ch, C, c1)
    v = jnp.pad(v, ((0, g.c0p - g.c0), (0, 0), (0, 0), (0, g.c1p - g.c1)))
    v = v.reshape(g.nprog, g.R, ch, g.C, g.c1p).transpose(0, 2, 1, 3, 4)
    return v.reshape(g.nprog, ch, g.RC, g.c1p)


def _from_view(g: _Geom, v: jax.Array, ch: int) -> jax.Array:
    """Inverse of :func:`_to_view`: (nprog, ch, RC, c1p) → (ch, C, nc)."""
    v = v.reshape(g.nprog, ch, g.R, g.C, g.c1p).transpose(0, 2, 1, 3, 4)
    v = v.reshape(g.c0p, ch, g.C, g.c1p)[: g.c0, :, :, : g.c1]
    return jnp.moveaxis(v, 0, 2).reshape(ch, g.C, g.nc)


def _slot_spec(g: _Geom, ch: int):
    return pl.BlockSpec(
        (1, ch, g.RC, g.c1p), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )


def _vb_spec(d: int = 2):
    return pl.BlockSpec((1, 2 * d), lambda i: (0, 0), memory_space=pltpu.SMEM)


def _valid_bounds(g, valid_lo, valid_hi, dims=None) -> jax.Array:
    """(1, 2d) int32 [vlo0, vhi0, vlo1, vhi1, ...] SMEM input (traced
    per-device under shard_map; static local bounds otherwise).

    ``valid_lo``/``valid_hi`` may be None (whole local grid is real),
    scalars (axis-0 bound only — the 1-D decomposition), or (d,) arrays
    (per-axis bounds — the 2-D decomposition masks phantom planes beyond
    the GLOBAL grid on both split axes)."""
    if dims is None:
        dims = (g.n0, g.n1)
    d = len(dims)

    def norm(v, default_per_axis):
        if v is None:
            return jnp.asarray(default_per_axis, jnp.int32)
        a = jnp.asarray(v, jnp.int32).reshape(-1)
        if a.shape[0] == d:
            return a
        # scalar / (1,): axis-0 bound, other axes unbounded
        rest = jnp.asarray(default_per_axis[1:], jnp.int32)
        return jnp.concatenate([a.reshape(1), rest])

    vlo = norm(valid_lo, [0] * d)
    vhi = norm(valid_hi, [n - 1 for n in dims])
    return jnp.stack([vlo, vhi], axis=1).reshape(1, 2 * d)


def _basis_passes(g: _Geom, rel, valid, lam0, lam1):
    """Storage-free basis evaluation: returns (e_of, fmax, Z, cnt) where
    ``e_of(o0, o1, fmax)`` recomputes the masked unnormalised exponential for
    one window offset.  Recompute-over-store keeps kernel VMEM flat in K
    (a (K, RC, c1p) scratch at K = 81 alone overflows the 16 MB budget)."""
    neg = jnp.float32(-1e30)

    def f_of(o0, o1):
        r0, r1 = rel(o0, o1)
        r2 = r0 * r0 + r1 * r1
        f = -g.beta * r2 + lam0 * r0 + lam1 * r1
        return jnp.where(valid(o0, o1) & (r2 <= g.r2max), f, neg)

    shape = lam0.shape
    fmax = jnp.full(shape, neg, jnp.float32)
    for o0, o1 in g.pairs:
        fmax = jnp.maximum(fmax, f_of(o0, o1))

    def e_of(o0, o1):
        f = f_of(o0, o1)
        return jnp.where(f > neg * 0.5, jnp.exp(f - fmax), 0.0)

    Z = jnp.zeros(shape, jnp.float32)
    cnt = jnp.zeros(shape, jnp.float32)
    for o0, o1 in g.pairs:
        e = e_of(o0, o1)
        Z = Z + e
        cnt = cnt + (e > 0.0).astype(jnp.float32)
    return e_of, fmax, Z, cnt


def _r_and_J(g: _Geom, rel, p_of):
    """r = Σ p·l; J = Σ p·l⊗l − r⊗r (LME.c:766,795).  ``p_of(o0,o1,k)``
    yields the normalised shape value for one offset."""
    r0 = r1 = j00 = j01 = j11 = None
    k = 0
    for o0, o1 in g.pairs:
        l0, l1 = rel(o0, o1)
        p = p_of(o0, o1, k)
        if k == 0:
            r0 = p * l0
            r1 = p * l1
            j00 = p * l0 * l0
            j01 = p * l0 * l1
            j11 = p * l1 * l1
        else:
            r0 = r0 + p * l0
            r1 = r1 + p * l1
            j00 = j00 + p * l0 * l0
            j01 = j01 + p * l0 * l1
            j11 = j11 + p * l1 * l1
        k += 1
    j00 = j00 - r0 * r0
    j01 = j01 - r0 * r1
    j11 = j11 - r1 * r1
    return r0, r1, j00, j01, j11


def _inv2_damped(j00, j01, j11):
    """Damped closed-form symmetric 2×2 inverse (replaces the reference's
    rcond<1e-8 abort, LME.c:308-313)."""
    tr = j00 + j11
    eps = 1e-10 * jnp.maximum(tr, 1e-30)
    j00 = j00 + eps
    j11 = j11 + eps
    det = j00 * j11 - j01 * j01
    det = jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    inv = 1.0 / det
    return j11 * inv, -j01 * inv, j00 * inv  # i00, i01, i11


# ---------------------------------------------------------------------------
# scatter
# ---------------------------------------------------------------------------


def _make_scatter_kernel(g: _Geom, cN: int, has_G: bool, solve: bool,
                         gnorm: bool = False):
    """8-cell-row program on flat (RC, c1p) tiles.  Lane-axis window offsets
    (o1) are folded INSIDE the kernel by pltpu.roll into per-row banks, so
    the kernel emits K1 = 2w+1 row-offset banks instead of K = (2w+1)²
    full-window banks — 1/K1 the HBM intermediate traffic of the round-1
    design (the profiled top cost of the fused step after rebinning)."""
    w, K, K1 = g.w, g.K, g.K1
    mx = g.params.max_iter
    tol2 = g.params.tol_lambda * g.params.tol_lambda * g.r2max
    cout = cN + (2 if has_G else 0) + (1 if gnorm else 0)
    need_dn = has_G or gnorm

    def kernel(vb_ref, in_ref, out_ref, lam_out_ref, cnt_ref):
        # packed channel layout: [x0 x1 | lam0 lam1 | act | fN(cN) | G(4)?]
        cy0 = pl.program_id(0) * g.R
        x0 = in_ref[0, 0]
        x1 = in_ref[0, 1]
        act = in_ref[0, 4] > 0.5
        lam0 = in_ref[0, 2]
        lam1 = in_ref[0, 3]
        cy = cy0 + _row_iota(g)
        rel, valid = _basis_terms(
            g, x0, x1, lam0, lam1, act, cy, vlo=vb_ref[0, 0], vhi=vb_ref[0, 1],
            vlo1=vb_ref[0, 2], vhi1=vb_ref[0, 3]
        )
        sel = _row_sum_matrix(g)

        if solve:
            # λ Newton with block-level early exit (LME.c:272-353).  Two
            # sweeps per iteration (fmax, then e-weighted moments) — no K-way
            # f storage, so register pressure stays flat at RC sublanes.
            def body(state):
                lam0, lam1, _, it = state
                neg = jnp.float32(-1e30)
                fmax = jnp.full(x0.shape, neg, jnp.float32)

                def f_of(o0, o1):
                    r0_, r1_ = rel(o0, o1)
                    r2 = r0_ * r0_ + r1_ * r1_
                    f = -g.beta * r2 + lam0 * r0_ + lam1 * r1_
                    return jnp.where(valid(o0, o1) & (r2 <= g.r2max), f, neg)

                for o0, o1 in g.pairs:
                    fmax = jnp.maximum(fmax, f_of(o0, o1))
                zero = jnp.zeros(x0.shape, jnp.float32)
                S0 = zero
                S1_0 = S1_1 = zero
                S2_00 = S2_01 = S2_11 = zero
                for o0, o1 in g.pairs:
                    f = f_of(o0, o1)
                    e = jnp.where(f > neg * 0.5, jnp.exp(f - fmax), 0.0)
                    l0, l1 = rel(o0, o1)
                    S0 = S0 + e
                    S1_0 = S1_0 + e * l0
                    S1_1 = S1_1 + e * l1
                    S2_00 = S2_00 + e * l0 * l0
                    S2_01 = S2_01 + e * l0 * l1
                    S2_11 = S2_11 + e * l1 * l1
                Zs = jnp.maximum(S0, 1e-30)
                r0 = S1_0 / Zs
                r1 = S1_1 / Zs
                j00 = S2_00 / Zs - r0 * r0
                j01 = S2_01 / Zs - r0 * r1
                j11 = S2_11 / Zs - r1 * r1
                i00, i01, i11 = _inv2_damped(j00, j01, j11)
                live = act & (S0 > 0.0)
                rn2 = jnp.where(live, r0 * r0 + r1 * r1, 0.0)
                conv = rn2 <= tol2
                lam0 = jnp.where(conv, lam0, lam0 - (i00 * r0 + i01 * r1))
                lam1 = jnp.where(conv, lam1, lam1 - (i01 * r0 + i11 * r1))
                return lam0, lam1, jnp.all(conv), it + jnp.int32(1)

            def cond(state):
                _, _, done, it = state
                return jnp.logical_not(done) & (it < mx)

            # kernel_strip: raw ref reads carry {V:axis} that kernel-interior
            # arithmetic does not propagate — level the carry type (vma.py)
            lam0, lam1, _, _ = jax.lax.while_loop(
                cond, body,
                (kernel_strip(lam0), kernel_strip(lam1), jnp.asarray(False),
                 jnp.int32(0))
            )
        lam_out_ref[0, 0] = lam0
        lam_out_ref[0, 1] = lam1

        e_of, fmax, Z, cnt = _basis_passes(g, rel, valid, lam0, lam1)
        Zs = jnp.maximum(Z, 1e-30)
        # edge count (nnz of the dynamic pattern) for throughput diagnostics
        total = jnp.sum(cnt)
        onehot = (
            (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0)
            & (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == 0)
        )
        cnt_ref[0] = jnp.where(onehot, total, 0.0)

        if need_dn:
            r0, r1, j00, j01, j11 = _r_and_J(
                g, rel, lambda o0, o1, k: e_of(o0, o1) / Zs
            )
            i00, i01, i11 = _inv2_damped(j00, j01, j11)
        if has_G:
            g00 = in_ref[0, 5 + cN]
            g01 = in_ref[0, 5 + cN + 1]
            g10 = in_ref[0, 5 + cN + 2]
            g11 = in_ref[0, 5 + cN + 3]

        lanepad = g.c1p2 - g.c1p
        k = 0
        for o0 in _offs(w):
            acc = [jnp.zeros((g.R, g.c1p2), jnp.float32) for _ in range(cout)]
            for o1 in [b for (a, b) in g.pairs if a == o0]:
                N_k = e_of(o0, o1) / Zs
                shift = o1 + w  # bank col = cell col + (o1 + w)
                for c in range(cN):
                    rows = jnp.dot(sel, N_k * in_ref[0, 5 + c],
                                   preferred_element_type=jnp.float32)
                    rows = jnp.pad(rows, ((0, 0), (0, lanepad)))
                    acc[c] = acc[c] + pltpu.roll(rows, shift, 1)
                if need_dn:
                    l0, l1 = rel(o0, o1)
                    a0 = l0 - r0
                    a1 = l1 - r1
                    dn0 = -N_k * (i00 * a0 + i01 * a1)
                    dn1 = -N_k * (i01 * a0 + i11 * a1)
                    extra = []
                    if has_G:
                        extra += [(cN, g00 * dn0 + g01 * dn1),
                                  (cN + 1, g10 * dn0 + g11 * dn1)]
                    if gnorm:
                        # Σ_p s_p·|∇N_pA|² with s_p = last fN channel — the
                        # Jacobi stiffness diagonal (PCJACOBI equivalent)
                        extra += [(cout - 1,
                                   in_ref[0, 5 + cN - 1] * (dn0 * dn0 + dn1 * dn1))]
                    for c, v in extra:
                        rows = jnp.dot(sel, v, preferred_element_type=jnp.float32)
                        rows = jnp.pad(rows, ((0, 0), (0, lanepad)))
                        acc[c] = acc[c] + pltpu.roll(rows, shift, 1)
                k += 1
            k0 = o0 + w
            for c in range(cout):
                out_ref[0, :, k0 * cout + c, :] = acc[c]

    return kernel


def _xla_basis(g: _Geom, grid, box, params, x_t, lam_t, act_t, solve,
               valid_lo=None, valid_hi=None):
    """Slot-cell-centered widened-window LME basis in plain XLA — the exact
    semantics of the kernels, for non-TPU backends."""
    from . import sparse  # noqa: F401 (documented fallback dependency)
    from ..shapefun.window import window_offsets

    x = from_channel_leading(x_t)
    lam0 = from_channel_leading(lam_t)
    act = from_channel_leading(act_t)[:, 0] > 0.5
    offs = window_offsets(2, -g.w, g.w)  # widened window
    cells = jnp.asarray(windowed.slot_cells(box))  # (Ns, 2) grid frame
    multi = cells[:, None, :] + jnp.asarray(offs)[None, :, :]
    dims = jnp.asarray(grid.dims)
    inb = jnp.all((multi >= 0) & (multi < dims), axis=-1)
    if valid_lo is not None:
        vlo_a = jnp.asarray(valid_lo, jnp.int32).reshape(-1)
        if vlo_a.shape[0] > 1:
            inb = inb & jnp.all(multi >= vlo_a, axis=-1)
        else:
            inb = inb & (multi[..., 0] >= vlo_a[0])
    if valid_hi is not None:
        vhi_a = jnp.asarray(valid_hi, jnp.int32).reshape(-1)
        if vhi_a.shape[0] > 1:
            inb = inb & jnp.all(multi <= vhi_a, axis=-1)
        else:
            inb = inb & (multi[..., 0] <= vhi_a[0])
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
    from . import tensor as tn

    Jd = J + 1e-10 * tn.trace(J)[..., None, None] * jnp.eye(2, dtype=J.dtype)
    Jinv = tn.inv(Jd)
    dN = -N[..., None] * jnp.einsum("pij,pkj->pki", Jinv, rel - r[:, None, :])
    return offs, N, dN, mask, lam


def _scatter_xla(grid, box, params, x_t, lam_t, act_t, fN_t, G_t, solve, margin,
                 gnorm=False, valid_lo=None, valid_hi=None):
    g = _Geom(grid, box, params, margin)
    offs, N, dN, mask, lam = _xla_basis(
        g, grid, box, params, x_t, lam_t, act_t, solve,
        valid_lo=valid_lo, valid_hi=valid_hi,
    )
    C, nc = box.capacity, box.n_cells
    cols = []
    fN = from_channel_leading(fN_t)  # (Ns, cN)
    cols.append(N[..., None] * fN[:, None, :])
    if G_t is not None:
        G = from_channel_leading(G_t).reshape(-1, 2, 2)
        cols.append(jnp.einsum("pij,pkj->pki", G, dN))
    if gnorm:
        s = fN[:, -1]
        cols.append((s[:, None] * jnp.sum(dN * dN, axis=-1))[..., None])
    vals = jnp.concatenate(cols, axis=-1)
    vals = jnp.where(mask[..., None], vals, 0.0)
    nodes = windowed.p2g(vals, box, grid, offs)
    nnz = jnp.sum(mask.astype(jnp.int32))
    return nodes, to_channel_leading(lam, C, nc), nnz


def _gather_xla(grid, box, params, x_t, lam_t, act_t, gN, g_grad, margin,
                valid_lo=None, valid_hi=None):
    g = _Geom(grid, box, params, margin)
    offs, N, dN, mask, _ = _xla_basis(
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
            per_cell.reshape((1, nc, K, 2)), (box.capacity, nc, K, 2)
        ).reshape(box.n_slots, K, 2)
        dNm = jnp.where(mask[..., None], dN, 0.0)
        grad = jnp.einsum("pki,pkj->pij", u, dNm)
    return outN, grad


def fused_scatter(
    grid: Grid,
    box: windowed.ActiveBox,
    params: lme_mod.LMEParams,
    x_t: jax.Array,     # (2, C, nc) slot positions, origin-relative handled here
    lam_t: jax.Array,   # (2, C, nc) λ warm start
    act_t: jax.Array,   # (1, C, nc) active (f32 0/1)
    fN_t: jax.Array,    # (cN, C, nc) N-weighted channels
    G_t: Optional[jax.Array] = None,  # (4, C, nc) grad-weighted row-major 2×2
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
    """Fused LME+P2G.  Returns (nodes (n_nodes, cout), lam (d, C, nc));
    cout = cN (+d when G_t given, the Σ G·∇N vector appended; +1 when
    ``gnorm``: Σ s·|∇N|² with s = the LAST fN channel — the Jacobi
    stiffness diagonal of the implicit path).  3D grids dispatch to the
    H8-window kernels in ops/pallas_transfer3d.py; xv/lamv/av/lam_view_out
    are the 3D per-step view cache (pallas_transfer3d.make_views3)."""
    if grid.dim == 3:
        from . import pallas_transfer3d as pt3

        pt3.FORCE_INTERPRET = FORCE_INTERPRET
        return pt3.fused_scatter3(
            grid, box, params, x_t, lam_t, act_t, fN_t, G_t=G_t,
            solve=solve, margin=margin, gnorm=gnorm,
            valid_lo=valid_lo, valid_hi=valid_hi,
            xv=xv, lamv=lamv, av=av, lam_view_out=lam_view_out,
        )
    assert xv is None and lamv is None and av is None and not lam_view_out
    if not _on_tpu() and not FORCE_INTERPRET:
        return _scatter_xla(
            grid, box, params, x_t, lam_t, act_t, fN_t, G_t, solve, margin,
            gnorm, valid_lo=valid_lo, valid_hi=valid_hi,
        )
    # rows-per-program: 8 amortises VPU tiles best, but the K1-banked
    # output scales with rows·K1·cout·c1p2 — wide boxes (c1p2 > 512 lanes)
    # blow the 16 MB scoped-VMEM budget at rows=8 (observed: full-grid 512²
    # box, margin 0, 18.9 MB), so they drop to 4 like the margin-widened
    # kernels always do
    g = _Geom(
        grid, box, params, margin,
        rows=8 if margin == 0 and box.cdims[1] + 2 <= 512 else 4,
    )
    cN = fN_t.shape[0]
    has_G = G_t is not None
    cout = cN + (2 if has_G else 0) + (1 if gnorm else 0)
    dt = x_t.dtype
    org = jnp.asarray(grid.origin, dt)
    x_shift = x_t - org[:, None, None]

    # one packed input: a single kernel-view relayout instead of five
    # (the (Ns, ch) -> view transposes are fixed-cost copies, ~0.3 ms each)
    packed = jnp.concatenate(
        [x_shift, lam_t, act_t, fN_t] + ([G_t] if has_G else []), axis=0
    )
    cin = packed.shape[0]

    vb = _valid_bounds(g, valid_lo, valid_hi)
    kernel = _make_scatter_kernel(g, cN, has_G, solve, gnorm)
    out, lam_new, cnt = pl.pallas_call(
        kernel,
        grid=(g.nprog,),
        in_specs=[_vb_spec(), _slot_spec(g, cin)],
        out_specs=[
            pl.BlockSpec((1, g.R, g.K1 * cout, g.c1p2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            _slot_spec(g, 2),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            out_struct((g.nprog, g.R, g.K1 * cout, g.c1p2), dt, packed),
            out_struct((g.nprog, 2, g.RC, g.c1p), dt, packed),
            out_struct((g.nprog, 8, 128), jnp.float32, packed),
        ],
        interpret=not _on_tpu(),
    )(vb, _to_view(g, packed, cin))

    # XLA epilogue: K1 row-offset banks, each already o1-folded in-kernel.
    # Bank column p holds the contribution to node column p + (o1_box − w).
    W2 = min(g.c1 + 2 * g.w, g.c1p2)
    part = out.reshape(g.c0p, g.K1, cout, g.c1p2)[: g.c0, :, :, :W2]
    nodes = jnp.zeros((g.n0, g.n1, cout), dt)
    cb = g.o1 - g.w
    clo, chi = max(0, -cb), min(W2, g.n1 - cb)
    for k0, o0 in enumerate(range(-g.w, g.w + 1)):
        r0 = g.o0 + o0
        rlo, rhi = max(0, -r0), min(g.c0, g.n0 - r0)
        if rhi > rlo and chi > clo:
            strip = part[rlo:rhi, k0, :, clo:chi]  # (rows, cout, cols)
            nodes = nodes.at[
                r0 + rlo : r0 + rhi, cb + clo : cb + chi, :
            ].add(jnp.moveaxis(strip, 1, 2))
    lam_new = _from_view(g, lam_new, 2)
    return (
        nodes.reshape(g.n0 * g.n1, cout),
        lam_new,
        jnp.sum(cnt[:, 0, 0]).astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# gather
# ---------------------------------------------------------------------------


def _make_gather_kernel(g: _Geom, cN: int, has_grad: bool, cg: int):
    """8-cell-row program on flat (RC, c1p) tiles.  Node rows arrive as two
    8-row-aligned blocks of the padded field; for each row offset o0 the
    kernel statically slices the 8 node rows its cell rows touch and
    broadcasts each into that row's C capacity sublanes with one small
    matmul (``_row_rep_matrix``), so every VPU op runs at full RC-sublane
    occupancy instead of one partially-filled (C, c1p) tile per cell row."""
    w, K = g.w, g.K
    assert w <= 4, "window halfwidth > 4 needs a 3rd row block"

    def kernel(vb_ref, in_ref, rlo_ref, rhi_ref,
               outN_ref, outG_ref, rows_scr):
        # packed channel layout: [x0 x1 | lam0 lam1 | act]
        cy0 = pl.program_id(0) * g.R
        x0 = in_ref[0, 0]
        x1 = in_ref[0, 1]
        act = in_ref[0, 4] > 0.5
        lam0 = in_ref[0, 2]
        lam1 = in_ref[0, 3]
        cy = cy0 + _row_iota(g)
        rel, valid = _basis_terms(
            g, x0, x1, lam0, lam1, act, cy, vlo=vb_ref[0, 0], vhi=vb_ref[0, 1],
            vlo1=vb_ref[0, 2], vhi1=vb_ref[0, 3]
        )
        rep = _row_rep_matrix(g)
        e_of, fmax, Z, _ = _basis_passes(g, rel, valid, lam0, lam1)
        Zs = jnp.maximum(Z, 1e-30)
        if has_grad:
            r0, r1, j00, j01, j11 = _r_and_J(
                g, rel, lambda o0, o1, k: e_of(o0, o1) / Zs
            )
            i00, i01, i11 = _inv2_damped(j00, j01, j11)

        # stage the 16 padded node rows this program can touch
        rows_scr[:, 0:8, :] = rlo_ref[:, :, :]
        rows_scr[:, 8:16, :] = rhi_ref[:, :, :]

        accN = [jnp.zeros(x0.shape, jnp.float32) for _ in range(cN)]
        accG = [jnp.zeros(x0.shape, jnp.float32) for _ in range(4)]
        k = 0
        for o0 in _offs(w):
            l0row = w + o0  # padded-row index of cell row r=0 (static)
            for o1 in [b for (a, b) in g.pairs if a == o0]:
                col = g.o1 + o1 + w  # static padded col of cell j=0
                N_k = e_of(o0, o1) / Zs
                if cN:
                    gv8 = rows_scr[0:cN, l0row : l0row + 8, col : col + g.c1p]
                if has_grad:
                    u8 = rows_scr[cN : cN + 2, l0row : l0row + 8, col : col + g.c1p]
                    lo0, lo1 = rel(o0, o1)
                    a0 = lo0 - r0
                    a1 = lo1 - r1
                    dn0 = -N_k * (i00 * a0 + i01 * a1)
                    dn1 = -N_k * (i01 * a0 + i11 * a1)
                for c in range(cN):
                    gv = jnp.dot(rep, gv8[c], preferred_element_type=jnp.float32)
                    accN[c] = accN[c] + N_k * gv
                if has_grad:
                    u0 = jnp.dot(rep, u8[0], preferred_element_type=jnp.float32)
                    u1 = jnp.dot(rep, u8[1], preferred_element_type=jnp.float32)
                    accG[0] = accG[0] + u0 * dn0
                    accG[1] = accG[1] + u0 * dn1
                    accG[2] = accG[2] + u1 * dn0
                    accG[3] = accG[3] + u1 * dn1
                k += 1
        if cN:
            for c in range(cN):
                outN_ref[0, c] = accN[c]
        else:
            outN_ref[0, 0] = jnp.zeros(x0.shape, jnp.float32)
        for c in range(4):
            outG_ref[0, c] = accG[c]

    return kernel


def fused_gather(
    grid: Grid,
    box: windowed.ActiveBox,
    params: lme_mod.LMEParams,
    x_t: jax.Array,     # (2, C, nc)
    lam_t: jax.Array,   # (2, C, nc) converged λ
    act_t: jax.Array,   # (1, C, nc)
    gN: Optional[jax.Array] = None,      # (n_nodes, cN)
    g_grad: Optional[jax.Array] = None,  # (n_nodes, 2)
    margin: int = 0,
    valid_lo=None,
    valid_hi=None,
    xv=None,
    lamv=None,
    av=None,
):
    """Fused LME+G2P.  Returns (outN (Ns, cN) | None, grad (Ns, d, d) | None)
    where grad[s, i, j] = Σ_A g_grad[A, i]·∂N_A/∂x_j.  xv/lamv/av: 3D
    per-step view cache (pallas_transfer3d.make_views3)."""
    if grid.dim == 3:
        from . import pallas_transfer3d as pt3

        pt3.FORCE_INTERPRET = FORCE_INTERPRET
        return pt3.fused_gather3(
            grid, box, params, x_t, lam_t, act_t, gN=gN, g_grad=g_grad,
            margin=margin, valid_lo=valid_lo, valid_hi=valid_hi,
            xv=xv, lamv=lamv, av=av,
        )
    assert xv is None and lamv is None and av is None
    if not _on_tpu() and not FORCE_INTERPRET:
        return _gather_xla(grid, box, params, x_t, lam_t, act_t, gN, g_grad,
                           margin, valid_lo=valid_lo, valid_hi=valid_hi)
    g = _Geom(grid, box, params, margin)
    dt = x_t.dtype
    cN = 0 if gN is None else gN.shape[1]
    has_grad = g_grad is not None
    fields = ([] if gN is None else [gN]) + ([g_grad] if has_grad else [])
    cg = cN + (2 if has_grad else 0)
    if cg == 0:
        raise ValueError("nothing to gather")
    g_all = jnp.concatenate(fields, axis=1).reshape(g.n0, g.n1, cg)

    # Row padding: pad_top pt makes a = o0 − w + pt ≡ 0 (mod 8).  Program i's
    # window rows (local index l = w + r + o0 ∈ [0, 7+2w], w ≤ 4 ⇒ l < 16)
    # then live in padded-row blocks a/8 + i + {0, 1}.
    pt_rows = g.w + ((-g.o0) % 8)
    a = g.o0 - g.w + pt_rows
    n_rows = a + 8 * (g.nprog - 1) + 16
    Wrow = max(g.n1 + 2 * g.w, g.o1 + 2 * g.w + g.c1p)
    gpad = jnp.pad(
        g_all,
        ((pt_rows, max(0, n_rows - g.n0 - pt_rows)), (g.w, Wrow - g.n1 - g.w), (0, 0)),
    )
    gpad = jnp.moveaxis(gpad, 2, 0)  # (cg, n_rows, Wrow)
    a8 = a // 8

    org = jnp.asarray(grid.origin, dt)
    x_shift = x_t - org[:, None, None]

    def row_spec(shift):
        return pl.BlockSpec(
            (cg, 8, Wrow),
            lambda i: (0, a8 + i + shift, 0),
            memory_space=pltpu.VMEM,
        )

    packed = jnp.concatenate([x_shift, lam_t, act_t], axis=0)
    vb = _valid_bounds(g, valid_lo, valid_hi)
    kernel = _make_gather_kernel(g, cN, has_grad, cg)
    outN, outG = pl.pallas_call(
        kernel,
        grid=(g.nprog,),
        in_specs=[
            _vb_spec(),
            _slot_spec(g, 5),
            row_spec(0),
            row_spec(1),
        ],
        out_specs=[_slot_spec(g, max(cN, 1)), _slot_spec(g, 4)],
        out_shape=[
            out_struct((g.nprog, max(cN, 1), g.RC, g.c1p), dt, packed),
            out_struct((g.nprog, 4, g.RC, g.c1p), dt, packed),
        ],
        scratch_shapes=[
            pltpu.VMEM((cg, 16, Wrow), dt),
        ],
        interpret=not _on_tpu(),
    )(vb, _to_view(g, packed, 5), gpad, gpad)

    ns = g.C * g.nc
    outN_r = (
        jnp.moveaxis(_from_view(g, outN, max(cN, 1)).reshape(max(cN, 1), ns), 0, 1)
        if cN
        else None
    )
    grad_r = (
        jnp.moveaxis(_from_view(g, outG, 4).reshape(4, ns), 0, 1).reshape(ns, 2, 2)
        if has_grad
        else None
    )
    return outN_r, grad_r


# ---------------------------------------------------------------------------
# layout helpers
# ---------------------------------------------------------------------------


def to_channel_leading(a: jax.Array, C: int, nc: int) -> jax.Array:
    """(Ns[, ch]) capacity-major slot array → (ch, C, nc)."""
    if a.ndim == 1:
        return a.reshape(1, C, nc)
    return jnp.moveaxis(a, 1, 0).reshape(a.shape[1], C, nc)


def from_channel_leading(a: jax.Array) -> jax.Array:
    """(ch, C, nc) → (Ns, ch)."""
    return jnp.moveaxis(a.reshape(a.shape[0], -1), 0, 1)
