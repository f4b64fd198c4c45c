"""Pallas TPU kernels for the hot 2D ops.

The TPU-native rebuild of the reference's OpenCL kernel layer
(`gpu.lua:37-202`, SURVEY.md section 2.2).  One custom kernel carries
the performance story; everything else delegates to the XLA backend
(whose reduce_window / repeat formulations are already roofline-bound
for the transfer operators):

- fused multi-sweep smoother (`smooth`): all nu Jacobi or red-black
  Gauss-Seidel sweeps in one kernel — u and f cross HBM once per smooth
  phase instead of once per sweep (the reference enqueues 2 kernels per
  sweep, `gpu.lua:286-294`).  Deep-halo trapezoid scheme: each row
  stripe is loaded with H halo rows (H >= nu for Jacobi, 2*nu for
  red-black GS, the per-sweep dependency radius) and the halo region is
  recomputed redundantly, so the interior rows are exact after nu
  in-VMEM sweeps.  Measured at 4096^2 f32 on v5e: red-black GS x2 in
  0.368 ms (7x over the unfused XLA form), Jacobi x2 at 761 GB/s
  effective (93% of HBM roofline).

Architecture: one Pallas program; a fori_loop walks row stripes with
double-buffered manual HBM->VMEM DMA (inputs for stripe i+1 are in
flight while stripe i computes, outputs drain asynchronously).  Row
stripes keep the lane (last) dimension whole, so column neighbors are
always in-block and only row halos are exchanged.

Boundary conditions (matching mgpoisson.kernels.xla):
  'ghost0' — out-of-range neighbors read 0 (`gpu.lua:72-75`).  Ghost
             rows are re-zeroed every sweep (they are boundary data,
             not grid cells).
  'face'   — ghost = -u_edge (tuned scheme's coarse levels).

2D f32/bf16 only; other ranks/dtypes fall back to XLA ops.  Set
MGPOISSON_PALLAS_INTERPRET=1 (or pass interpret=True) to run the
kernels in interpreter mode on CPU for differential tests.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mgpoisson.kernels import xla

# ---------------------------------------------------------------- config

_VMEM_BUDGET = 10 * 1024 * 1024   # conservative working-set budget
MIN_SIZE = 256                    # below this, XLA ops win (launch-bound)


def _interpret() -> bool:
    return os.environ.get("MGPOISSON_PALLAS_INTERPRET", "0") == "1"


def _supported(u, nu=1) -> bool:
    if u.ndim != 2 or u.shape[0] != u.shape[1]:
        return False
    if u.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    n = u.shape[0]
    return n >= MIN_SIZE and n % 128 == 0


def _pick_bm(n: int, halo: int, itemsize: int, n_bufs: int = 5) -> int:
    """Largest power-of-two stripe height (rows) such that n_bufs
    working buffers of (BM + 2*halo, n) fit the VMEM budget."""
    bm = n
    while bm > 8:
        if n_bufs * (bm + 2 * halo) * n * itemsize <= _VMEM_BUDGET \
                and n % bm == 0:
            return bm
        bm //= 2
    return 8


# ------------------------------------------------------- in-VMEM stencils

def _nbr(u, bc: str):
    """Neighbor sum on a (R, C) value; column BC applied inline, row BC
    is the caller's job (halo rows / per-sweep fixups)."""
    zrow = jnp.zeros_like(u[:1, :])
    up = jnp.concatenate([zrow, u[:-1, :]], axis=0)
    dn = jnp.concatenate([u[1:, :], zrow], axis=0)
    if bc == "face":
        lf = jnp.concatenate([-u[:, :1], u[:, :-1]], axis=1)
        rt = jnp.concatenate([u[:, 1:], -u[:, -1:]], axis=1)
    else:
        zcol = jnp.zeros_like(u[:, :1])
        lf = jnp.concatenate([zcol, u[:, :-1]], axis=1)
        rt = jnp.concatenate([u[:, 1:], zcol], axis=1)
    return up + dn + lf + rt


def _apply_row_bc(u, bc, is_first, is_last, top_ghost_row, bot_ghost_row):
    """Enforce the global row boundary condition on a stripe value.

    top_ghost_row/bot_ghost_row: local row index of the ghost row just
    outside the grid (top: first real row - 1; bottom: last real row + 1).
    is_first/is_last: traced booleans (does this stripe touch the edge).
    """
    R = u.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    if bc == "ghost0":
        u = jnp.where(is_first & (rows <= top_ghost_row), 0.0, u)
        u = jnp.where(is_last & (rows >= bot_ghost_row), 0.0, u)
    else:  # face: ghost = -edge row (static row indices -> static slices)
        top_edge = u[top_ghost_row + 1:top_ghost_row + 2, :]
        u = jnp.where(is_first & (rows == top_ghost_row), -top_edge, u)
        u = jnp.where(is_first & (rows < top_ghost_row), 0.0, u)
        bot_edge = u[bot_ghost_row - 1:bot_ghost_row, :]
        u = jnp.where(is_last & (rows == bot_ghost_row), -bot_edge, u)
        u = jnp.where(is_last & (rows > bot_ghost_row), 0.0, u)
    return u


# ------------------------------------------------- stripe DMA helpers
# Row-stripe transfers between HBM and VMEM scratch with halo clipping:
# stripe i of an (n, w) array covers rows [i*base - halo, i*base + base
# + halo), clipped to [0, n); clipped-away scratch rows hold stale data
# that the per-sweep boundary fixups neutralize.  All offsets/sizes are
# multiples of 8 (callers round base and halo to the sublane tile).

def _stripe_in(op, hbm, vref, sem, i, slot, base, halo, n_stripes):
    R = base + 2 * halo
    if halo == 0:
        getattr(pltpu.make_async_copy(
            hbm.at[pl.ds(pl.multiple_of(i * base, 8), base)],
            vref.at[slot], sem), op)()
        return

    @pl.when(i == 0)
    def _():
        getattr(pltpu.make_async_copy(
            hbm.at[pl.ds(0, R - halo)],
            vref.at[slot, pl.ds(halo, R - halo)], sem), op)()

    @pl.when((i > 0) & (i < n_stripes - 1))
    def _():
        getattr(pltpu.make_async_copy(
            hbm.at[pl.ds(pl.multiple_of(i * base - halo, 8), R)],
            vref.at[slot], sem), op)()

    @pl.when(i == n_stripes - 1)
    def _():
        getattr(pltpu.make_async_copy(
            hbm.at[pl.ds(pl.multiple_of(i * base - halo, 8), R - halo)],
            vref.at[slot, pl.ds(0, R - halo)], sem), op)()


def _sweeps(uv, fv, nu, smoother, bc, hsq, adiag, halo, bm,
            is_first, is_last, edge: bool = True):
    """nu in-VMEM smoother sweeps on a stripe value with per-sweep
    boundary-row fixups (see _apply_row_bc).

    The update (f - s/h^2) / (-4/h^2) is evaluated as 0.25*s + c1 with
    c1 = -h^2/4 * f hoisted out of the sweep loop: VPU divides cost
    many times a multiply-add, and c1 is sweep-invariant.

    `edge` is a STATIC flag: interior stripes contain only real grid
    rows (their halos are real neighbor rows), so the row-BC fixups are
    compiled out entirely — only the first/last stripes pay for them.
    """
    R_, n_ = uv.shape
    dtype = uv.dtype
    c1 = fv * jnp.asarray(-hsq * 0.25, dtype)
    quarter = jnp.asarray(0.25, dtype)
    omega = 0.8  # 2d/(2d+1), d=2 (kernels are 2D-specialized)
    one_m_om = jnp.asarray(1.0 - omega, dtype)
    om_quarter = jnp.asarray(omega * 0.25, dtype)
    c1w = fv * jnp.asarray(-hsq * 0.25 * omega, dtype)

    def row_bc(x):
        if not edge:
            return x
        return _apply_row_bc(x, bc, is_first, is_last, halo - 1, halo + bm)

    if smoother == "rbgs":
        rows = jax.lax.broadcasted_iota(jnp.int32, (R_, 1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, n_), 1)
        parity = (rows + cols + halo) % 2
    for _sweep in range(nu):
        uv = row_bc(uv)
        if smoother == "jacobi":
            uv = _nbr(uv, bc) * quarter + c1
        elif smoother == "wjacobi":
            uv = one_m_om * uv + _nbr(uv, bc) * om_quarter + c1w
        else:
            for p in (0, 1):
                upd = _nbr(uv, bc) * quarter + c1
                uv = jnp.where(parity == p, upd, uv)
                uv = row_bc(uv)
    return uv


# =====================================================================
# fused multi-sweep smoother
# =====================================================================

def _smooth_plan(n, nu, smoother, itemsize):
    """Stripe geometry: (halo, bm).  The dependency radius per sweep is
    1 (Jacobi variants) or 2 (red-black GS); halo rounds up to the
    sublane tile so DMA offsets stay 8-aligned.  Computed OUTSIDE the
    jitted kernel so that geometry (and the _VMEM_BUDGET it reads) is
    part of the jit cache key."""
    radius = 2 if smoother == "rbgs" else 1
    halo = -(-(radius * nu) // 8) * 8
    return halo, _pick_bm(n, halo, itemsize)


@functools.partial(
    jax.jit,
    static_argnames=("h", "nu", "smoother", "bc", "interpret", "halo", "bm"))
def _smooth_fused(u, f, *, h: float, nu: int, smoother: str, bc: str,
                  interpret: bool, halo: int, bm: int):
    n = u.shape[0]
    dtype = u.dtype
    n_stripes = n // bm
    assert n_stripes >= 2 and bm > 2 * halo, "caller picks the variant"
    R = bm + 2 * halo
    hsq = h * h
    adiag = -4.0 / hsq
    # red/black parity of local cell (r, c) in a stripe: global row is
    # i*bm - halo + r, and bm is even, so parity == (r + c + halo) % 2
    assert bm % 2 == 0

    def kernel(u_hbm, f_hbm, out_hbm, us, fs, outs, in_sems, out_sems):
        def issue(i, slot):
            _stripe_in("start", u_hbm, us, in_sems.at[slot, 0], i, slot,
                       bm, halo, n_stripes)
            _stripe_in("start", f_hbm, fs, in_sems.at[slot, 1], i, slot,
                       bm, halo, n_stripes)

        issue(0, 0)

        def body(i, _):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_stripes)
            def _():
                issue(i + 1, jax.lax.rem(i + 1, 2))

            _stripe_in("wait", u_hbm, us, in_sems.at[slot, 0], i, slot,
                       bm, halo, n_stripes)
            _stripe_in("wait", f_hbm, fs, in_sems.at[slot, 1], i, slot,
                       bm, halo, n_stripes)

            # a static-edge loop split (skipping row-BC fixups on
            # interior stripes) was tried: Mosaic stack-allocates each
            # body instance separately and runs out of VMEM
            uv = _sweeps(us[slot], fs[slot], nu, smoother, bc, hsq, adiag,
                         halo, bm, i == 0, i == n_stripes - 1)

            # wait for the out DMA that used this slot two stripes ago
            @pl.when(i >= 2)
            def _():
                pltpu.make_async_copy(
                    outs.at[slot], out_hbm.at[pl.ds(0, bm)],
                    out_sems.at[slot]).wait()

            outs[slot] = uv[halo:halo + bm, :]
            pltpu.make_async_copy(
                outs.at[slot],
                out_hbm.at[pl.ds(pl.multiple_of(i * bm, 8), bm)],
                out_sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, n_stripes, body, 0)

        # drain the last two output DMAs
        for k in (n_stripes - 2, n_stripes - 1):
            slot = k % 2
            pltpu.make_async_copy(
                outs.at[slot], out_hbm.at[pl.ds(k * bm, bm)],
                out_sems.at[slot]).wait()

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, n), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, R, n), dtype),      # u stripes
            pltpu.VMEM((2, R, n), dtype),      # f stripes
            pltpu.VMEM((2, bm, n), dtype),     # out stripes
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(u, f)


@functools.partial(
    jax.jit, static_argnames=("h", "nu", "smoother", "bc", "interpret"))
def _smooth_whole(u, f, *, h, nu, smoother, bc, interpret):
    """Whole-array-in-VMEM variant for levels that fit (n <= ~1024 f32)."""
    n = u.shape[0]
    hsq = h * h
    adiag = -4.0 / hsq

    def kernel(u_ref, f_ref, out_ref):
        uv = u_ref[:]
        fv = f_ref[:]
        c1 = fv * jnp.asarray(-hsq * 0.25, uv.dtype)
        quarter = jnp.asarray(0.25, uv.dtype)
        omega = 0.8
        one_m_om = jnp.asarray(1.0 - omega, uv.dtype)
        om_quarter = jnp.asarray(omega * 0.25, uv.dtype)
        c1w = fv * jnp.asarray(-hsq * 0.25 * omega, uv.dtype)
        if smoother == "rbgs":
            rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
            parity = (rows + cols) % 2
        for _ in range(nu):
            if smoother == "jacobi":
                uv = _nbr_full(uv, bc) * quarter + c1
            elif smoother == "wjacobi":
                uv = one_m_om * uv + _nbr_full(uv, bc) * om_quarter + c1w
            else:
                for p in (0, 1):
                    upd = _nbr_full(uv, bc) * quarter + c1
                    uv = jnp.where(parity == p, upd, uv)
        out_ref[:] = uv

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, n), u.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(u, f)


def _nbr_full(u, bc):
    """Neighbor sum for a full grid in VMEM (row AND column bc inline)."""
    if bc == "face":
        up = jnp.concatenate([-u[:1, :], u[:-1, :]], axis=0)
        dn = jnp.concatenate([u[1:, :], -u[-1:, :]], axis=0)
        lf = jnp.concatenate([-u[:, :1], u[:, :-1]], axis=1)
        rt = jnp.concatenate([u[:, 1:], -u[:, -1:]], axis=1)
    else:
        zr = jnp.zeros_like(u[:1, :])
        zc = jnp.zeros_like(u[:, :1])
        up = jnp.concatenate([zr, u[:-1, :]], axis=0)
        dn = jnp.concatenate([u[1:, :], zr], axis=0)
        lf = jnp.concatenate([zc, u[:, :-1]], axis=1)
        rt = jnp.concatenate([u[:, 1:], zc], axis=1)
    return up + dn + lf + rt


# =====================================================================
# public op interface (same signature as mgpoisson.kernels.xla)
# =====================================================================

def smooth(u, f, h, nu, smoother="jacobi", bc="ghost0"):
    if nu == 0:
        return u
    if not _supported(u):
        return xla.smooth(u, f, h, nu, smoother, bc)
    # cap per-call halo depth; chain kernels for very deep smooth counts
    max_nu = 4 if smoother == "rbgs" else 8
    out = u
    left = nu
    n = u.shape[0]
    itemsize = jnp.dtype(u.dtype).itemsize
    while left > 0:
        k = min(left, max_nu)
        halo, bm = _smooth_plan(n, k, smoother, itemsize)
        if n // bm < 2 or bm <= 2 * halo:
            # striping degenerates: either the whole array fits VMEM
            # (small levels) or the rows are too wide for any stripe
            # budget (very large n) — then the XLA sweeps, which are
            # already near-roofline per sweep, take over
            if 4 * n * n * itemsize <= _VMEM_BUDGET:
                out = _smooth_whole(out, f, h=float(h), nu=k,
                                    smoother=smoother, bc=bc,
                                    interpret=_interpret())
            else:
                return xla.smooth(out, f, h, left, smoother, bc)
        else:
            out = _smooth_fused(out, f, h=float(h), nu=k,
                                smoother=smoother, bc=bc,
                                interpret=_interpret(), halo=halo, bm=bm)
        left -= k
    return out


# ------------------------------------------------- composite (fused) ops
# One call per V-cycle half-level.  A fully in-kernel version of these
# (smoother + residual + row-pair restrict in one Pallas program, and
# lane-expanded prolongation + correction + smoother in another) was
# built and measured: Mosaic compile time explodes (450 s for the
# pre-half kernel) and the runtime LOSES to the composite below (the
# XLA reduce_window / repeat transfer paths overlap better than the
# hand-fused VMEM blends).  The composite keeps the Pallas multi-sweep
# smoother where fusion pays and XLA where its native paths win.

def smooth_residual_restrict(u, f, h, nu, smoother="jacobi", bc="ghost0"):
    """pre-smooth x nu, then R = restrict(residual). Returns (u, R)."""
    u = smooth(u, f, h, nu, smoother, bc)
    return u, xla.residual_restrict(u, f, h, bc)


def prolong_correct_smooth(u, f, V, h, nu, smoother="jacobi", bc="ghost0",
                           kind="inject"):
    """u += P(V), then post-smooth x nu."""
    u = xla.prolong_correct(u, V, kind)
    return smooth(u, f, h, nu, smoother, bc)


# ---------------------------------------------------------------------
# residual_restrict / prolong_correct (unfused): XLA formulations are
# already on native paths (reduce_window restrict + repeat
# prolongation); Mosaic lacks the lane interleave a fully fused kernel
# would need, so Pallas adds nothing for the standalone ops; delegate.

residual_restrict = xla.residual_restrict
prolong_correct = xla.prolong_correct


# --------------------------------------------------- delegated ops
# (identical semantics; no Pallas value-add or not yet specialized)

neighbor_sum = xla.neighbor_sum
jacobi_sweep = xla.jacobi_sweep
rbgs_sweep = xla.rbgs_sweep
residual = xla.residual
apply_operator = xla.apply_operator
restrict = xla.restrict
prolong = xla.prolong
coarse_solve = xla.coarse_solve
rms_update = xla.rms_update
rel_err = xla.rel_err
residual_norm = xla.residual_norm
