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

# working-set budget for kernel planning (stripe/block sizing).  The
# physical per-core VMEM is much larger (v5e: 128 MiB), but Mosaic
# needs headroom for spills and the planner's estimate is approximate;
# override for tuning with MGPOISSON_VMEM_BUDGET_MB.  16 MB won the
# tools/tune_kernels.py sweep on v5e (2026-08-18): vs 10 MB it widens
# the 4096^2 stripes 64->128 rows (V-cycle 1.385 -> 1.352 ms) and the
# 16384^2 wide blocks to (256, 2048) (24.65 -> 23.63 ms); 24-32 MB
# gain nothing more and 32 MB trips a Mosaic compile crash on the
# whole-VMEM mid-level kernels.
_VMEM_BUDGET = int(os.environ.get(
    "MGPOISSON_VMEM_BUDGET_MB", "16")) * 1024 * 1024
MIN_SIZE = 256                    # below this, XLA ops win (launch-bound)

# Mosaic's scoped-VMEM limit defaults to 16 MiB; the physical v5e VMEM
# is 128 MiB.  A 2048^2 bf16 striped composite at the 10 MB budget was
# measured at 16.7 MiB actual (the compiler's stack temporaries are not
# in the planner's estimate) and rejected under the 16 MiB default, so
# the limit must sit slightly above it.  But NOT far above: the limit
# value feeds Mosaic's allocation decisions, and large values degrade
# the generated code — at 100 MB the 4096^2 f32 sweep measured ~400
# GB/s vs ~715 at 16-20 MB (A/B on v5e, 2026-08-18).  The default is
# max(20 MB, 2x budget) so a budget override alone never trips the
# rejection; override with MGPOISSON_VMEM_LIMIT_MB.
_VMEM_LIMIT = int(os.environ.get(
    "MGPOISSON_VMEM_LIMIT_MB",
    str(max(20, 2 * (_VMEM_BUDGET >> 20))))) * 1024 * 1024


def _compiler_params(vmem_bytes: int | None = None):
    """vmem_bytes: the kernel's exact scratch census, when known.  The
    declared limit is then census + 16 MB of Mosaic value-stack
    headroom (measured: the bm=64 write-through packed kernel's
    Mosaic stack demand is ~13.8 MB above its 23.1 MB scratch census),
    clamped to [20, 72] MB — v5e's scoped-vmem ceiling is ~112 MB, so
    a single hot kernel may honestly declare past the default 32 MB
    where its census demands it, while small kernels stay tight."""
    limit = _VMEM_LIMIT
    if vmem_bytes is not None:
        limit = max(20 * 1024 * 1024,
                    min(72 * 1024 * 1024,
                        vmem_bytes + (16 << 20)))
    return pltpu.CompilerParams(has_side_effects=True,
                                vmem_limit_bytes=limit)


def _interpret() -> bool:
    return os.environ.get("MGPOISSON_PALLAS_INTERPRET", "0") == "1"


# In-place HBM writes for large arrays.  Measured on v5e (2026-08-19):
# Pallas kernels whose output is a separate >= 128 MiB HBM buffer run at
# ~400 GB/s while the same kernel writing IN PLACE (input_output_aliases)
# runs at ~680 GB/s — reads+writes to one buffer keep HBM page locality,
# and the effect follows per-array byte size exactly (64 MiB arrays show
# no cliff; aliasing the output to a different same-shape buffer does
# not help, it must be the same address).  XLA stays correct either way:
# if the aliased input is still live at the call site it inserts a
# defensive copy.  In the V-cycle every smoothed iterate is consumed by
# the next half-level op, so the alias is free where it matters.
# Requires the fresh-read + VMEM-halo-carry DMA scheme (reads never
# overlap an earlier stripe's writeback range, and each stripe's reads
# are waited before its write is issued), which all striped kernels use.
_INPLACE_MIN = int(os.environ.get(
    "MGPOISSON_PALLAS_INPLACE_MIN_BYTES", str(128 << 20)))


def _alias(u, in_idx: int = 0, out_idx: int = 0):
    """input_output_aliases for pallas_call: write u's successor in
    place when the array is big enough to hit the bandwidth cliff."""
    if u.size * jnp.dtype(u.dtype).itemsize >= _INPLACE_MIN:
        return {in_idx: out_idx}
    return {}


def _supported(u, nu=1) -> bool:
    if u.ndim != 2 or u.shape[0] != u.shape[1]:
        return False
    if u.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    n = u.shape[0]
    return n >= MIN_SIZE and n % 128 == 0


# Mosaic bf16 stability clamps (crashes observed on v5e, 2026-08-18,
# all tpu_compile_helper-subprocess-exit-1 internal errors): whole-VMEM
# kernels crash at 1024^2 bf16 (512^2 compiles fine), and striped rbgs
# crashes at bm=512 bf16 (bm=256 fine).  Clamp the geometry instead of
# chasing the compiler — bf16 kernels are byte-bound, so stripe size
# barely moves them.  bench/parity.py covers both shapes on device.
_BF16_WHOLE_MAX_N = 512
_BF16_RBGS_MAX_BM = 256


def _bf16_whole_ok(n: int, itemsize: int) -> bool:
    return itemsize >= 4 or n <= _BF16_WHOLE_MAX_N


def _pick_bm(n: int, halo: int, itemsize: int, n_bufs: int = 5,
             smoother: str = "", max_bm: int = 0) -> int:
    """Largest power-of-two stripe height (rows) such that n_bufs
    working buffers of (BM + 2*halo, n) fit the VMEM budget."""
    bm = n
    cap = (_BF16_RBGS_MAX_BM
           if itemsize < 4 and smoother == "rbgs" else n)
    if max_bm:
        cap = min(cap, max_bm)
    while bm > 8:
        if bm <= cap \
                and n_bufs * (bm + 2 * halo) * n * itemsize <= _VMEM_BUDGET \
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


# ------------------------------------------- packed-parity red-black GS
# The where-select RBGS form evaluates the full 5-point stencil twice
# per sweep and discards half of each evaluation.  Packing the two
# checkerboard colors into lane-contiguous (R, n/2) arrays makes one RB
# sweep cost ~one stencil of VPU work: measured 6.89 -> 2.79 us/sweep
# at 1024^2 f32 on v5e (where-select vs packed, whole-VMEM, max diff
# 1.8e-7 — add-order rounding only).  Pack/unpack are exact MXU
# selection matmuls (one contributor per output lane), amortized over
# all nu sweeps of a kernel invocation.
#
# OFF BY DEFAULT after on-device measurement (v5e, 2026-08-19): the
# per-call pack/unpack is ~5 full-array lane selections = ~14 G MAC at
# 4096^2 striped, and at precision=HIGHEST (6 MXU passes; required —
# DEFAULT would round u to bf16 every smooth call) that costs ~0.7 ms,
# swamping the ~0.1 ms/sweep VPU saving at every production nu: the
# nu=1 striped smoother measured 1.03 ms packed vs 0.30 ms
# where-select; break-even is nu ~ 11 and rbgs kernels are capped at
# nu <= 4.  (The 18-sweep microbench regime that motivated this hid
# the fixed cost.)  The form that WOULD win is packed-persistent
# state — u/f kept checkerboard-packed in HBM across the whole solve,
# pack/unpack only at level handoffs (restrict in packed space is a
# sublane pair-sum of xr+xb, cheaper than the lane-halve matmul) — a
# future kernel-layer redesign, not a per-call flag.  The path stays
# correct and differentially tested (tests/test_rbgs_packed.py, all
# modes/bcs) behind MGPOISSON_RBGS_PACKED=1 for that work.
#
# Layout: xr[i, j] = u[i, 2j + i%2]   (color of parity (r+c)%2 == 0)
#         xb[i, j] = u[i, 2j + 1 - i%2]  (parity 1)
# which is globally correct because every caller's buffer origin is
# even on both axes (stripe bases and halos are multiples of 8, wide-
# block column offsets multiples of 128).  Neighbor identities:
#   up/dn of xr[i, j]    = xb[i-1, j], xb[i+1, j]
#   left+right of xr[i,j]= xb[i, j] + (xb[i, j-1] if row even
#                                      else xb[i, j+1])
# and symmetrically for xb with the horizontal shift direction flipped.

_RBGS_PACKED = os.environ.get("MGPOISSON_RBGS_PACKED", "0") == "1"


def _pack_sel_mats(dtype):
    """(C, C/2) even/odd lane-selection matrices, built from iota so no
    kernel operand is needed.  Entries are exactly 0/1 and each output
    lane has exactly one contributor, so the selection matmuls are
    exact at any precision."""
    c = _LANE_CHUNK
    r_i = jax.lax.broadcasted_iota(jnp.int32, (c, c // 2), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (c, c // 2), 1)
    se = (r_i == 2 * c_i).astype(dtype)
    so = (r_i == 2 * c_i + 1).astype(dtype)
    return se, so


def _sel_dot_t(x, m):
    """x @ m.T without materializing the transpose (_sel_dot twin)."""
    dtype = x.dtype
    if jnp.dtype(dtype) == jnp.bfloat16:
        x, m = x.astype(jnp.float32), m.astype(jnp.float32)
    out = jax.lax.dot_general(x, m, (((1,), (1,)), ((), ())),
                              precision=_HI,
                              preferred_element_type=x.dtype)
    return out.astype(dtype)


def _lane_pack(x, m):
    """(r, n) -> (r, n/2): select even (m=se) or odd (m=so) lanes."""
    c = m.shape[0]
    parts = [_sel_dot(x[:, k * c:(k + 1) * c], m)
             for k in range(x.shape[1] // c)]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def _lane_unpack(xe, xo, se, so):
    """Interleave even/odd lane halves back to (r, n)."""
    ch = se.shape[1]
    parts = [_sel_dot_t(xe[:, k * ch:(k + 1) * ch], se)
             + _sel_dot_t(xo[:, k * ch:(k + 1) * ch], so)
             for k in range(xe.shape[1] // ch)]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def _shift_sub_dn(x):  # out[i] = x[i-1], zero row in at the top
    return jnp.concatenate([jnp.zeros_like(x[:1, :]), x[:-1, :]], axis=0)


def _shift_sub_up(x):  # out[i] = x[i+1]
    return jnp.concatenate([x[1:, :], jnp.zeros_like(x[:1, :])], axis=0)


def _shift_lane_r(x):  # out[:, j] = x[:, j-1]
    return jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)


def _shift_lane_l(x):  # out[:, j] = x[:, j+1]
    return jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)


def _rbgs_packed_sweeps(uv, fv, nu, bc, hsq, *, halo, bm,
                        is_first, is_last, edge=True,
                        hc=0, bcw=0, cf=None, cl=None):
    """nu red-black Gauss-Seidel sweeps in checkerboard-packed layout.

    Row geometry (mirrors _sweeps / _apply_row_bc):
      halo > 0  — stripe mode: physical ghost rows at local tg = halo-1
                  and bg = halo+bm when is_first/is_last; 'face' writes
                  the cross-color reflection xr[tg] = -xb[tg+1] (same
                  fine column by the packing identity), 'ghost0' zeroes.
      halo == 0 — whole-grid mode: top/bottom rows are physical grid
                  edges; 'face' adds the virtual-ghost correction -X
                  on the edge rows of the vertical neighbor sum.
    Column geometry:
      hc == 0 — full-width rows (striped/whole kernels): columns are
                global; 'face' adds -X edge-column corrections gated on
                row parity, 'ghost0' is the natural zero shift-in.
      hc > 0  — two-axis wide block ('ghost0' only, the caller
                guarantees): per-half-sweep zeroing of the global ghost
                lanes, which land on the SAME packed column range for
                both colors because hc and bcw are even.
    Matches the where-select form's fixup schedule exactly: fix, red,
    fix, black, fix per sweep.
    """
    R_, n_ = uv.shape
    dtype = uv.dtype
    assert n_ % 2 == 0 and n_ % _LANE_CHUNK == 0
    assert hc == 0 or bc == "ghost0"
    quarter = jnp.asarray(0.25, dtype)
    c1 = fv * jnp.asarray(-hsq * 0.25, dtype)
    se, so = _pack_sel_mats(dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (R_, 1), 0)
    er = (rows % 2) == 0
    # Stale-region sanitize BEFORE packing: clipped edge DMAs leave
    # stale (possibly non-finite) rows/cols in the buffer.  The
    # where-select form neutralizes them with its per-sweep fixups;
    # here the pack matmuls would smear a NaN across the whole
    # 256-lane chunk first (0 * NaN = NaN), so zero those regions on
    # the unpacked values (bc_fix rewrites every ghost cell before any
    # read, so zeroing is safe for both bcs).
    if edge and halo > 0:
        m = (is_first & (rows <= halo - 1)) | (is_last & (rows >= halo + bm))
        uv = jnp.where(m, 0.0, uv)
        c1 = jnp.where(m, 0.0, c1)
    if hc > 0:
        fcols = jax.lax.broadcasted_iota(jnp.int32, (1, n_), 1)
        m = (cf & (fcols <= hc - 1)) | (cl & (fcols >= hc + bcw))
        uv = jnp.where(m, 0.0, uv)
        c1 = jnp.where(m, 0.0, c1)
    ue, uo = _lane_pack(uv, se), _lane_pack(uv, so)
    xr, xb = jnp.where(er, ue, uo), jnp.where(er, uo, ue)
    ce, co = _lane_pack(c1, se), _lane_pack(c1, so)
    cr, cb = jnp.where(er, ce, co), jnp.where(er, co, ce)
    xr, xb = _packed_core(xr, xb, cr, cb, nu, bc, halo=halo, bm=bm,
                          is_first=is_first, is_last=is_last, edge=edge,
                          hc=hc, bcw=bcw, cf=cf, cl=cl)
    return _lane_unpack(jnp.where(er, xr, xb), jnp.where(er, xb, xr),
                        se, so)


def _packed_core(xr, xb, cr, cb, nu, bc, *, halo, bm, is_first, is_last,
                 edge=True, hc=0, bcw=0, cf=None, cl=None):
    """The sweep loop of _rbgs_packed_sweeps on ALREADY-PACKED color
    arrays (xr/xb the red/black planes, cr/cb = -h^2/4 * f packed the
    same way).  Shared by the per-call packed form above and the
    packed-PERSISTENT kernels (_packed_rr_fused / _packed_pc_fused),
    whose state never leaves the packed layout between solve
    boundaries.  Returns (xr, xb) with the final boundary fixup
    applied (ghost rows hold bc data — safe for residual reads)."""
    R_, w = xr.shape
    quarter = jnp.asarray(0.25, xr.dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (R_, 1), 0)
    er = (rows % 2) == 0
    tg, bg = halo - 1, halo + bm

    if hc > 0:
        pcols = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        m_cl = cf & (pcols <= hc // 2 - 1)
        m_cr = cl & (pcols >= (hc + bcw) // 2)

    def bc_fix(xr, xb):
        if edge and halo > 0:
            if bc == "ghost0":
                for m in (is_first & (rows <= tg), is_last & (rows >= bg)):
                    xr = jnp.where(m, 0.0, xr)
                    xb = jnp.where(m, 0.0, xb)
            else:  # face: ghost row = -(partner color's edge row)
                nxr = jnp.where(is_first & (rows == tg), -xb[tg + 1:tg + 2, :], xr)
                nxb = jnp.where(is_first & (rows == tg), -xr[tg + 1:tg + 2, :], xb)
                nxr = jnp.where(is_last & (rows == bg), -xb[bg - 1:bg, :], nxr)
                nxb = jnp.where(is_last & (rows == bg), -xr[bg - 1:bg, :], nxb)
                for m in (is_first & (rows < tg), is_last & (rows > bg)):
                    nxr = jnp.where(m, 0.0, nxr)
                    nxb = jnp.where(m, 0.0, nxb)
                xr, xb = nxr, nxb
        if hc > 0:
            for m in (m_cl, m_cr):
                xr = jnp.where(m, 0.0, xr)
                xb = jnp.where(m, 0.0, xb)
        return xr, xb

    def color_update(X, Y, cX, red):
        V = _shift_sub_dn(Y) + _shift_sub_up(Y)
        if halo == 0 and bc == "face" and edge:
            # virtual ghost above/below the grid edge = -(the cell)
            V = jnp.concatenate(
                [V[:1] - X[:1], V[1:-1], V[-1:] - X[-1:]], axis=0)
        a, b = _shift_lane_r(Y), _shift_lane_l(Y)
        H = Y + (jnp.where(er, a, b) if red else jnp.where(er, b, a))
        if hc == 0 and bc == "face":
            # global edge columns: ghost = -(the cell); which rows of
            # each packed array sit on the edge depends on row parity
            z = jnp.zeros_like(X[:, :1])
            if red:
                c0 = jnp.where(er, -X[:, :1], z)
                c9 = jnp.where(er, z, -X[:, -1:])
            else:
                c0 = jnp.where(er, z, -X[:, :1])
                c9 = jnp.where(er, -X[:, -1:], z)
            H = jnp.concatenate(
                [H[:, :1] + c0, H[:, 1:-1], H[:, -1:] + c9], axis=1)
        return (V + H) * quarter + cX

    xr, xb = bc_fix(xr, xb)
    for _ in range(nu):
        xr = color_update(xr, xb, cr, red=True)
        xr, xb = bc_fix(xr, xb)
        xb = color_update(xb, xr, cb, red=False)
        xr, xb = bc_fix(xr, xb)
    return xr, xb


def _packed_residual(xr, xb, fr, fb, inv_hsq, er):
    """Packed 5-point residual r = f - (nbr - 4u)/h^2 per color.

    Neighbor identities (see the packed-layout header above): the four
    neighbors of a red cell are black — vertically the SAME packed
    lane, horizontally the same lane plus the row-parity-dependent
    adjacent lane; symmetrically for black with the horizontal shift
    direction flipped.  Ghost rows/columns must already hold bc data
    (call after _packed_core; ghost0 column zeros are the natural
    shift-in)."""
    dtype = xr.dtype
    c = jnp.asarray(inv_hsq, dtype)
    nr = (_shift_sub_dn(xb) + _shift_sub_up(xb) + xb
          + jnp.where(er, _shift_lane_r(xb), _shift_lane_l(xb)))
    nb = (_shift_sub_dn(xr) + _shift_sub_up(xr) + xr
          + jnp.where(er, _shift_lane_l(xr), _shift_lane_r(xr)))
    r_r = fr - (nr - 4.0 * xr) * c
    r_b = fb - (nb - 4.0 * xb) * c
    return r_r, r_b


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


def _stripe_in_fresh(op, hbm, vref, sem, i, slot, base, halo, n_stripes):
    """Fresh-rows-only stripe load: rows [i*base + halo, i*base + base
    + halo) into vref rows [2*halo, R); the head rows [0, 2*halo) =
    global [i*base - halo, i*base + halo) are copied from the PREVIOUS
    stripe's buffer in VMEM by the caller (consecutive stripes overlap
    by exactly 2*halo rows), so u and f cross HBM exactly once.  The
    i == 0 stripe has no predecessor and loads [0, base + halo) whole.
    """
    R = base + 2 * halo

    @pl.when(i == 0)
    def _():
        getattr(pltpu.make_async_copy(
            hbm.at[pl.ds(0, R - halo)],
            vref.at[slot, pl.ds(halo, R - halo)], sem), op)()

    @pl.when((i > 0) & (i < n_stripes - 1))
    def _():
        getattr(pltpu.make_async_copy(
            hbm.at[pl.ds(pl.multiple_of(i * base + halo, 8), base)],
            vref.at[slot, pl.ds(2 * halo, base)], sem), op)()

    @pl.when(i == n_stripes - 1)
    def _():
        getattr(pltpu.make_async_copy(
            hbm.at[pl.ds(pl.multiple_of(i * base + halo, 8),
                         base - halo)],
            vref.at[slot, pl.ds(2 * halo, base - halo)], sem), op)()


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
        if _RBGS_PACKED and n_ % _LANE_CHUNK == 0:
            return _rbgs_packed_sweeps(
                uv, fv, nu, bc, hsq, halo=halo, bm=bm,
                is_first=is_first, is_last=is_last, edge=edge)
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

def _smooth_plan(n, nu, smoother, itemsize, max_bm=0):
    """Stripe geometry: (halo, bm).  The dependency radius per sweep is
    1 (Jacobi variants) or 2 (red-black GS); halo rounds up to the
    sublane tile so DMA offsets stay 8-aligned.  Computed OUTSIDE the
    jitted kernel so that geometry (and the _VMEM_BUDGET it reads) is
    part of the jit cache key."""
    radius = 2 if smoother == "rbgs" else 1
    halo = -(-(radius * nu) // 8) * 8
    return halo, _pick_bm(n, halo, itemsize, smoother=smoother,
                          max_bm=max_bm)


@functools.partial(
    jax.jit,
    static_argnames=("h", "nu", "smoother", "bc", "interpret", "halo", "bm"))
def _smooth_fused(u, f, *, h: float, nu: int, smoother: str, bc: str,
                  interpret: bool, halo: int, bm: int):
    n = u.shape[0]
    dtype = u.dtype
    n_stripes = n // bm
    assert n_stripes >= 2 and bm > 2 * halo, "caller picks the variant"
    # the fresh-halo head copy (us[other] rows [0, 2*halo)) overlaps in
    # time with the fresh DMA writing rows [2*halo, R) of the same
    # buffer; their disjointness at (8, 128)-tile granularity requires
    # the 8-row-aligned halo _smooth_plan always produces
    assert halo % 8 == 0, "in-flight-DMA disjointness needs 8-row halo"
    R = bm + 2 * halo
    hsq = h * h
    adiag = -4.0 / hsq
    # red/black parity of local cell (r, c) in a stripe: global row is
    # i*bm - halo + r, and bm is even, so parity == (r + c + halo) % 2
    assert bm % 2 == 0

    def kernel(u_hbm, f_hbm, out_hbm, us, fs, outs, in_sems, out_sems):
        def issue(i, slot):
            _stripe_in_fresh("start", u_hbm, us, in_sems.at[slot, 0], i,
                             slot, bm, halo, n_stripes)
            _stripe_in_fresh("start", f_hbm, fs, in_sems.at[slot, 1], i,
                             slot, bm, halo, n_stripes)

        issue(0, 0)

        def body(i, _):
            slot = jax.lax.rem(i, 2)
            other = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < n_stripes)
            def _():
                issue(i + 1, other)

            _stripe_in_fresh("wait", u_hbm, us, in_sems.at[slot, 0], i,
                             slot, bm, halo, n_stripes)
            _stripe_in_fresh("wait", f_hbm, fs, in_sems.at[slot, 1], i,
                             slot, bm, halo, n_stripes)

            # hand the next stripe its head (the 2*halo overlap rows)
            # from this stripe's freshly loaded buffer — consecutive
            # stripes overlap exactly there, so the halo never crosses
            # HBM twice; disjoint from the fresh-row DMA in flight
            @pl.when(i + 1 < n_stripes)
            def _():
                us[other, pl.ds(0, 2 * halo)] = us[slot,
                                                   pl.ds(bm, 2 * halo)]
                fs[other, pl.ds(0, 2 * halo)] = fs[slot,
                                                   pl.ds(bm, 2 * halo)]

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
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        input_output_aliases=_alias(u),
        scratch_shapes=[
            pltpu.VMEM((2, R, n), dtype),      # u stripes
            pltpu.VMEM((2, R, n), dtype),      # f stripes
            pltpu.VMEM((2, bm, n), dtype),     # out stripes
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(u, f)


@functools.partial(
    jax.jit, static_argnames=("h", "nu", "smoother", "bc", "interpret"))
def _smooth_whole(u, f, *, h, nu, smoother, bc, interpret):
    """Whole-array-in-VMEM variant for levels that fit (n <= ~1024 f32)."""
    n = u.shape[0]
    hsq = h * h

    def kernel(u_ref, f_ref, out_ref):
        out_ref[:] = _whole_sweeps(u_ref[:], f_ref[:], nu, smoother,
                                   bc, hsq)

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
# wide-grid 2D kernels: two-axis blocking for n >= 8192
# =====================================================================
# At n >= 8192 a full row stripe no longer fits VMEM (a single 16384-
# lane f32 row is 64 KB; five double-buffered stripes blow the budget),
# so the single-axis scheme degenerates and round 1 fell back to XLA
# for the fine levels of BASELINE config 5.  These kernels block BOTH
# axes: rows keep the 8-aligned sublane halo, columns get a 128-lane-
# aligned halo (the lane-dim DMA granularity).  Column halos behave
# exactly like row halos — recomputed redundantly, one lane of
# exactness lost per sweep — and the global column BC becomes a traced
# per-block fixup like _apply_row_bc (the inline value-edge BC of _nbr
# is only correct when the block spans the full row).


def _apply_col_bc(u, bc, is_first, is_last, lf_ghost_col, rt_ghost_col):
    """Column twin of _apply_row_bc for lane-blocked values."""
    C = u.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    if bc == "ghost0":
        u = jnp.where(is_first & (cols <= lf_ghost_col), 0.0, u)
        u = jnp.where(is_last & (cols >= rt_ghost_col), 0.0, u)
    else:  # face
        lf_edge = u[:, lf_ghost_col + 1:lf_ghost_col + 2]
        u = jnp.where(is_first & (cols == lf_ghost_col), -lf_edge, u)
        u = jnp.where(is_first & (cols < lf_ghost_col), 0.0, u)
        rt_edge = u[:, rt_ghost_col - 1:rt_ghost_col]
        u = jnp.where(is_last & (cols == rt_ghost_col), -rt_edge, u)
        u = jnp.where(is_last & (cols > rt_ghost_col), 0.0, u)
    return u


def _nbr_plain(u):
    """5-point neighbor sum with zero fill at the VALUE edges (which
    are halo cells in a two-axis block — their corruption is part of
    the per-sweep halo degradation, not a boundary condition)."""
    zrow = jnp.zeros_like(u[:1, :])
    up = jnp.concatenate([zrow, u[:-1, :]], axis=0)
    dn = jnp.concatenate([u[1:, :], zrow], axis=0)
    zcol = jnp.zeros_like(u[:, :1])
    lf = jnp.concatenate([zcol, u[:, :-1]], axis=1)
    rt = jnp.concatenate([u[:, 1:], zcol], axis=1)
    return (up + dn) + (lf + rt)


_HC = 128   # lane-aligned column halo


def _sweeps_wide(uv, fv, nu, smoother, bc, hsq, hr, bm, hc, bcw,
                 rf, rl, cf, cl):
    """nu sweeps on a two-axis block value with per-sweep row AND
    column boundary fixups (rf/rl/cf/cl: traced edge flags)."""
    R_, C_ = uv.shape
    dtype = uv.dtype
    c1 = fv * jnp.asarray(-hsq * 0.25, dtype)
    quarter = jnp.asarray(0.25, dtype)
    omega = 0.8
    one_m_om = jnp.asarray(1.0 - omega, dtype)
    om_quarter = jnp.asarray(omega * 0.25, dtype)
    c1w = fv * jnp.asarray(-hsq * 0.25 * omega, dtype)

    def bcfix(x):
        x = _apply_row_bc(x, bc, rf, rl, hr - 1, hr + bm)
        return _apply_col_bc(x, bc, cf, cl, hc - 1, hc + bcw)

    if smoother == "rbgs":
        if _RBGS_PACKED and bc == "ghost0" and C_ % _LANE_CHUNK == 0:
            return _rbgs_packed_sweeps(
                uv, fv, nu, bc, hsq, halo=hr, bm=bm,
                is_first=rf, is_last=rl, hc=hc, bcw=bcw, cf=cf, cl=cl)
        rows = jax.lax.broadcasted_iota(jnp.int32, (R_, 1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, C_), 1)
        parity = (rows + cols + hr + hc) % 2   # bm, bc even
    for _sweep in range(nu):
        uv = bcfix(uv)
        if smoother == "jacobi":
            uv = _nbr_plain(uv) * quarter + c1
        elif smoother == "wjacobi":
            uv = one_m_om * uv + _nbr_plain(uv) * om_quarter + c1w
        else:
            for p in (0, 1):
                upd = _nbr_plain(uv) * quarter + c1
                uv = jnp.where(parity == p, upd, uv)
                uv = bcfix(uv)
    return uv


def _plan_wide(n, nu, smoother, itemsize, n_v_bufs=0):
    """(hr, bm, bc) for a two-axis-blocked kernel, or None.  Searches
    power-of-two (bm, bc) maximizing the useful fraction within the
    VMEM budget (u, f double-buffered with halos; out double-buffered;
    n_v_bufs extra coarse-block buffers of ~(bm/2+16, bc/2+256))."""
    radius = 2 if smoother == "rbgs" else 1
    hr = 8
    if radius * nu > hr:
        return None
    # the wide census may exceed the global stripe budget by a little:
    # 16384^2 f32 measured (nu=3 wjacobi, rr+pc fine level) 16.9 ms at
    # the 16 MB-fitting (128, 2048) blocks vs 15.4 ms at (128, 4096)
    # whose 16.7 MB census still compiles comfortably (the ~20 MB
    # Mosaic envelope); (256, 4096) and (128, 8192) at ~31 MB crash
    budget = max(_VMEM_BUDGET, 17 * 1024 * 1024)
    best = None
    for bm in (256, 128, 64, 32):
        if n % bm:
            continue
        for bc in (8192, 4096, 2048, 1024):
            if n % bc or (n // bm) * (n // bc) < 2:
                continue
            vmem = itemsize * (4 * (bm + 2 * hr) * (bc + 2 * _HC)
                               + 2 * bm * bc
                               + 2 * hr * n   # block-row boundary stash
                               + n_v_bufs * (bm // 2 + 16) * (bc // 2
                                                              + 2 * _HC))
            if vmem > budget:
                continue
            # wider bc as tiebreak: fewer, larger lane windows measure
            # faster at equal utilization (column-halo DMA count)
            util = ((bm * bc) / ((bm + 2 * hr) * (bc + 2 * _HC)), bc)
            if best is None or util > best[0]:
                best = (util, hr, bm, bc)
    return None if best is None else best[1:]


def _mult8(x):
    return x if isinstance(x, int) else pl.multiple_of(x, 8)


def _mult128(x):
    return x if isinstance(x, int) else pl.multiple_of(x, 128)


def _ident(x):
    return x


def _block_in(op, hbm, vref, sem, i0, i1, slot, geom0, geom1,
              align0, align1):
    """Start/wait a block DMA clipped along the two LEADING axes of
    hbm/vref (any trailing axes transfer whole).  geomN = (base, halo,
    n_stripes) per axis; alignN wraps that axis's source offset in its
    pl.multiple_of annotation (_mult8 for sublane axes, _mult128 for
    lane axes, _ident for untiled leading axes)."""
    _block_in_cases(op, hbm, vref, sem, slot,
                    _axis_cases(i0, *geom0), _axis_cases(i1, *geom1),
                    align0, align1)


def _block_in_cases(op, hbm, vref, sem, slot, cases0, cases1,
                    align0, align1):
    for c0, s0, l0, d0 in cases0:
        for c1, s1, l1, d1 in cases1:
            cond = None
            if c0 is not None:
                cond = c0
            if c1 is not None:
                cond = c1 if cond is None else cond & c1

            def dma(s0=s0, l0=l0, d0=d0, s1=s1, l1=l1, d1=d1):
                getattr(pltpu.make_async_copy(
                    hbm.at[pl.ds(align0(s0), l0), pl.ds(align1(s1), l1)],
                    vref.at[slot, pl.ds(d0, l0), pl.ds(d1, l1)],
                    sem), op)()

            if cond is None:
                dma()
            else:
                pl.when(cond)(dma)


def _block_in_2d(op, hbm, vref, sem, ir, ic, slot, bm, hr, nrs, bc, nc_s,
                 hc=_HC):
    """(row, col)-clipped 2D block DMA (8-aligned rows, 128-aligned
    columns)."""
    _block_in(op, hbm, vref, sem, ir, ic, slot, (bm, hr, nrs),
              (bc, hc, nc_s), _mult8, _mult128)


def _axis_cases_body(i, base, halo, n_str):
    """Fresh-ROW cases for the in-place wide kernels: window i loads
    only rows [i*base, (i+1)*base + halo) (clipped) at dst offset halo.
    The top halo rows [i*base - halo, i*base) are NOT read from HBM —
    in-place writeback has already clobbered them there; they come from
    the block-row strip stash in VMEM (see _smooth_fused_wide)."""
    if halo == 0:
        return [(None, i * base, base, 0)]
    if n_str == 1:
        return [(None, 0, base, halo)]
    return [(i == n_str - 1, i * base, base, halo),
            (i < n_str - 1, i * base, base + halo, halo)]


def _axis_cases_fresh(i, base, halo, n_str):
    """Fresh-COLUMN cases (the _stripe_in_fresh scheme on a second
    axis): the head [0, 2*halo) of window i is carried in VMEM from the
    previous window's buffer (consecutive windows overlap exactly
    there), so only [i*base + halo, (i+1)*base + halo) (clipped) is
    read, at dst 2*halo.  Window 0 has no predecessor and loads
    [0, base + halo) whole at dst halo."""
    if halo == 0:
        return [(None, i * base, base, 0)]
    if n_str == 1:
        return [(None, 0, base, halo)]
    cases = [(i == 0, 0, base + halo, halo),
             (i == n_str - 1, i * base + halo, base - halo, 2 * halo)]
    if n_str > 2:
        cases.append(((i > 0) & (i < n_str - 1), i * base + halo, base,
                      2 * halo))
    return cases


def _block_in_fresh2d(op, hbm, vref, sem, ir, ic, slot, bm, hr, nrs,
                      bcw, ncs, hc=_HC):
    """In-place-safe fresh block DMA: rows from _axis_cases_body (top
    halo via strip stash), columns from _axis_cases_fresh (left halo
    via VMEM carry).  Reads never overlap any range an earlier block's
    in-place writeback covers."""
    _block_in_cases(op, hbm, vref, sem, slot,
                    _axis_cases_body(ir, bm, hr, nrs),
                    _axis_cases_fresh(ic, bcw, hc, ncs),
                    _mult8, _mult128)


def _wide_u_assemble(us, strip, loc_sem, slot, other, ir, ic,
                     bm, hr, nrs, bcw, ncs, more_blocks):
    """Buffer assembly for the in-place wide scheme, after the fresh
    DMA wait: (1) top-halo rows [0, hr) from the strip stash — their
    HBM copy was overwritten in place during block-row ir-1; (2) left
    column halo handed to the next block's buffer (VMEM carry, kills
    the re-read); (3) stash this block's bottom boundary rows (the
    ORIGINAL values about to be overwritten) for block-row ir+1.
    Local VMEM->VMEM DMAs are started and waited inline — they move
    <=300 KB against a multi-MB block compute."""
    hc = _HC

    def lcopy(src, dst):
        dma = pltpu.make_async_copy(src, dst, loc_sem)
        dma.start()
        dma.wait()

    @pl.when(ir > 0)
    def _():
        sr = jax.lax.rem(ir + 1, 2)       # strip written during row ir-1
        for cond, s1, l1, d1 in _axis_cases(ic, bcw, hc, ncs):
            def cp(s1=s1, l1=l1, d1=d1):
                lcopy(strip.at[sr, :, pl.ds(_mult128(s1), l1)],
                      us.at[slot, pl.ds(0, hr), pl.ds(d1, l1)])
            if cond is None:
                cp()
            else:
                pl.when(cond)(cp)

    @pl.when(more_blocks & (ic + 1 < ncs))
    def _():
        us[other, :, pl.ds(0, 2 * hc)] = us[slot, :, pl.ds(bcw, 2 * hc)]

    @pl.when(ir + 1 < nrs)
    def _():
        lcopy(us.at[slot, pl.ds(bm, hr), pl.ds(hc, bcw)],
              strip.at[jax.lax.rem(ir, 2), :,
                       pl.ds(_mult128(ic * bcw), bcw)])


@functools.partial(
    jax.jit,
    static_argnames=("h", "nu", "smoother", "bc", "interpret",
                     "hr", "bm", "bcw"))
def _smooth_fused_wide(u, f, *, h: float, nu: int, smoother: str, bc: str,
                       interpret: bool, hr: int, bm: int, bcw: int):
    n = u.shape[0]
    dtype = u.dtype
    hc = _HC
    nrs, ncs = n // bm, n // bcw
    n_blocks = nrs * ncs
    R, C = bm + 2 * hr, bcw + 2 * hc
    hsq = h * h
    assert bm % 8 == 0 and bcw % 128 == 0 and bm >= 2 * hr

    def kernel(u_hbm, f_hbm, out_hbm, us, fs, outs, strip,
               in_sems, out_sems, loc_sem):
        def issue(b, slot):
            ir, ic = b // ncs, jax.lax.rem(b, ncs)
            _block_in_fresh2d("start", u_hbm, us, in_sems.at[slot, 0],
                              ir, ic, slot, bm, hr, nrs, bcw, ncs)
            _block_in_2d("start", f_hbm, fs, in_sems.at[slot, 1], ir, ic,
                         slot, bm, hr, nrs, bcw, ncs)

        issue(0, 0)

        def body(b, _):
            slot = jax.lax.rem(b, 2)
            other = jax.lax.rem(b + 1, 2)
            ir, ic = b // ncs, jax.lax.rem(b, ncs)

            @pl.when(b + 1 < n_blocks)
            def _():
                issue(b + 1, other)

            _block_in_fresh2d("wait", u_hbm, us, in_sems.at[slot, 0],
                              ir, ic, slot, bm, hr, nrs, bcw, ncs)
            _block_in_2d("wait", f_hbm, fs, in_sems.at[slot, 1], ir, ic,
                         slot, bm, hr, nrs, bcw, ncs)

            _wide_u_assemble(us, strip, loc_sem, slot, other, ir, ic,
                             bm, hr, nrs, bcw, ncs, b + 1 < n_blocks)

            uv = _sweeps_wide(us[slot], fs[slot], nu, smoother, bc, hsq,
                              hr, bm, hc, bcw,
                              ir == 0, ir == nrs - 1,
                              ic == 0, ic == ncs - 1)

            @pl.when(b >= 2)
            def _():
                pltpu.make_async_copy(
                    outs.at[slot], out_hbm.at[pl.ds(0, bm), pl.ds(0, bcw)],
                    out_sems.at[slot]).wait()

            outs[slot] = uv[hr:hr + bm, hc:hc + bcw]
            pltpu.make_async_copy(
                outs.at[slot],
                out_hbm.at[pl.ds(pl.multiple_of(ir * bm, 8), bm),
                           pl.ds(pl.multiple_of(ic * bcw, 128), bcw)],
                out_sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, n_blocks, body, 0)

        for k in (n_blocks - 2, n_blocks - 1):
            slot = k % 2
            pltpu.make_async_copy(
                outs.at[slot],
                out_hbm.at[pl.ds((k // ncs) * bm, bm),
                           pl.ds((k % ncs) * bcw, bcw)],
                out_sems.at[slot]).wait()

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, n), dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        input_output_aliases=_alias(u),
        scratch_shapes=[
            pltpu.VMEM((2, R, C), dtype),
            pltpu.VMEM((2, R, C), dtype),
            pltpu.VMEM((2, bm, bcw), dtype),
            pltpu.VMEM((2, hr, n), dtype),    # block-row boundary stash
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(u, f)


@functools.partial(
    jax.jit,
    static_argnames=("h", "nu", "smoother", "bc", "interpret",
                     "hr", "bm", "bcw"))
def _rr_fused_wide(u, f, *, h: float, nu: int, smoother: str, bc: str,
                   interpret: bool, hr: int, bm: int, bcw: int):
    """Two-axis-blocked: nu sweeps, then R = restrict(residual).
    Returns (u_smoothed, R); halo keeps >= 1 extra exact ring for the
    residual's neighbor reads (hr = 8 >= radius*nu + 1)."""
    n = u.shape[0]
    dtype = u.dtype
    hc = _HC
    nrs, ncs = n // bm, n // bcw
    n_blocks = nrs * ncs
    R, C = bm + 2 * hr, bcw + 2 * hc
    hsq = h * h
    inv_hsq = 1.0 / hsq
    pmat = _halve_mat(bcw, dtype)

    def kernel(u_hbm, f_hbm, p_hbm, out_hbm, rout_hbm,
               us, fs, pv, outs, routs, strip, in_sems, out_sems,
               rout_sems, p_sem, loc_sem):
        pdma = pltpu.make_async_copy(p_hbm, pv, p_sem)
        pdma.start()

        def issue(b, slot):
            ir, ic = b // ncs, jax.lax.rem(b, ncs)
            _block_in_fresh2d("start", u_hbm, us, in_sems.at[slot, 0],
                              ir, ic, slot, bm, hr, nrs, bcw, ncs)
            _block_in_2d("start", f_hbm, fs, in_sems.at[slot, 1], ir, ic,
                         slot, bm, hr, nrs, bcw, ncs)

        issue(0, 0)
        pdma.wait()

        def body(b, _):
            slot = jax.lax.rem(b, 2)
            other = jax.lax.rem(b + 1, 2)
            ir, ic = b // ncs, jax.lax.rem(b, ncs)

            @pl.when(b + 1 < n_blocks)
            def _():
                issue(b + 1, other)

            _block_in_fresh2d("wait", u_hbm, us, in_sems.at[slot, 0],
                              ir, ic, slot, bm, hr, nrs, bcw, ncs)
            _block_in_2d("wait", f_hbm, fs, in_sems.at[slot, 1], ir, ic,
                         slot, bm, hr, nrs, bcw, ncs)

            _wide_u_assemble(us, strip, loc_sem, slot, other, ir, ic,
                             bm, hr, nrs, bcw, ncs, b + 1 < n_blocks)

            rf, rl = ir == 0, ir == nrs - 1
            cf, cl = ic == 0, ic == ncs - 1
            uv = _sweeps_wide(us[slot], fs[slot], nu, smoother, bc, hsq,
                              hr, bm, hc, bcw, rf, rl, cf, cl)
            # ghosts must hold boundary data for the residual reads
            uv = _apply_row_bc(uv, bc, rf, rl, hr - 1, hr + bm)
            uv = _apply_col_bc(uv, bc, cf, cl, hc - 1, hc + bcw)

            rv_full = fs[slot] - (_nbr_plain(uv) - 4.0 * uv) \
                * jnp.asarray(inv_hsq, dtype)
            rv = rv_full[hr:hr + bm, hc:hc + bcw]
            s = rv.reshape(bm // 2, 2, bcw).sum(axis=1)
            Rv = _lane_halve(s, pv[:]) * jnp.asarray(0.25, dtype)

            @pl.when(b >= 2)
            def _():
                pltpu.make_async_copy(
                    outs.at[slot], out_hbm.at[pl.ds(0, bm), pl.ds(0, bcw)],
                    out_sems.at[slot]).wait()
                pltpu.make_async_copy(
                    routs.at[slot],
                    rout_hbm.at[pl.ds(0, bm // 2), pl.ds(0, bcw // 2)],
                    rout_sems.at[slot]).wait()

            outs[slot] = uv[hr:hr + bm, hc:hc + bcw]
            pltpu.make_async_copy(
                outs.at[slot],
                out_hbm.at[pl.ds(pl.multiple_of(ir * bm, 8), bm),
                           pl.ds(pl.multiple_of(ic * bcw, 128), bcw)],
                out_sems.at[slot]).start()
            routs[slot] = Rv
            pltpu.make_async_copy(
                routs.at[slot],
                rout_hbm.at[pl.ds(pl.multiple_of(ir * (bm // 2), 8),
                                  bm // 2),
                            pl.ds(pl.multiple_of(ic * (bcw // 2), 128),
                                  bcw // 2)],
                rout_sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, n_blocks, body, 0)

        for k in (n_blocks - 2, n_blocks - 1):
            slot = k % 2
            ir, ic = k // ncs, k % ncs
            pltpu.make_async_copy(
                outs.at[slot],
                out_hbm.at[pl.ds(ir * bm, bm), pl.ds(ic * bcw, bcw)],
                out_sems.at[slot]).wait()
            pltpu.make_async_copy(
                routs.at[slot],
                rout_hbm.at[pl.ds(ir * (bm // 2), bm // 2),
                            pl.ds(ic * (bcw // 2), bcw // 2)],
                rout_sems.at[slot]).wait()

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((n, n), dtype),
                   jax.ShapeDtypeStruct((n // 2, n // 2), dtype)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        input_output_aliases=_alias(u),
        scratch_shapes=[
            pltpu.VMEM((2, R, C), dtype),
            pltpu.VMEM((2, R, C), dtype),
            pltpu.VMEM(pmat.shape, dtype),
            pltpu.VMEM((2, bm, bcw), dtype),
            pltpu.VMEM((2, bm // 2, bcw // 2), dtype),
            pltpu.VMEM((2, hr, n), dtype),    # block-row boundary stash
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(u, f, pmat)


@functools.partial(
    jax.jit,
    static_argnames=("h", "nu", "smoother", "bc", "kind", "interpret",
                     "hr", "bm", "bcw", "rnorm"))
def _pc_fused_wide(u, f, V, *, h: float, nu: int, smoother: str, bc: str,
                   kind: str, interpret: bool, hr: int, bm: int, bcw: int,
                   rnorm: bool = False):
    """Two-axis-blocked: u += P(V), then nu sweeps.  The coarse block
    carries (8, 128) coarse halos = (16, 256) fine, covering the sweep
    radius and the bilinear +-2 shift in both axes.

    rnorm: also return a (1, bcw) f32 partial-sum row of the result's
    squared residual, accumulated over ALL blocks (callers sum it);
    requires hr >= radius*nu + 1 (the composite plan guarantees it)."""
    n = u.shape[0]
    dtype = u.dtype
    hc = _HC
    nrs, ncs = n // bm, n // bcw
    n_blocks = nrs * ncs
    R, C = bm + 2 * hr, bcw + 2 * hc
    chr_, chc = 8, _HC
    Rc, Cc = bm // 2 + 2 * chr_, bcw // 2 + 2 * chc
    hsq = h * h
    inv_hsq = 1.0 / hsq
    emat = _double_mat(bcw, dtype)
    assert hr <= 14

    def kernel(u_hbm, f_hbm, v_hbm, e_hbm, out_hbm, *rest):
        if rnorm:
            (racc_hbm, us, fs, vs, ev, outs, strip, racc,
             in_sems, out_sems, e_sem, r_sem, loc_sem) = rest
            racc[:] = jnp.zeros_like(racc)
        else:
            (us, fs, vs, ev, outs, strip,
             in_sems, out_sems, e_sem, loc_sem) = rest
        edma = pltpu.make_async_copy(e_hbm, ev, e_sem)
        edma.start()

        def issue(b, slot):
            ir, ic = b // ncs, jax.lax.rem(b, ncs)
            _block_in_fresh2d("start", u_hbm, us, in_sems.at[slot, 0],
                              ir, ic, slot, bm, hr, nrs, bcw, ncs)
            _block_in_2d("start", f_hbm, fs, in_sems.at[slot, 1], ir, ic,
                         slot, bm, hr, nrs, bcw, ncs)
            _block_in_2d("start", v_hbm, vs, in_sems.at[slot, 2], ir, ic,
                         slot, bm // 2, chr_, nrs, bcw // 2, ncs, hc=chc)

        issue(0, 0)
        edma.wait()

        def body(b, _):
            slot = jax.lax.rem(b, 2)
            other = jax.lax.rem(b + 1, 2)
            ir, ic = b // ncs, jax.lax.rem(b, ncs)

            @pl.when(b + 1 < n_blocks)
            def _():
                issue(b + 1, other)

            _block_in_fresh2d("wait", u_hbm, us, in_sems.at[slot, 0],
                              ir, ic, slot, bm, hr, nrs, bcw, ncs)
            _block_in_2d("wait", f_hbm, fs, in_sems.at[slot, 1], ir, ic,
                         slot, bm, hr, nrs, bcw, ncs)
            _block_in_2d("wait", v_hbm, vs, in_sems.at[slot, 2], ir, ic,
                         slot, bm // 2, chr_, nrs, bcw // 2, ncs, hc=chc)

            _wide_u_assemble(us, strip, loc_sem, slot, other, ir, ic,
                             bm, hr, nrs, bcw, ncs, b + 1 < n_blocks)

            rf, rl = ir == 0, ir == nrs - 1
            cf, cl = ic == 0, ic == ncs - 1
            # expand the coarse block to fine rows/cols
            v2 = jnp.repeat(vs[slot], 2, axis=0)    # (bm + 4*chr_, Cc)
            vf = _lane_double(v2, ev[:])            # (bm + 4*chr_, bcw + 4*chc)
            if kind == "bilinear":
                # zero the clipped (stale-scratch) ghost regions first —
                # the blend's +-2 shift reads them at the grid edges
                ridx = jax.lax.broadcasted_iota(jnp.int32,
                                                (vf.shape[0], 1), 0)
                cidx = jax.lax.broadcasted_iota(jnp.int32,
                                                (1, vf.shape[1]), 1)
                vf = jnp.where(rf & (ridx < 2 * chr_), 0.0, vf)
                vf = jnp.where(rl & (ridx >= bm + 2 * chr_), 0.0, vf)
                vf = jnp.where(cf & (cidx < 2 * chc), 0.0, vf)
                vf = jnp.where(cl & (cidx >= bcw + 2 * chc), 0.0, vf)
                vf = _bilinear_blend_2d(
                    vf, 2 * chr_, bm + 2 * chr_ - 1, rf, rl, vf.shape[1],
                    left_col=2 * chc, right_col=bcw + 2 * chc - 1,
                    cf=cf, cl=cl)
            # slice to the u block's window
            vf = vf[2 * chr_ - hr:2 * chr_ - hr + R,
                    2 * chc - hc:2 * chc - hc + C]

            uv = us[slot] + vf
            uv = _sweeps_wide(uv, fs[slot], nu, smoother, bc, hsq,
                              hr, bm, hc, bcw, rf, rl, cf, cl)

            if rnorm:
                uv = _apply_row_bc(uv, bc, rf, rl, hr - 1, hr + bm)
                uv = _apply_col_bc(uv, bc, cf, cl, hc - 1, hc + bcw)
                rv = (fs[slot] - (_nbr_plain(uv) - 4.0 * uv)
                      * jnp.asarray(inv_hsq, dtype))[hr:hr + bm,
                                                     hc:hc + bcw]
                rv = rv.astype(jnp.float32)
                racc[:] = racc[:] + jnp.sum(rv * rv, axis=0,
                                            keepdims=True)

            @pl.when(b >= 2)
            def _():
                pltpu.make_async_copy(
                    outs.at[slot], out_hbm.at[pl.ds(0, bm), pl.ds(0, bcw)],
                    out_sems.at[slot]).wait()

            outs[slot] = uv[hr:hr + bm, hc:hc + bcw]
            pltpu.make_async_copy(
                outs.at[slot],
                out_hbm.at[pl.ds(pl.multiple_of(ir * bm, 8), bm),
                           pl.ds(pl.multiple_of(ic * bcw, 128), bcw)],
                out_sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, n_blocks, body, 0)

        for k in (n_blocks - 2, n_blocks - 1):
            slot = k % 2
            pltpu.make_async_copy(
                outs.at[slot],
                out_hbm.at[pl.ds((k // ncs) * bm, bm),
                           pl.ds((k % ncs) * bcw, bcw)],
                out_sems.at[slot]).wait()

        if rnorm:
            rdma = pltpu.make_async_copy(racc, racc_hbm, r_sem)
            rdma.start()
            rdma.wait()

    out_shape = jax.ShapeDtypeStruct((n, n), dtype)
    scratch = [
        pltpu.VMEM((2, R, C), dtype),
        pltpu.VMEM((2, R, C), dtype),
        pltpu.VMEM((2, Rc, Cc), dtype),
        pltpu.VMEM(emat.shape, dtype),
        pltpu.VMEM((2, bm, bcw), dtype),
        pltpu.VMEM((2, hr, n), dtype),    # block-row boundary stash
    ]
    sems = [
        pltpu.SemaphoreType.DMA((2, 3)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA(()),
    ]
    if rnorm:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((1, bcw), jnp.float32))
        scratch = scratch + [pltpu.VMEM((1, bcw), jnp.float32)]
        sems = sems + [pltpu.SemaphoreType.DMA(()),
                       pltpu.SemaphoreType.DMA(())]
        out_specs = (pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pl.ANY))
    else:
        sems = sems + [pltpu.SemaphoreType.DMA(())]
        out_specs = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=out_specs,
        input_output_aliases=_alias(u),
        scratch_shapes=scratch + sems,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(u, f, V, emat)


# =====================================================================
# 3D fused multi-sweep smoother (7-point Laplacian, BASELINE config 4)
# =====================================================================
# Same deep-halo trapezoid scheme as the 2D kernel, blocked over the
# two leading axes: (z, y) blocks with the full x row in lanes.  The z
# axis is untiled on TPU (the (8,128) tile covers (y, x)), so its DMA
# offsets need no alignment and the z halo is exactly the dependency
# radius; the y halo rounds up to the 8-row sublane tile.

MIN_BYTES_3D = 32 * 1024 * 1024   # below this, XLA sweeps win


def _plan3d(shape, nu, smoother, itemsize, composite=False):
    """Pick (hz, bz, by) block geometry for a 3D fused kernel, or None.
    Working set: u,f double-buffered (Rz,Ry,nx) + out double (bz,by,nx);
    composite kernels carry one extra exact z-ring (the residual tail)
    and extra V/R block buffers."""
    nz, ny, nx = shape
    if smoother not in ("jacobi", "wjacobi", "rbgs"):
        return None
    radius = 2 if smoother == "rbgs" else 1
    hz = radius * nu + (1 if composite else 0)
    hy = 8
    if hz > hy:
        return None
    if composite and nx % min(_LANE_CHUNK, nx) != 0:
        # the composites' MXU lane halve/double walk nx in _LANE_CHUNK
        # chunks; a non-divisible nx (reachable via the public API with
        # non-power-of-two shapes) must fall back to XLA rather than hit
        # a trace-time shape error in _rr_fused_3d
        return None
    chz = (hz + 3) // 2          # coarse z halo of the pc kernel
    best = None
    for bz in (32, 16, 8, 4):
        # hz <= bz: interior clipped windows must fit the array; the
        # composite pc kernel also loads coarse blocks with chz <= bz/2
        if nz % bz or nz // bz < 2 or hz > bz:
            continue
        if composite and bz // 2 < chz:
            continue
        for by in (256, 128, 64, 32):
            if ny % by or ny // by < 1 or hy > by:
                continue
            if composite and by // 2 < 8:
                continue
            Rz, Ry = bz + 2 * hz, by + 2 * hy
            vmem = itemsize * nx * (4 * Rz * Ry + 2 * bz * by)
            if composite:
                # R-out blocks + coarse V blocks (conservative: both)
                vmem += itemsize * (bz * by * nx // 4
                                    + (bz // 2 + 16) * (by // 2 + 16)
                                    * nx)
            if vmem > _VMEM_BUDGET:
                continue
            util = (bz * by) / (Rz * Ry)
            if best is None or util > best[0]:
                best = (util, hz, bz, by)
    if best is None:
        return None
    return best[1:]


def _axis_cases(i, base, halo, n_str):
    """Clipped-window DMA cases for one blocked axis: list of
    (cond_or_None, src_start, size, dst_start).  Window i covers
    [i*base - halo, i*base + base + halo) clipped to [0, n)."""
    R = base + 2 * halo
    if halo == 0:
        return [(None, i * base, base, 0)]
    if n_str == 1:
        return [(None, 0, base, halo)]
    # jnp.maximum keeps untaken-branch starts nonnegative when i is a
    # concrete 0 (the pipeline's initial issue); taken branches always
    # have i*base - halo >= 0
    start = jnp.maximum(i * base - halo, 0)
    cases = [(i == 0, 0, R - halo, halo),
             (i == n_str - 1, start, R - halo, 0)]
    if n_str > 2:
        cases.append(((i > 0) & (i < n_str - 1), start, R, 0))
    return cases


def _block_in_3d(op, hbm, vref, sem, iz, iy, slot,
                 bz, hz, nzs, by, hy, nys):
    """(z, y)-clipped 3D block DMA; x stays whole.  z is untiled (free
    offsets), y is the sublane axis (8-aligned)."""
    _block_in(op, hbm, vref, sem, iz, iy, slot, (bz, hz, nzs),
              (by, hy, nys), _ident, _mult8)


def _apply_bc_3d(u, bc, zf, zl, yf, yl, hz, bz, hy, by):
    """Global boundary fixups on the z and y axes of a (Rz, Ry, nx)
    block value (x is handled inline by _nbr3).  zf/zl/yf/yl: traced
    booleans — does this block touch the global first/last z/y edge."""
    Rz, Ry, _ = u.shape
    ziota = jax.lax.broadcasted_iota(jnp.int32, (Rz, 1, 1), 0)
    yiota = jax.lax.broadcasted_iota(jnp.int32, (1, Ry, 1), 1)
    zg0, zg1 = hz - 1, hz + bz       # ghost plane just outside the grid
    yg0, yg1 = hy - 1, hy + by
    if bc == "ghost0":
        u = jnp.where(zf & (ziota <= zg0), 0.0, u)
        u = jnp.where(zl & (ziota >= zg1), 0.0, u)
        u = jnp.where(yf & (yiota <= yg0), 0.0, u)
        u = jnp.where(yl & (yiota >= yg1), 0.0, u)
    else:  # face: ghost = -edge (static slices)
        u = jnp.where(zf & (ziota == zg0), -u[zg0 + 1:zg0 + 2], u)
        u = jnp.where(zf & (ziota < zg0), 0.0, u)
        u = jnp.where(zl & (ziota == zg1), -u[zg1 - 1:zg1], u)
        u = jnp.where(zl & (ziota > zg1), 0.0, u)
        u = jnp.where(yf & (yiota == yg0), -u[:, yg0 + 1:yg0 + 2], u)
        u = jnp.where(yf & (yiota < yg0), 0.0, u)
        u = jnp.where(yl & (yiota == yg1), -u[:, yg1 - 1:yg1], u)
        u = jnp.where(yl & (yiota > yg1), 0.0, u)
    return u


def _nbr3(u, bc):
    """7-point neighbor sum on a (Rz, Ry, nx) value; x BC inline, z/y
    are the caller's job (halo recompute + _apply_bc_3d)."""
    zp = jnp.zeros_like(u[:1])
    up = jnp.concatenate([zp, u[:-1]], axis=0)
    dn = jnp.concatenate([u[1:], zp], axis=0)
    yp = jnp.zeros_like(u[:, :1])
    no = jnp.concatenate([yp, u[:, :-1]], axis=1)
    so = jnp.concatenate([u[:, 1:], yp], axis=1)
    if bc == "face":
        lf = jnp.concatenate([-u[:, :, :1], u[:, :, :-1]], axis=2)
        rt = jnp.concatenate([u[:, :, 1:], -u[:, :, -1:]], axis=2)
    else:
        xp = jnp.zeros_like(u[:, :, :1])
        lf = jnp.concatenate([xp, u[:, :, :-1]], axis=2)
        rt = jnp.concatenate([u[:, :, 1:], xp], axis=2)
    return (up + dn) + (no + so) + (lf + rt)


def _sweeps3(uv, fv, nu, smoother, bc, hsq, hz, bz, hy, by,
             zf, zl, yf, yl):
    """nu in-VMEM 7-point sweeps on a block value with per-sweep
    z/y boundary fixups."""
    dtype = uv.dtype
    sixth = jnp.asarray(1.0 / 6.0, dtype)
    c1 = fv * jnp.asarray(-hsq / 6.0, dtype)
    omega = 6.0 / 7.0  # 2d/(2d+1), d=3
    one_m_om = jnp.asarray(1.0 - omega, dtype)
    om_sixth = jnp.asarray(omega / 6.0, dtype)
    c1w = fv * jnp.asarray(-hsq / 6.0 * omega, dtype)
    if smoother == "rbgs":
        Rz, Ry, nx = uv.shape
        par = (jax.lax.broadcasted_iota(jnp.int32, (Rz, 1, 1), 0) + hz
               + jax.lax.broadcasted_iota(jnp.int32, (1, Ry, 1), 1) + hy
               + jax.lax.broadcasted_iota(jnp.int32, (1, 1, nx), 2)) % 2

    def bcfix(x):
        return _apply_bc_3d(x, bc, zf, zl, yf, yl, hz, bz, hy, by)

    for _sweep in range(nu):
        uv = bcfix(uv)
        if smoother == "jacobi":
            uv = _nbr3(uv, bc) * sixth + c1
        elif smoother == "wjacobi":
            uv = one_m_om * uv + _nbr3(uv, bc) * om_sixth + c1w
        else:
            for p in (0, 1):
                upd = _nbr3(uv, bc) * sixth + c1
                uv = jnp.where(par == p, upd, uv)
                uv = bcfix(uv)
    return uv


@functools.partial(
    jax.jit,
    static_argnames=("h", "nu", "smoother", "bc", "interpret",
                     "hz", "bz", "by"))
def _smooth_fused_3d(u, f, *, h: float, nu: int, smoother: str, bc: str,
                     interpret: bool, hz: int, bz: int, by: int):
    nz, ny, nx = u.shape
    dtype = u.dtype
    hy = 8
    nzs, nys = nz // bz, ny // by
    n_blocks = nzs * nys
    Rz, Ry = bz + 2 * hz, by + 2 * hy
    hsq = h * h
    # rbgs parity: global (z+y+x) of local (0,0,0) is even for every
    # block because bz and by are even, so local parity = (r+c+x+hz+hy)%2
    assert bz % 2 == 0 and by % 2 == 0

    def kernel(u_hbm, f_hbm, out_hbm, us, fs, outs, in_sems, out_sems):
        def issue(b, slot):
            iz, iy = b // nys, jax.lax.rem(b, nys)
            _block_in_3d("start", u_hbm, us, in_sems.at[slot, 0], iz, iy,
                         slot, bz, hz, nzs, by, hy, nys)
            _block_in_3d("start", f_hbm, fs, in_sems.at[slot, 1], iz, iy,
                         slot, bz, hz, nzs, by, hy, nys)

        issue(0, 0)

        def body(b, _):
            slot = jax.lax.rem(b, 2)
            iz, iy = b // nys, jax.lax.rem(b, nys)

            @pl.when(b + 1 < n_blocks)
            def _():
                issue(b + 1, jax.lax.rem(b + 1, 2))

            _block_in_3d("wait", u_hbm, us, in_sems.at[slot, 0], iz, iy,
                         slot, bz, hz, nzs, by, hy, nys)
            _block_in_3d("wait", f_hbm, fs, in_sems.at[slot, 1], iz, iy,
                         slot, bz, hz, nzs, by, hy, nys)

            uv = _sweeps3(us[slot], fs[slot], nu, smoother, bc, hsq,
                          hz, bz, hy, by,
                          iz == 0, iz == nzs - 1, iy == 0, iy == nys - 1)

            @pl.when(b >= 2)
            def _():
                pltpu.make_async_copy(
                    outs.at[slot], out_hbm.at[pl.ds(0, bz), pl.ds(0, by)],
                    out_sems.at[slot]).wait()

            outs[slot] = uv[hz:hz + bz, hy:hy + by, :]
            pltpu.make_async_copy(
                outs.at[slot],
                out_hbm.at[pl.ds(iz * bz, bz),
                           pl.ds(pl.multiple_of(iy * by, 8), by)],
                out_sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, n_blocks, body, 0)

        for k in (n_blocks - 2, n_blocks - 1):
            if k < 0:
                continue
            slot = k % 2
            pltpu.make_async_copy(
                outs.at[slot],
                out_hbm.at[pl.ds((k // nys) * bz, bz),
                           pl.ds((k % nys) * by, by)],
                out_sems.at[slot]).wait()

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, Rz, Ry, nx), dtype),
            pltpu.VMEM((2, Rz, Ry, nx), dtype),
            pltpu.VMEM((2, bz, by, nx), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(u, f)


def _lane_halve3(x, pmat):
    """Lane pair-sum on a 3D value via the 2D MXU form (leading axes
    merged — a non-lane reshape Mosaic lowers)."""
    a, b, nx_ = x.shape
    return _lane_halve(x.reshape(a * b, nx_), pmat).reshape(a, b,
                                                            nx_ // 2)


def _lane_double3(x, emat):
    a, b, nh = x.shape
    return _lane_double(x.reshape(a * b, nh), emat).reshape(a, b, 2 * nh)


def _trilinear_blend_3d(R, pos, flags):
    """Per-axis bilinear blend in fine space on an expanded 3D block
    (the 3D 'bilinear' = trilinear prolongation of kernels/xla.py).

    pos[ax] = (first_idx, last_idx): static local indices of global
    cells 0 and n-1 along ax; flags[ax] = (is_first, is_last): traced
    does-this-block-touch-the-edge booleans (True for unblocked axes).
    Local origin parity is even on every axis (blocks are even-sized
    and halos even), so local parity == global parity.
    """
    dtype = R.dtype
    if dtype.itemsize < 4:
        # same Mosaic sub-f32 crash as _bilinear_blend_2d: blend in f32
        return _trilinear_blend_3d(
            R.astype(jnp.float32), pos, flags).astype(dtype)
    for ax in range(3):
        sl = lambda a, b: tuple(
            slice(None) if i != ax else slice(a, b) for i in range(3))
        zshape = list(R.shape)
        zshape[ax] = 2
        z2 = jnp.zeros(tuple(zshape), dtype)
        Rm = jnp.concatenate([z2, R[sl(None, -2)]], axis=ax)
        Rp = jnp.concatenate([R[sl(2, None)], z2], axis=ax)
        idx = jax.lax.broadcasted_iota(jnp.int32, R.shape, ax)
        S = jnp.where(idx % 2 == 0, Rm, Rp)
        (first, last), (f_flag, l_flag) = pos[ax], flags[ax]
        edge = (f_flag & (idx == first)) | (l_flag & (idx == last))
        a_w = jnp.where(edge, jnp.asarray(0.5, dtype),
                        jnp.asarray(0.75, dtype))
        b_w = jnp.where(edge, jnp.asarray(0.0, dtype),
                        jnp.asarray(0.25, dtype))
        R = a_w * R + b_w * S
    return R


@functools.partial(
    jax.jit,
    static_argnames=("h", "nu", "smoother", "bc", "interpret",
                     "hz", "bz", "by"))
def _rr_fused_3d(u, f, *, h: float, nu: int, smoother: str, bc: str,
                 interpret: bool, hz: int, bz: int, by: int):
    """3D blocked: nu sweeps, then R = restrict(residual) (2x2x2).
    Returns (u_smoothed, R); hz carries one extra exact ring for the
    residual's neighbor reads (hz = radius*nu + 1, hy = 8 >= same)."""
    nz, ny, nx = u.shape
    dtype = u.dtype
    hy = 8
    nzs, nys = nz // bz, ny // by
    n_blocks = nzs * nys
    Rz, Ry = bz + 2 * hz, by + 2 * hy
    hsq = h * h
    inv_hsq = 1.0 / hsq
    pmat = _halve_mat(nx, dtype)

    def kernel(u_hbm, f_hbm, p_hbm, out_hbm, rout_hbm,
               us, fs, pv, outs, routs, in_sems, out_sems, rout_sems,
               p_sem):
        pdma = pltpu.make_async_copy(p_hbm, pv, p_sem)
        pdma.start()

        def issue(b, slot):
            iz, iy = b // nys, jax.lax.rem(b, nys)
            _block_in_3d("start", u_hbm, us, in_sems.at[slot, 0], iz, iy,
                         slot, bz, hz, nzs, by, hy, nys)
            _block_in_3d("start", f_hbm, fs, in_sems.at[slot, 1], iz, iy,
                         slot, bz, hz, nzs, by, hy, nys)

        issue(0, 0)
        pdma.wait()

        def body(b, _):
            slot = jax.lax.rem(b, 2)
            iz, iy = b // nys, jax.lax.rem(b, nys)

            @pl.when(b + 1 < n_blocks)
            def _():
                issue(b + 1, jax.lax.rem(b + 1, 2))

            _block_in_3d("wait", u_hbm, us, in_sems.at[slot, 0], iz, iy,
                         slot, bz, hz, nzs, by, hy, nys)
            _block_in_3d("wait", f_hbm, fs, in_sems.at[slot, 1], iz, iy,
                         slot, bz, hz, nzs, by, hy, nys)

            zf, zl = iz == 0, iz == nzs - 1
            yf, yl = iy == 0, iy == nys - 1
            uv = _sweeps3(us[slot], fs[slot], nu, smoother, bc, hsq,
                          hz, bz, hy, by, zf, zl, yf, yl)
            # ghosts must hold boundary data for the residual reads
            uv = _apply_bc_3d(uv, bc, zf, zl, yf, yl, hz, bz, hy, by)

            rv_full = fs[slot] - (_nbr3(uv, bc) - 6.0 * uv) \
                * jnp.asarray(inv_hsq, dtype)
            rv = rv_full[hz:hz + bz, hy:hy + by, :]
            s = rv.reshape(bz // 2, 2, by, nx).sum(axis=1)
            s = s.reshape(bz // 2, by // 2, 2, nx).sum(axis=2)
            Rv = _lane_halve3(s, pv[:]) * jnp.asarray(0.125, dtype)

            @pl.when(b >= 2)
            def _():
                pltpu.make_async_copy(
                    outs.at[slot], out_hbm.at[pl.ds(0, bz), pl.ds(0, by)],
                    out_sems.at[slot]).wait()
                pltpu.make_async_copy(
                    routs.at[slot],
                    rout_hbm.at[pl.ds(0, bz // 2), pl.ds(0, by // 2)],
                    rout_sems.at[slot]).wait()

            outs[slot] = uv[hz:hz + bz, hy:hy + by, :]
            pltpu.make_async_copy(
                outs.at[slot],
                out_hbm.at[pl.ds(iz * bz, bz),
                           pl.ds(pl.multiple_of(iy * by, 8), by)],
                out_sems.at[slot]).start()
            routs[slot] = Rv
            pltpu.make_async_copy(
                routs.at[slot],
                rout_hbm.at[pl.ds(iz * (bz // 2), bz // 2),
                            pl.ds(pl.multiple_of(iy * (by // 2), 8),
                                  by // 2)],
                rout_sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, n_blocks, body, 0)

        for k in (n_blocks - 2, n_blocks - 1):
            if k < 0:
                continue
            slot = k % 2
            iz, iy = k // nys, k % nys
            pltpu.make_async_copy(
                outs.at[slot],
                out_hbm.at[pl.ds(iz * bz, bz), pl.ds(iy * by, by)],
                out_sems.at[slot]).wait()
            pltpu.make_async_copy(
                routs.at[slot],
                rout_hbm.at[pl.ds(iz * (bz // 2), bz // 2),
                            pl.ds(iy * (by // 2), by // 2)],
                rout_sems.at[slot]).wait()

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((nz, ny, nx), dtype),
                   jax.ShapeDtypeStruct((nz // 2, ny // 2, nx // 2),
                                        dtype)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, Rz, Ry, nx), dtype),
            pltpu.VMEM((2, Rz, Ry, nx), dtype),
            pltpu.VMEM(pmat.shape, dtype),
            pltpu.VMEM((2, bz, by, nx), dtype),
            pltpu.VMEM((2, bz // 2, by // 2, nx // 2), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(u, f, pmat)


@functools.partial(
    jax.jit,
    static_argnames=("h", "nu", "smoother", "bc", "kind", "interpret",
                     "hz", "bz", "by", "rnorm"))
def _pc_fused_3d(u, f, V, *, h: float, nu: int, smoother: str, bc: str,
                 kind: str, interpret: bool, hz: int, bz: int, by: int,
                 rnorm: bool = False):
    """3D blocked: u += P(V) (2x upsample, optionally trilinear), then
    nu sweeps.  Coarse halos (8, 8) = (16, 16) fine cover the sweep
    radius and the trilinear +-2 shift on both blocked axes.

    rnorm: also return a (1, by, nx) f32 partial-sum slab of the
    result's squared residual accumulated over all blocks (the
    composite plan's hz = radius*nu + 1 keeps the needed exact ring)."""
    nz, ny, nx = u.shape
    dtype = u.dtype
    hy = 8
    nzs, nys = nz // bz, ny // by
    n_blocks = nzs * nys
    Rz, Ry = bz + 2 * hz, by + 2 * hy
    # coarse halos: fine coverage 2*ch >= h + 2 (sweep radius + the
    # trilinear +-2 shift); z is untiled so chz is exactly the need,
    # y keeps the 8-row sublane alignment
    chz, chy = (hz + 3) // 2, 8
    Rcz, Rcy = bz // 2 + 2 * chz, by // 2 + 2 * chy
    hsq = h * h
    inv_hsq = 1.0 / hsq
    emat = _double_mat(nx, dtype)
    assert hz <= 14 and hy <= 14 and chz <= bz // 2 and chy <= by // 2

    def kernel(u_hbm, f_hbm, v_hbm, e_hbm, out_hbm, *rest):
        if rnorm:
            (racc_hbm, us, fs, vs, ev, outs, racc,
             in_sems, out_sems, e_sem, r_sem) = rest
            racc[:] = jnp.zeros_like(racc)
        else:
            us, fs, vs, ev, outs, in_sems, out_sems, e_sem = rest
        edma = pltpu.make_async_copy(e_hbm, ev, e_sem)
        edma.start()

        def issue(b, slot):
            iz, iy = b // nys, jax.lax.rem(b, nys)
            _block_in_3d("start", u_hbm, us, in_sems.at[slot, 0], iz, iy,
                         slot, bz, hz, nzs, by, hy, nys)
            _block_in_3d("start", f_hbm, fs, in_sems.at[slot, 1], iz, iy,
                         slot, bz, hz, nzs, by, hy, nys)
            _block_in_3d("start", v_hbm, vs, in_sems.at[slot, 2], iz, iy,
                         slot, bz // 2, chz, nzs, by // 2, chy, nys)

        issue(0, 0)
        edma.wait()

        def body(b, _):
            slot = jax.lax.rem(b, 2)
            iz, iy = b // nys, jax.lax.rem(b, nys)

            @pl.when(b + 1 < n_blocks)
            def _():
                issue(b + 1, jax.lax.rem(b + 1, 2))

            _block_in_3d("wait", u_hbm, us, in_sems.at[slot, 0], iz, iy,
                         slot, bz, hz, nzs, by, hy, nys)
            _block_in_3d("wait", f_hbm, fs, in_sems.at[slot, 1], iz, iy,
                         slot, bz, hz, nzs, by, hy, nys)
            _block_in_3d("wait", v_hbm, vs, in_sems.at[slot, 2], iz, iy,
                         slot, bz // 2, chz, nzs, by // 2, chy, nys)

            zf, zl = iz == 0, iz == nzs - 1
            yf, yl = iy == 0, iy == nys - 1
            v2 = jnp.repeat(vs[slot], 2, axis=0)
            v2 = jnp.repeat(v2, 2, axis=1)
            vf = _lane_double3(v2, ev[:])
            if kind == "bilinear":
                # zero stale-scratch ghost regions before the blend
                zi = jax.lax.broadcasted_iota(jnp.int32,
                                              (vf.shape[0], 1, 1), 0)
                yi = jax.lax.broadcasted_iota(jnp.int32,
                                              (1, vf.shape[1], 1), 1)
                vf = jnp.where(zf & (zi < 2 * chz), 0.0, vf)
                vf = jnp.where(zl & (zi >= bz + 2 * chz), 0.0, vf)
                vf = jnp.where(yf & (yi < 2 * chy), 0.0, vf)
                vf = jnp.where(yl & (yi >= by + 2 * chy), 0.0, vf)
                vf = _trilinear_blend_3d(
                    vf,
                    pos=((2 * chz, bz + 2 * chz - 1),
                         (2 * chy, by + 2 * chy - 1),
                         (0, nx - 1)),
                    flags=((zf, zl), (yf, yl), (True, True)))
            vf = vf[2 * chz - hz:2 * chz - hz + Rz,
                    2 * chy - hy:2 * chy - hy + Ry, :]

            uv = us[slot] + vf
            uv = _sweeps3(uv, fs[slot], nu, smoother, bc, hsq,
                          hz, bz, hy, by, zf, zl, yf, yl)

            if rnorm:
                uv = _apply_bc_3d(uv, bc, zf, zl, yf, yl, hz, bz, hy, by)
                rv = (fs[slot] - (_nbr3(uv, bc) - 6.0 * uv)
                      * jnp.asarray(inv_hsq, dtype))[hz:hz + bz,
                                                     hy:hy + by, :]
                rv = rv.astype(jnp.float32)
                racc[:] = racc[:] + jnp.sum(rv * rv, axis=0,
                                            keepdims=True)

            @pl.when(b >= 2)
            def _():
                pltpu.make_async_copy(
                    outs.at[slot], out_hbm.at[pl.ds(0, bz), pl.ds(0, by)],
                    out_sems.at[slot]).wait()

            outs[slot] = uv[hz:hz + bz, hy:hy + by, :]
            pltpu.make_async_copy(
                outs.at[slot],
                out_hbm.at[pl.ds(iz * bz, bz),
                           pl.ds(pl.multiple_of(iy * by, 8), by)],
                out_sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, n_blocks, body, 0)

        for k in (n_blocks - 2, n_blocks - 1):
            if k < 0:
                continue
            slot = k % 2
            pltpu.make_async_copy(
                outs.at[slot],
                out_hbm.at[pl.ds((k // nys) * bz, bz),
                           pl.ds((k % nys) * by, by)],
                out_sems.at[slot]).wait()

        if rnorm:
            rdma = pltpu.make_async_copy(racc, racc_hbm, r_sem)
            rdma.start()
            rdma.wait()

    out_shape = jax.ShapeDtypeStruct((nz, ny, nx), dtype)
    scratch = [
        pltpu.VMEM((2, Rz, Ry, nx), dtype),
        pltpu.VMEM((2, Rz, Ry, nx), dtype),
        pltpu.VMEM((2, Rcz, Rcy, nx // 2), dtype),
        pltpu.VMEM(emat.shape, dtype),
        pltpu.VMEM((2, bz, by, nx), dtype),
    ]
    sems = [
        pltpu.SemaphoreType.DMA((2, 3)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA(()),
    ]
    if rnorm:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((1, by, nx), jnp.float32))
        scratch = scratch + [pltpu.VMEM((1, by, nx), jnp.float32)]
        sems = sems + [pltpu.SemaphoreType.DMA(())]
        out_specs = (pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pl.ANY))
    else:
        out_specs = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=out_specs,
        scratch_shapes=scratch + sems,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(u, f, V, emat)


def _supported3(u) -> bool:
    if u.ndim != 3 or u.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    nz, ny, nx = u.shape
    if nx % 128 or ny % 8:
        return False
    return u.size * jnp.dtype(u.dtype).itemsize >= MIN_BYTES_3D


def _smooth3(u, f, h, nu, smoother, bc):
    """3D dispatch: fused blocked kernel where a plan exists."""
    max_nu = 4 if smoother == "rbgs" else 8
    out = u
    left = nu
    itemsize = jnp.dtype(u.dtype).itemsize
    while left > 0:
        k = min(left, max_nu)
        plan = _plan3d(u.shape, k, smoother, itemsize)
        if plan is None:
            return xla.smooth(out, f, h, left, smoother, bc)
        hz, bz, by = plan
        out = _smooth_fused_3d(out, f, h=float(h), nu=k, smoother=smoother,
                               bc=bc, interpret=_interpret(), hz=hz, bz=bz,
                               by=by)
        left -= k
    return out


# =====================================================================
# public op interface (same signature as mgpoisson.kernels.xla)
# =====================================================================

def smooth(u, f, h, nu, smoother="jacobi", bc="ghost0"):
    if nu == 0:
        return u
    if smoother not in ("jacobi", "wjacobi", "rbgs"):
        return xla.smooth(u, f, h, nu, smoother, bc)
    if u.ndim == 3 and _supported3(u):
        return _smooth3(u, f, h, nu, smoother, bc)
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
        if (n // bm < 2 and itemsize < 4
                and not _bf16_whole_ok(n, itemsize)):
            # bf16 whole-VMEM is clamped (Mosaic crash at 1024^2):
            # force a sub-whole stripe instead
            halo, bm = _smooth_plan(n, k, smoother, itemsize, max_bm=n // 2)
        if n // bm < 2 or bm <= 2 * halo:
            # striping degenerates: either the whole array fits VMEM
            # (small levels) or the rows are too wide for any single-
            # axis stripe budget (n >= 8192) — then the two-axis
            # blocked kernel takes over, and XLA only as last resort
            if 4 * n * n * itemsize <= _VMEM_BUDGET \
                    and _bf16_whole_ok(n, itemsize):
                out = _smooth_whole(out, f, h=float(h), nu=k,
                                    smoother=smoother, bc=bc,
                                    interpret=_interpret())
            else:
                wide = _plan_wide(n, k, smoother, itemsize)
                if wide is None:
                    return xla.smooth(out, f, h, left, smoother, bc)
                hr, bm_w, bc_w = wide
                out = _smooth_fused_wide(out, f, h=float(h), nu=k,
                                         smoother=smoother, bc=bc,
                                         interpret=_interpret(), hr=hr,
                                         bm=bm_w, bcw=bc_w)
        else:
            out = _smooth_fused(out, f, h=float(h), nu=k,
                                smoother=smoother, bc=bc,
                                interpret=_interpret(), halo=halo, bm=bm)
        left -= k
    return out


# ----------------------------------------- lane halving / doubling
# Mosaic cannot lower strided LANE slices, lane-splitting reshapes, or
# lane-interleaving jnp.repeat (all fail to compile; sublane forms are
# fine).  The forms that DO lower: small MXU matmuls against constant
# 0/1 selection matrices over static 512-lane chunks.  precision=
# HIGHEST keeps the result f32-accurate (DEFAULT rounds through bf16).

_LANE_CHUNK = 256   # minimum K per output tile: halve (256->128) needs
                    # K=256; double (128->256) needs K=128 — smaller
                    # chunks halve the MXU flops vs 512-wide ones
_HI = jax.lax.Precision.HIGHEST


def _halve_mat(n, dtype):
    """(C, C/2) pair-sum selection: out[j] = in[2j] + in[2j+1]."""
    import numpy as np
    c = min(_LANE_CHUNK, n)
    m = np.zeros((c, c // 2), np.float32)
    m[2 * np.arange(c // 2), np.arange(c // 2)] = 1.0
    m[2 * np.arange(c // 2) + 1, np.arange(c // 2)] = 1.0
    return jnp.asarray(m, dtype)


def _double_mat(n, dtype):
    """(C/2, C) duplication: out[2j] = out[2j+1] = in[j]."""
    import numpy as np
    c = min(_LANE_CHUNK, n)
    m = np.zeros((c // 2, c), np.float32)
    m[np.arange(c // 2), 2 * np.arange(c // 2)] = 1.0
    m[np.arange(c // 2), 2 * np.arange(c // 2) + 1] = 1.0
    return jnp.asarray(m, dtype)


def _sel_dot(x, m):
    """Selection matmul x @ m for the lane halve/double tricks.  Mosaic
    compiled-mode constraints (caught by the on-TPU parity sweep,
    bench/parity.py — interpret mode accepts anything): the accumulator
    must be 32-bit, and an fp32-precision contract rejects bf16
    operands ('Bad lhs type'), so bf16 runs the whole dot in f32 (the
    MXU takes f32 via multiple passes; these matmuls are a small slice
    of kernel time) and casts back.

    Cheaper contracts were measured and rejected (v5e, 2026-08-19):
    Precision.HIGH is ~6e-5 relative on this hardware (not the exact
    3-term split) and Mosaic refuses to lower it in-kernel anyway;
    a manual 3-term bf16 Dekker split with DEFAULT-precision passes is
    f32-exact but SLOWER end-to-end (rr_fused 16384^2: 11.98 ms vs
    9.43) — the composites are VPU-bound, so the split's extra
    element-wise converts/subtracts cost more than the saved MXU
    passes."""
    dtype = x.dtype
    if jnp.dtype(dtype) == jnp.bfloat16:
        x, m = x.astype(jnp.float32), m.astype(jnp.float32)
    out = jax.lax.dot_general(x, m, (((1,), (0,)), ((), ())),
                              precision=_HI,
                              preferred_element_type=x.dtype)
    return out.astype(dtype)


def _lane_halve(x, pmat):
    """(r, n) -> (r, n/2), out[:, j] = x[:, 2j] + x[:, 2j+1]."""
    c = pmat.shape[0]
    n_ = x.shape[1]
    parts = [_sel_dot(x[:, k * c:(k + 1) * c], pmat)
             for k in range(n_ // c)]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def _lane_double(x, emat):
    """(r, n/2) -> (r, n), out[:, 2j] = out[:, 2j+1] = x[:, j]."""
    ch = emat.shape[0]                      # C/2 input lanes per chunk
    n_ = x.shape[1]
    parts = [_sel_dot(x[:, k * ch:(k + 1) * ch], emat)
             for k in range(n_ // ch)]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def _bilinear_blend_2d(R, top_row, bot_row, is_first, is_last, n_lanes,
                       left_col=0, right_col=None, cf=True, cl=True):
    """Face-adapted bilinear blend in fine space on an expanded stripe.

    R: injected (piecewise-constant) fine stripe value (r, n_lanes),
    whose local row 0 sits at an EVEN global fine row (so global row
    parity == local row parity; likewise for the local column origin).
    top_row/bot_row: static local row indices of global rows 0 and
    n-1 (meaningful only when the traced is_first/is_last booleans
    select them); left_col/right_col play the same role for the
    columns of lane-blocked values, gated by the traced cf/cl flags
    (full-row callers keep the defaults: global edges at lanes 0 and
    n_lanes-1, always present).  Matches
    mgpoisson.kernels.xla.prolong(kind='bilinear'): per axis
    out = a*R + b*S(R), S the parity +-2 shift, (a, b) = (0.75, 0.25)
    interior / (0.5, 0) at the global edges.
    """
    dtype = R.dtype
    if dtype.itemsize < 4:
        # Mosaic's compiler helper crashes (subprocess exit 1) on this
        # blend in sub-f32 packed layouts (the +-2 sublane parity
        # shifts; observed on v5e libtpu 2026-08-18, bf16).  Blend in
        # f32 in VMEM and round once on the way out — no extra HBM
        # traffic, and one rounding is numerically better anyway.
        return _bilinear_blend_2d(
            R.astype(jnp.float32), top_row, bot_row, is_first, is_last,
            n_lanes, left_col, right_col, cf, cl).astype(dtype)
    if right_col is None:
        right_col = n_lanes - 1
    zr2 = jnp.zeros_like(R[:2, :])
    Rm = jnp.concatenate([zr2, R[:-2, :]], axis=0)
    Rp = jnp.concatenate([R[2:, :], zr2], axis=0)
    ridx = jax.lax.broadcasted_iota(jnp.int32, R.shape, 0)
    S0 = jnp.where(ridx % 2 == 0, Rm, Rp)
    # global row-edge weights (first/last stripes only)
    row_edge = (is_first & (ridx == top_row)) | (is_last & (ridx == bot_row))
    a0 = jnp.where(row_edge, jnp.asarray(0.5, dtype),
                   jnp.asarray(0.75, dtype))
    b0 = jnp.where(row_edge, jnp.asarray(0.0, dtype),
                   jnp.asarray(0.25, dtype))
    out = a0 * R + b0 * S0
    # lanes: +-2 shift with parity select; edge positions static, the
    # presence of a global edge is traced (cf/cl) for blocked callers
    zc2 = jnp.zeros_like(out[:, :2])
    Cm = jnp.concatenate([zc2, out[:, :-2]], axis=1)
    Cp = jnp.concatenate([out[:, 2:], zc2], axis=1)
    cidx = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
    S1 = jnp.where(cidx % 2 == 0, Cm, Cp)
    lane_edge = (cf & (cidx == left_col)) | (cl & (cidx == right_col))
    a1 = jnp.where(lane_edge, jnp.asarray(0.5, dtype),
                   jnp.asarray(0.75, dtype))
    b1 = jnp.where(lane_edge, jnp.asarray(0.0, dtype),
                   jnp.asarray(0.25, dtype))
    return a1 * out + b1 * S1


# =====================================================================
# fused V-cycle half-levels: one Pallas program each
#   down: nu smoother sweeps -> residual -> 2x2 restrict   (u, R out)
#   up:   prolong(V) + correct -> nu smoother sweeps       (u out)
# u and f cross HBM once per half-level; r and the prolonged v never
# exist in HBM at all (the reference launches 2 kernels per sweep plus
# 4 transfer kernels per half-level, `gpu.lua:296-346`).
# =====================================================================


def _fused_plan(n, nu, smoother, itemsize, max_bm=0):
    """Stripe geometry for the fused half-level kernels.  The down
    kernel needs one extra exact halo ring after the sweeps for the
    residual stencil, hence radius*nu + 1."""
    radius = 2 if smoother == "rbgs" else 1
    halo = -(-(radius * nu + 1) // 8) * 8
    return halo, _pick_bm(n, halo, itemsize, n_bufs=6, smoother=smoother,
                          max_bm=max_bm)


@functools.partial(
    jax.jit,
    static_argnames=("h", "nu", "smoother", "bc", "interpret", "halo", "bm"))
def _smooth_rr_fused(u, f, *, h: float, nu: int, smoother: str, bc: str,
                     interpret: bool, halo: int, bm: int):
    """nu sweeps, then R = restrict(residual(u, f)); one HBM round trip.

    Returns (u_smoothed, R).  Interior stripe rows are exact after nu
    in-VMEM sweeps; the halo keeps >= 1 extra exact ring so the
    residual's neighbor reads are exact on the interior.
    """
    n = u.shape[0]
    dtype = u.dtype
    n_stripes = n // bm
    assert n_stripes >= 2 and bm > 2 * halo and bm % 16 == 0
    assert halo % 8 == 0, "in-flight-DMA disjointness needs 8-row halo"
    R_ = bm + 2 * halo
    hsq = h * h
    inv_hsq = 1.0 / hsq
    pmat = _halve_mat(n, dtype)

    def kernel(u_hbm, f_hbm, p_hbm, out_hbm, rout_hbm,
               us, fs, pv, outs, routs, in_sems, out_sems, rout_sems,
               p_sem):
        pdma = pltpu.make_async_copy(p_hbm, pv, p_sem)
        pdma.start()

        def issue(i, slot):
            _stripe_in_fresh("start", u_hbm, us, in_sems.at[slot, 0], i,
                             slot, bm, halo, n_stripes)
            _stripe_in_fresh("start", f_hbm, fs, in_sems.at[slot, 1], i,
                             slot, bm, halo, n_stripes)

        issue(0, 0)
        pdma.wait()

        def body(i, _):
            slot = jax.lax.rem(i, 2)
            other = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < n_stripes)
            def _():
                issue(i + 1, other)

            _stripe_in_fresh("wait", u_hbm, us, in_sems.at[slot, 0], i,
                             slot, bm, halo, n_stripes)
            _stripe_in_fresh("wait", f_hbm, fs, in_sems.at[slot, 1], i,
                             slot, bm, halo, n_stripes)

            # hand the next stripe its head (the 2*halo overlap rows)
            # from this stripe's freshly loaded buffer; disjoint from
            # the fresh-row DMA in flight (see _smooth_fused)
            @pl.when(i + 1 < n_stripes)
            def _():
                us[other, pl.ds(0, 2 * halo)] = us[slot,
                                                   pl.ds(bm, 2 * halo)]
                fs[other, pl.ds(0, 2 * halo)] = fs[slot,
                                                   pl.ds(bm, 2 * halo)]

            is_first = i == 0
            is_last = i == n_stripes - 1
            uv = _sweeps(us[slot], fs[slot], nu, smoother, bc, hsq, 0.0,
                         halo, bm, is_first, is_last)
            # ghost rows must hold boundary data for the residual reads
            uv = _apply_row_bc(uv, bc, is_first, is_last, halo - 1,
                               halo + bm)

            # residual on the full (sublane-aligned) stripe, interior
            # sliced after — Mosaic cannot lane-concat values carrying
            # an odd sublane offset, so no odd-offset row windows
            rv_full = fs[slot] - (_nbr(uv, bc) - 4.0 * uv) \
                * jnp.asarray(inv_hsq, dtype)
            rv = rv_full[halo:halo + bm, :]
            # 2x2 restrict: rows by sublane reshape, lanes on the MXU
            s = rv.reshape(bm // 2, 2, n).sum(axis=1)
            Rv = _lane_halve(s, pv[:]) * jnp.asarray(0.25, dtype)

            @pl.when(i >= 2)
            def _():
                pltpu.make_async_copy(
                    outs.at[slot], out_hbm.at[pl.ds(0, bm)],
                    out_sems.at[slot]).wait()
                pltpu.make_async_copy(
                    routs.at[slot], rout_hbm.at[pl.ds(0, bm // 2)],
                    rout_sems.at[slot]).wait()

            outs[slot] = uv[halo:halo + bm, :]
            pltpu.make_async_copy(
                outs.at[slot],
                out_hbm.at[pl.ds(pl.multiple_of(i * bm, 8), bm)],
                out_sems.at[slot]).start()
            routs[slot] = Rv
            pltpu.make_async_copy(
                routs.at[slot],
                rout_hbm.at[pl.ds(pl.multiple_of(i * (bm // 2), 8),
                                  bm // 2)],
                rout_sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, n_stripes, body, 0)

        for k in (n_stripes - 2, n_stripes - 1):
            slot = k % 2
            pltpu.make_async_copy(
                outs.at[slot], out_hbm.at[pl.ds(k * bm, bm)],
                out_sems.at[slot]).wait()
            pltpu.make_async_copy(
                routs.at[slot], rout_hbm.at[pl.ds(k * (bm // 2), bm // 2)],
                rout_sems.at[slot]).wait()

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((n, n), dtype),
                   jax.ShapeDtypeStruct((n // 2, n // 2), dtype)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        input_output_aliases=_alias(u),
        scratch_shapes=[
            pltpu.VMEM((2, R_, n), dtype),            # u stripes
            pltpu.VMEM((2, R_, n), dtype),            # f stripes
            pltpu.VMEM(pmat.shape, dtype),            # lane-halve matrix
            pltpu.VMEM((2, bm, n), dtype),            # u out stripes
            pltpu.VMEM((2, bm // 2, n // 2), dtype),  # R out stripes
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(u, f, pmat)


@functools.partial(
    jax.jit,
    static_argnames=("h", "nu", "smoother", "bc", "interpret", "halo",
                     "bm"))
def _rr_fused_zero(f, *, h: float, nu: int, smoother: str, bc: str,
                   interpret: bool, halo: int, bm: int):
    """_smooth_rr_fused from u IDENTICALLY ZERO — every coarse
    V-cycle's entry (cycle/vcycle.py hands the recursion u=None).  The
    zero iterate neither gets written to HBM nor read back: the kernel
    streams ONLY f and materializes the zeros in VMEM, so the
    half-level costs 2.25 array passes instead of 4.25.  Arithmetic is
    identical to _smooth_rr_fused on an explicit zeros array."""
    n = f.shape[0]
    dtype = f.dtype
    n_stripes = n // bm
    assert n_stripes >= 2 and bm > 2 * halo and bm % 16 == 0
    assert halo % 8 == 0
    R_ = bm + 2 * halo
    hsq = h * h
    inv_hsq = 1.0 / hsq
    pmat = _halve_mat(n, dtype)

    def kernel(f_hbm, p_hbm, out_hbm, rout_hbm,
               fs, pv, outs, routs, in_sems, out_sems, rout_sems,
               p_sem):
        pdma = pltpu.make_async_copy(p_hbm, pv, p_sem)
        pdma.start()

        def issue(i, slot):
            _stripe_in_fresh("start", f_hbm, fs, in_sems.at[slot], i,
                             slot, bm, halo, n_stripes)

        issue(0, 0)
        pdma.wait()

        def body(i, _):
            slot = jax.lax.rem(i, 2)
            other = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < n_stripes)
            def _():
                issue(i + 1, other)

            _stripe_in_fresh("wait", f_hbm, fs, in_sems.at[slot], i,
                             slot, bm, halo, n_stripes)

            @pl.when(i + 1 < n_stripes)
            def _():
                fs[other, pl.ds(0, 2 * halo)] = fs[slot,
                                                   pl.ds(bm, 2 * halo)]

            is_first = i == 0
            is_last = i == n_stripes - 1
            uv = _sweeps(jnp.zeros((R_, n), dtype), fs[slot], nu,
                         smoother, bc, hsq, 0.0, halo, bm, is_first,
                         is_last)
            uv = _apply_row_bc(uv, bc, is_first, is_last, halo - 1,
                               halo + bm)
            rv_full = fs[slot] - (_nbr(uv, bc) - 4.0 * uv) \
                * jnp.asarray(inv_hsq, dtype)
            rv = rv_full[halo:halo + bm, :]
            s = rv.reshape(bm // 2, 2, n).sum(axis=1)
            Rv = _lane_halve(s, pv[:]) * jnp.asarray(0.25, dtype)

            @pl.when(i >= 2)
            def _():
                pltpu.make_async_copy(
                    outs.at[slot], out_hbm.at[pl.ds(0, bm)],
                    out_sems.at[slot]).wait()
                pltpu.make_async_copy(
                    routs.at[slot], rout_hbm.at[pl.ds(0, bm // 2)],
                    rout_sems.at[slot]).wait()

            outs[slot] = uv[halo:halo + bm, :]
            pltpu.make_async_copy(
                outs.at[slot],
                out_hbm.at[pl.ds(pl.multiple_of(i * bm, 8), bm)],
                out_sems.at[slot]).start()
            routs[slot] = Rv
            pltpu.make_async_copy(
                routs.at[slot],
                rout_hbm.at[pl.ds(pl.multiple_of(i * (bm // 2), 8),
                                  bm // 2)],
                rout_sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, n_stripes, body, 0)

        for k in (n_stripes - 2, n_stripes - 1):
            slot = k % 2
            pltpu.make_async_copy(
                outs.at[slot], out_hbm.at[pl.ds(k * bm, bm)],
                out_sems.at[slot]).wait()
            pltpu.make_async_copy(
                routs.at[slot], rout_hbm.at[pl.ds(k * (bm // 2), bm // 2)],
                rout_sems.at[slot]).wait()

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((n, n), dtype),
                   jax.ShapeDtypeStruct((n // 2, n // 2), dtype)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, R_, n), dtype),            # f stripes
            pltpu.VMEM(pmat.shape, dtype),            # lane-halve matrix
            pltpu.VMEM((2, bm, n), dtype),            # u out stripes
            pltpu.VMEM((2, bm // 2, n // 2), dtype),  # R out stripes
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=_compiler_params(
            f.dtype.itemsize * (2 * R_ * n + 2 * bm * n
                                + bm * n // 2 + pmat.size)),
        interpret=interpret,
    )(f, pmat)


@functools.partial(
    jax.jit,
    static_argnames=("h", "nu", "smoother", "bc", "kind", "interpret",
                     "halo", "bm", "rnorm"))
def _pc_smooth_fused(u, f, V, *, h: float, nu: int, smoother: str, bc: str,
                     kind: str, interpret: bool, halo: int, bm: int,
                     rnorm: bool = False):
    """u += P(V) then nu sweeps; one HBM round trip (V read once).

    The coarse stripe is loaded with an 8-row coarse halo (16 fine rows
    >= halo + 2, covering both the sweeps' dependency radius and the
    bilinear +-2 shift); stale clipped rows fall in the fine ghost
    region, which the per-sweep boundary fixups overwrite.

    rnorm: additionally return a (1, n) f32 row of column-partial
    sums of the result's squared residual (sum it for ||r||^2) —
    stop='residual' for free: u and f are already in VMEM, and the
    shared _fused_plan halo (radius*nu + 1) keeps one exact ring for
    the residual's neighbor reads.
    """
    n = u.shape[0]
    nc = n // 2
    dtype = u.dtype
    n_stripes = n // bm
    assert n_stripes >= 2 and bm > 2 * halo and bm % 16 == 0
    assert halo % 8 == 0, "in-flight-DMA disjointness needs 8-row halo"
    assert halo <= 14, "coarse halo of 8 covers fine halo + bilinear shift"
    R_ = bm + 2 * halo
    chalo = 8
    Rc = bm // 2 + 2 * chalo
    hsq = h * h
    inv_hsq = 1.0 / hsq
    emat = _double_mat(n, dtype)

    def kernel(u_hbm, f_hbm, v_hbm, e_hbm, out_hbm, *rest):
        if rnorm:
            (racc_hbm, us, fs, vs, ev, outs, racc,
             in_sems, out_sems, e_sem, r_sem) = rest
            racc[:] = jnp.zeros_like(racc)
        else:
            us, fs, vs, ev, outs, in_sems, out_sems, e_sem = rest
        edma = pltpu.make_async_copy(e_hbm, ev, e_sem)
        edma.start()

        def issue(i, slot):
            _stripe_in_fresh("start", u_hbm, us, in_sems.at[slot, 0], i,
                             slot, bm, halo, n_stripes)
            _stripe_in_fresh("start", f_hbm, fs, in_sems.at[slot, 1], i,
                             slot, bm, halo, n_stripes)
            _stripe_in("start", v_hbm, vs, in_sems.at[slot, 2], i, slot,
                       bm // 2, chalo, n_stripes)

        issue(0, 0)
        edma.wait()

        def body(i, _):
            slot = jax.lax.rem(i, 2)
            other = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < n_stripes)
            def _():
                issue(i + 1, other)

            _stripe_in_fresh("wait", u_hbm, us, in_sems.at[slot, 0], i,
                             slot, bm, halo, n_stripes)
            _stripe_in_fresh("wait", f_hbm, fs, in_sems.at[slot, 1], i,
                             slot, bm, halo, n_stripes)
            _stripe_in("wait", v_hbm, vs, in_sems.at[slot, 2], i, slot,
                       bm // 2, chalo, n_stripes)

            # hand the next stripe its head (the 2*halo overlap rows)
            # from this stripe's freshly loaded buffer; disjoint from
            # the fresh-row DMA in flight (see _smooth_fused)
            @pl.when(i + 1 < n_stripes)
            def _():
                us[other, pl.ds(0, 2 * halo)] = us[slot,
                                                   pl.ds(bm, 2 * halo)]
                fs[other, pl.ds(0, 2 * halo)] = fs[slot,
                                                   pl.ds(bm, 2 * halo)]

            is_first = i == 0
            is_last = i == n_stripes - 1
            # expand the coarse stripe to fine rows [i*bm - 2*chalo, ...)
            v2 = jnp.repeat(vs[slot], 2, axis=0)      # (bm + 4*chalo, nc)
            vf = _lane_double(v2, ev[:])              # (bm + 4*chalo, n)
            if kind == "bilinear":
                # zero the clipped (stale-scratch) ghost region first:
                # the blend's +-2 shift reads it at the grid edges, and
                # its 0-weight would still propagate stale NaNs (0*nan)
                ridx = jax.lax.broadcasted_iota(jnp.int32,
                                                (vf.shape[0], 1), 0)
                vf = jnp.where(is_first & (ridx < 2 * chalo), 0.0, vf)
                vf = jnp.where(is_last & (ridx >= bm + 2 * chalo), 0.0, vf)
                # local row of global row 0 on the first stripe is
                # 2*chalo; of global row n-1 on the last, bm+2*chalo-1
                vf = _bilinear_blend_2d(vf, 2 * chalo, bm + 2 * chalo - 1,
                                        is_first, is_last, n)
            # slice to the u stripe's rows [i*bm - halo, i*bm + bm + halo)
            vf = vf[2 * chalo - halo:2 * chalo - halo + R_, :]

            uv = us[slot] + vf
            uv = _sweeps(uv, fs[slot], nu, smoother, bc, hsq, 0.0,
                         halo, bm, is_first, is_last)

            if rnorm:
                # ghosts must hold boundary data for the residual reads
                # (center rows are untouched by the fixup)
                uv = _apply_row_bc(uv, bc, is_first, is_last, halo - 1,
                                   halo + bm)
                rv = (fs[slot] - (_nbr(uv, bc) - 4.0 * uv)
                      * jnp.asarray(inv_hsq, dtype))[halo:halo + bm, :]
                rv = rv.astype(jnp.float32)
                racc[:] = racc[:] + jnp.sum(rv * rv, axis=0,
                                            keepdims=True)

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

        for k in (n_stripes - 2, n_stripes - 1):
            slot = k % 2
            pltpu.make_async_copy(
                outs.at[slot], out_hbm.at[pl.ds(k * bm, bm)],
                out_sems.at[slot]).wait()

        if rnorm:
            rdma = pltpu.make_async_copy(racc, racc_hbm, r_sem)
            rdma.start()
            rdma.wait()

    out_shape = jax.ShapeDtypeStruct((n, n), dtype)
    scratch = [
        pltpu.VMEM((2, R_, n), dtype),        # u stripes
        pltpu.VMEM((2, R_, n), dtype),        # f stripes
        pltpu.VMEM((2, Rc, nc), dtype),       # V stripes
        pltpu.VMEM(emat.shape, dtype),        # lane-double matrix
        pltpu.VMEM((2, bm, n), dtype),        # out stripes
    ]
    sems = [
        pltpu.SemaphoreType.DMA((2, 3)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA(()),
    ]
    if rnorm:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((1, n), jnp.float32))
        scratch = scratch + [pltpu.VMEM((1, n), jnp.float32)]
        sems = sems + [pltpu.SemaphoreType.DMA(())]
        out_specs = (pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pl.ANY))
    else:
        out_specs = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=out_specs,
        input_output_aliases=_alias(u),
        scratch_shapes=scratch + sems,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(u, f, V, emat)


# --------------------------- whole-VMEM fused variants (small levels)

@functools.partial(
    jax.jit, static_argnames=("h", "nu", "smoother", "bc", "interpret"))
def _rr_whole(u, f, *, h, nu, smoother, bc, interpret):
    n = u.shape[0]
    dtype = u.dtype
    hsq = h * h
    pmat = _halve_mat(n, dtype)

    def kernel(u_ref, f_ref, p_ref, out_ref, rout_ref):
        uv = _whole_sweeps(u_ref[:], f_ref[:], nu, smoother, bc, hsq)
        out_ref[:] = uv
        fv = f_ref[:]
        rv = fv - (_nbr_full(uv, bc) - 4.0 * uv) * jnp.asarray(
            1.0 / hsq, dtype)
        s = rv.reshape(n // 2, 2, n).sum(axis=1)
        rout_ref[:] = _lane_halve(s, p_ref[:]) * jnp.asarray(0.25, dtype)

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((n, n), dtype),
                   jax.ShapeDtypeStruct((n // 2, n // 2), dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(u, f, pmat)


@functools.partial(
    jax.jit,
    static_argnames=("h", "nu", "smoother", "bc", "kind", "interpret",
                     "rnorm"))
def _pc_whole(u, f, V, *, h, nu, smoother, bc, kind, interpret,
              rnorm: bool = False):
    n = u.shape[0]
    dtype = u.dtype
    hsq = h * h
    emat = _double_mat(n, dtype)

    def kernel(u_ref, f_ref, v_ref, e_ref, out_ref, *maybe_r):
        v2 = jnp.repeat(v_ref[:], 2, axis=0)
        vf = _lane_double(v2, e_ref[:])
        if kind == "bilinear":
            vf = _bilinear_blend_2d(vf, 0, n - 1, True, True, n)
        uv = u_ref[:] + vf
        uv = _whole_sweeps(uv, f_ref[:], nu, smoother, bc, hsq)
        out_ref[:] = uv
        if rnorm:
            rv = (f_ref[:] - (_nbr_full(uv, bc) - 4.0 * uv)
                  * jnp.asarray(1.0 / hsq, dtype)).astype(jnp.float32)
            maybe_r[0][:] = jnp.sum(rv * rv, axis=0, keepdims=True)

    out_shape = jax.ShapeDtypeStruct((n, n), dtype)
    out_specs = pl.BlockSpec(memory_space=pltpu.VMEM)
    if rnorm:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((1, n), jnp.float32))
        out_specs = (out_specs, pl.BlockSpec(memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=out_specs,
        interpret=interpret,
    )(u, f, V, emat)


def _whole_sweeps(uv, fv, nu, smoother, bc, hsq):
    """nu smoother sweeps on a full-grid value (both bcs inline)."""
    dtype = uv.dtype
    n = uv.shape[0]
    c1 = fv * jnp.asarray(-hsq * 0.25, dtype)
    quarter = jnp.asarray(0.25, dtype)
    omega = 0.8
    one_m_om = jnp.asarray(1.0 - omega, dtype)
    om_quarter = jnp.asarray(omega * 0.25, dtype)
    c1w = fv * jnp.asarray(-hsq * 0.25 * omega, dtype)
    if smoother == "rbgs":
        if _RBGS_PACKED and n % _LANE_CHUNK == 0:
            return _rbgs_packed_sweeps(
                uv, fv, nu, bc, hsq, halo=0, bm=n,
                is_first=True, is_last=True)
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
    return uv


# ------------------------------------------------- composite (fused) ops
# One call per V-cycle half-level.  (Round 1's attempt at these blew up
# Mosaic compile time by interleaving lanes with iota/where blends; the
# MXU selection-matmul lane ops above lower cleanly and the XLA
# reduce_window / repeat paths they replace measured only ~210-380 GB/s
# at 4096^2 — far off the claimed roofline.)

def _fused_plan_or_whole(u, nu, smoother):
    """Returns ('striped', halo, bm) | ('whole', 0, 0) |
    ('wide', hr, (bm, bc)) | None."""
    if not _supported(u) or nu < 1:
        return None
    if smoother not in ("jacobi", "wjacobi", "rbgs"):
        return None
    if nu > (4 if smoother == "rbgs" else 8):
        return None
    n = u.shape[0]
    if min(_LANE_CHUNK, n) and n % min(_LANE_CHUNK, n) != 0:
        return None
    itemsize = jnp.dtype(u.dtype).itemsize
    halo, bm = _fused_plan(n, nu, smoother, itemsize)
    if (n // bm >= 2 and bm > 2 * halo and bm % 16 == 0 and halo <= 14):
        return ("striped", halo, bm)
    if 5 * n * n * itemsize <= _VMEM_BUDGET \
            and _bf16_whole_ok(n, itemsize):
        return ("whole", 0, 0)
    if itemsize < 4:
        # bf16 whole-VMEM is clamped (Mosaic crash at 1024^2); retry
        # striping below the whole-array stripe before falling through
        # to the wide kernels (untested this small)
        halo, bm = _fused_plan(n, nu, smoother, itemsize, max_bm=n // 2)
        if (n // bm >= 2 and bm > 2 * halo and bm % 16 == 0
                and halo <= 14):
            return ("striped", halo, bm)
    # very large grids (n >= 8192): two-axis blocked kernels; the
    # residual tail needs one extra exact ring within the 8-row halo
    radius = 2 if smoother == "rbgs" else 1
    if radius * nu + 1 <= 8:
        wide = _plan_wide(n, nu, smoother, itemsize, n_v_bufs=2)
        if wide is not None:
            hr, bm_w, bc_w = wide   # bm multiple of 16, bc of 256
            return ("wide", hr, (bm_w, bc_w))
    return None


def smooth_residual_restrict(u, f, h, nu, smoother="jacobi", bc="ghost0"):
    """pre-smooth x nu, then R = restrict(residual). Returns (u, R)."""
    if u.ndim == 3 and _supported3(u) and 1 <= nu:
        p3 = _plan3d(u.shape, nu, smoother,
                     jnp.dtype(u.dtype).itemsize, composite=True)
        if p3 is not None:
            hz, bz, by = p3
            return _rr_fused_3d(u, f, h=float(h), nu=nu,
                                smoother=smoother, bc=bc,
                                interpret=_interpret(), hz=hz, bz=bz,
                                by=by)
    plan = _fused_plan_or_whole(u, nu, smoother)
    if plan is not None:
        mode, halo, bm = plan
        if mode == "striped":
            return _smooth_rr_fused(u, f, h=float(h), nu=nu,
                                    smoother=smoother, bc=bc,
                                    interpret=_interpret(), halo=halo,
                                    bm=bm)
        if mode == "wide":
            bm_w, bc_w = bm
            return _rr_fused_wide(u, f, h=float(h), nu=nu,
                                  smoother=smoother, bc=bc,
                                  interpret=_interpret(), hr=halo,
                                  bm=bm_w, bcw=bc_w)
        return _rr_whole(u, f, h=float(h), nu=nu, smoother=smoother,
                         bc=bc, interpret=_interpret())
    u = smooth(u, f, h, nu, smoother, bc)
    return u, xla.residual_restrict(u, f, h, bc)


def smooth_residual_restrict_zero(f, h, nu, smoother="jacobi",
                                  bc="ghost0"):
    """Down-leg from u IDENTICALLY ZERO (every coarse V-cycle entry):
    the striped kernel streams only f — no zeros write, no u re-read
    (2.25 array passes instead of 4.25).  Geometries without a striped
    plan fall back to an explicit zeros array (XLA folds it; the
    whole-VMEM and 3D levels are small or already cheap)."""
    # n >= 4096 only: the zeros write + u re-read cost ~0.65 ms at
    # 8192 and ~0.16 at 4096 but pennies below — not worth one more
    # Mosaic compile per small level
    if f.ndim == 2 and f.shape[0] >= 4096:
        plan = _fused_plan_or_whole(f, nu, smoother)
        if plan is not None and plan[0] == "striped":
            _, halo, bm = plan
            return _rr_fused_zero(f, h=float(h), nu=nu,
                                  smoother=smoother, bc=bc,
                                  interpret=_interpret(), halo=halo,
                                  bm=bm)
    return smooth_residual_restrict(jnp.zeros_like(f), f, h, nu,
                                    smoother, bc)


def prolong_correct_smooth(u, f, V, h, nu, smoother="jacobi", bc="ghost0",
                           kind="inject"):
    """u += P(V), then post-smooth x nu."""
    if u.ndim == 3 and _supported3(u) and 1 <= nu:
        p3 = _plan3d(u.shape, nu, smoother,
                     jnp.dtype(u.dtype).itemsize, composite=True)
        if p3 is not None:
            hz, bz, by = p3
            return _pc_fused_3d(u, f, V, h=float(h), nu=nu,
                                smoother=smoother, bc=bc, kind=kind,
                                interpret=_interpret(), hz=hz, bz=bz,
                                by=by)
    plan = _fused_plan_or_whole(u, nu, smoother)
    if plan is not None:
        mode, halo, bm = plan
        if mode == "striped":
            return _pc_smooth_fused(u, f, V, h=float(h), nu=nu,
                                    smoother=smoother, bc=bc, kind=kind,
                                    interpret=_interpret(), halo=halo,
                                    bm=bm)
        if mode == "wide":
            bm_w, bc_w = bm
            return _pc_fused_wide(u, f, V, h=float(h), nu=nu,
                                  smoother=smoother, bc=bc, kind=kind,
                                  interpret=_interpret(), hr=halo,
                                  bm=bm_w, bcw=bc_w)
        return _pc_whole(u, f, V, h=float(h), nu=nu, smoother=smoother,
                         bc=bc, kind=kind, interpret=_interpret())
    u = xla.prolong_correct(u, V, kind)
    return smooth(u, f, h, nu, smoother, bc)


def prolong_correct_smooth_rnorm(u, f, V, h, nu, smoother="jacobi",
                                 bc="ghost0", kind="inject"):
    """Up-leg + the squared residual norm of the result: (u, sum(r^2)).

    Same contract as xla.prolong_correct_smooth_rnorm, but the norm
    falls out of the fused kernel's output drain — u and f are already
    in VMEM on the last pass, so stop='residual' costs no extra HBM
    round trip (the N9 host-sync elimination of `gpu.lua:361-369`
    taken to its conclusion)."""
    if bc != "ghost0":
        # contract: the rnorm is ALWAYS the zero-ghost fine-level
        # operator (it is the solver's stopping metric; only the fine
        # level calls this).  The fused kernels' rnorm blocks compute r
        # with the smoothing bc, so for any external face-bc use keep
        # the fast up-leg but take the metric separately.
        u = prolong_correct_smooth(u, f, V, h, nu, smoother, bc, kind)
        return u, xla.residual_sq_sum(u, f, h)
    if u.ndim == 3 and _supported3(u) and 1 <= nu:
        p3 = _plan3d(u.shape, nu, smoother,
                     jnp.dtype(u.dtype).itemsize, composite=True)
        if p3 is not None:
            hz, bz, by = p3
            u, racc = _pc_fused_3d(u, f, V, h=float(h), nu=nu,
                                   smoother=smoother, bc=bc, kind=kind,
                                   interpret=_interpret(), hz=hz, bz=bz,
                                   by=by, rnorm=True)
            return u, jnp.sum(racc)
    if u.ndim == 2:
        plan = _fused_plan_or_whole(u, nu, smoother)
        if plan is not None:
            mode, halo, bm = plan
            if mode == "striped":
                u, racc = _pc_smooth_fused(u, f, V, h=float(h), nu=nu,
                                           smoother=smoother, bc=bc,
                                           kind=kind,
                                           interpret=_interpret(),
                                           halo=halo, bm=bm, rnorm=True)
            elif mode == "wide":
                bm_w, bc_w = bm
                u, racc = _pc_fused_wide(u, f, V, h=float(h), nu=nu,
                                         smoother=smoother, bc=bc,
                                         kind=kind,
                                         interpret=_interpret(), hr=halo,
                                         bm=bm_w, bcw=bc_w, rnorm=True)
            else:
                u, racc = _pc_whole(u, f, V, h=float(h), nu=nu,
                                    smoother=smoother, bc=bc, kind=kind,
                                    interpret=_interpret(), rnorm=True)
            return u, jnp.sum(racc)
    return xla.prolong_correct_smooth_rnorm(u, f, V, h, nu, smoother,
                                            bc, kind)


# =====================================================================
# packed-PERSISTENT fine-level kernels
# =====================================================================
# The per-call packed form above loses because each smooth pays ~0.7 ms
# of pack/unpack MXU selection matmuls at 4096^2.  Here the fine-level
# STATE stays checkerboard-packed in HBM across the entire solve:
#
#   up[:, :n/2] = xr (red plane),  up[:, n/2:] = xb (black plane)
#
# one (n, n) array per field, left half red, right half black — the
# SAME shape and stripe-DMA geometry as the unpacked kernels, so the
# manual double-buffered pipeline carries over unchanged.  Pack/unpack
# happen once per solve (solver boundary, mgpoisson.cycle.packed), so
# the 2.5x-cheaper packed sweep (6.89 -> 2.79 us/sweep at 1024^2,
# tests/test_rbgs_packed.py) is finally realized.  Bonus: the level
# transfers get CHEAPER than unpacked —
#   restrict: coarse col J == packed lane j (xr[i,j] covers fine cols
#     {2j, 2j+1} jointly with xb[i,j]), so the 2x2 mean is
#     (r_red + r_black) summed over row pairs: a sublane pair-sum,
#     replacing the lane-halve MXU matmul.
#   prolong: repeat(V, 2, axis=0) lands DIRECTLY in packed lanes
#     (coarse lanes == packed lanes), replacing the lane-double matmul;
#     the bilinear lane blend becomes a +-1 packed-lane shift with
#     parity-dependent direction per color.
# Fine level only (86% of the cycle); coarse levels run the unpacked
# path.  ghost0 bc only — the fine level's bc by problem definition
# (`cpu.lua:41-55`: the reference's fine operator).


def packed_plan(n: int, nu: int, itemsize: int):
    """Stripe geometry for the packed-persistent kernels, or None.
    rbgs-only (radius 2) + one exact ring for the fused residual.

    Buffer census is 5 full-width buffer-rows (u in x2, f in x2, out
    x2 at bm plus the quarter-size Rc/V stripes), tighter than
    _fused_plan's 6 — the difference matters at 16384^2 f32, where it
    admits bm=32 striping.  Exact-census check (ADVICE r4): the true
    footprint is 4*(bm+2h)*n + 2*bm*n + max(Rc, V) bytes — 18.9 MB at
    bm=32/16384^2, measured compiling and running on device (r5); an
    exact census at the proven ~19 MB envelope selects the SAME bm at
    every engaged size (bm=64 at 16384 needs 31.5 MB, crash zone), so
    the 5-row heuristic stands.  Thin stripes cost no extra HBM
    traffic: the halo head is a VMEM handoff from the previous
    stripe's buffer (_stripe_in_fresh), unlike the wide kernels'
    128-lane column halo which is redundant DMA every block."""
    if nu < 1 or nu > 3 or n < _LANE_CHUNK or n % _LANE_CHUNK:
        return None
    halo = -(-(2 * nu + 1) // 8) * 8
    bm = _pick_bm(n, halo, itemsize, n_bufs=5, smoother="rbgs",
                  max_bm=n // 2)
    if n // bm >= 2 and bm > 2 * halo and bm % 16 == 0 and halo <= 14:
        return halo, bm
    return None


def pack_grid(u):
    """(n, n) -> (n, n) packed [xr | xb].  Exact (0/1 selection
    matmuls, one contributor per lane); pure jnp, runs anywhere."""
    se, so = _pack_sel_mats(u.dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (u.shape[0], 1), 0)
    er = (rows % 2) == 0
    ue, uo = _lane_pack(u, se), _lane_pack(u, so)
    return jnp.concatenate([jnp.where(er, ue, uo),
                            jnp.where(er, uo, ue)], axis=1)


def unpack_grid(up):
    """Inverse of pack_grid (exact roundtrip)."""
    w = up.shape[1] // 2
    xr, xb = up[:, :w], up[:, w:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (up.shape[0], 1), 0)
    er = (rows % 2) == 0
    se, so = _pack_sel_mats(up.dtype)
    return _lane_unpack(jnp.where(er, xr, xb), jnp.where(er, xb, xr),
                        se, so)


def _packed_prolong_stripe(vv, kind, is_first, is_last, chalo, bm):
    """Expand a coarse stripe (bm/2 + 2*chalo, w) to the packed
    red/black correction planes over fine rows
    [i*bm - 2*chalo, i*bm + bm + 2*chalo).  Returns (Pr, Pb), each
    (bm + 4*chalo, w) — coarse lanes ARE packed lanes, so 'inject' is
    a pure sublane double and 'bilinear' adds the face-adapted blend
    (row part identical to _bilinear_blend_2d; lane part a +-1 shift
    whose direction flips with row parity and color)."""
    dtype = vv.dtype
    if kind == "bilinear" and dtype.itemsize < 4:
        # same Mosaic sub-f32 parity-shift crash as _bilinear_blend_2d
        pr, pb = _packed_prolong_stripe(vv.astype(jnp.float32), kind,
                                        is_first, is_last, chalo, bm)
        return pr.astype(dtype), pb.astype(dtype)
    v2 = jnp.repeat(vv, 2, axis=0)              # fine rows, packed lanes
    if kind == "inject":
        return v2, v2
    rows = jax.lax.broadcasted_iota(jnp.int32, (v2.shape[0], 1), 0)
    # zero the clipped stale-scratch ghost region: the +-2 row shift
    # reads it at the grid edges and 0-weight still propagates 0*nan
    v2 = jnp.where(is_first & (rows < 2 * chalo), 0.0, v2)
    v2 = jnp.where(is_last & (rows >= bm + 2 * chalo), 0.0, v2)
    # row blend: out[2I] = a*V[I] + b*V[I-1], out[2I+1] = a*V[I] +
    # b*V[I+1]; (a, b) = (0.75, 0.25) interior, (0.5, 0) at global
    # rows 0 / n-1 (local rows 2*chalo / bm + 2*chalo - 1)
    zr2 = jnp.zeros_like(v2[:2, :])
    vm = jnp.concatenate([zr2, v2[:-2, :]], axis=0)
    vp = jnp.concatenate([v2[2:, :], zr2], axis=0)
    er = (rows % 2) == 0
    s0 = jnp.where(er, vm, vp)
    row_edge = ((is_first & (rows == 2 * chalo))
                | (is_last & (rows == bm + 2 * chalo - 1)))
    a0 = jnp.where(row_edge, jnp.asarray(0.5, dtype),
                   jnp.asarray(0.75, dtype))
    b0 = jnp.where(row_edge, jnp.asarray(0.0, dtype),
                   jnp.asarray(0.25, dtype))
    B = a0 * v2 + b0 * s0
    # lane blend per color: red holds fine col 2j + row%2, so its +-2
    # fine-col partner is packed lane j-1 on even rows / j+1 on odd
    # (black the mirror); global edge cols 0 / n-1 get (0.5, 0) at the
    # parity-matching rows of each color
    w = B.shape[1]
    zc = jnp.zeros_like(B[:, :1])
    bl = jnp.concatenate([zc, B[:, :-1]], axis=1)   # lane j-1
    br = jnp.concatenate([B[:, 1:], zc], axis=1)    # lane j+1
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    half = jnp.asarray(0.5, dtype)
    a_in = jnp.asarray(0.75, dtype)
    b_in = jnp.asarray(0.25, dtype)

    def blend(red):
        s1 = jnp.where(er, bl, br) if red else jnp.where(er, br, bl)
        if red:
            edge = (er & (cols == 0)) | (~er & (cols == w - 1))
        else:
            edge = (er & (cols == w - 1)) | (~er & (cols == 0))
        a1 = jnp.where(edge, half, a_in)
        b1 = jnp.where(edge, jnp.asarray(0.0, dtype), b_in)
        return a1 * B + b1 * s1

    return blend(True), blend(False)


@functools.partial(
    jax.jit,
    static_argnames=("h", "nu", "interpret", "halo", "bm",
                     "write_through"))
def _packed_rr_fused(up, fp, *, h: float, nu: int, interpret: bool,
                     halo: int, bm: int, write_through: bool = False):
    """Packed down-leg: nu rbgs sweeps + residual + 2x2 restrict, all
    in the packed layout; one HBM round trip.  Returns (up', Rc) with
    Rc the UNPACKED (n/2, n/2) coarse rhs (coarse levels run the
    normal path).  ghost0 only (fine level).

    write_through: drop the double-buffered out stripes and drain the
    result from the INPUT stripe buffer's interior rows — the buffer
    is dead after the head handoff, and the freed 2*bm rows of VMEM
    buy a 2x-wider stripe at sizes where the plain census bottoms out
    (bm=32 at 16384^2 f32 = 50% redundant sweep rows).  Cost: the
    drain must finish before stripe i+2's fresh DMA reuses the slot —
    one extra wait two stripes upstream, far behind the compute."""
    n = up.shape[0]
    w = n // 2
    dtype = up.dtype
    n_stripes = n // bm
    assert n_stripes >= 2 and bm > 2 * halo and bm % 16 == 0
    assert halo % 8 == 0
    R_ = bm + 2 * halo
    hsq = h * h
    inv_hsq = 1.0 / hsq

    def kernel(u_hbm, f_hbm, out_hbm, rout_hbm, *rest):
        if write_through:
            us, fs, routs, in_sems, out_sems, rout_sems = rest
            outs = None
        else:
            us, fs, outs, routs, in_sems, out_sems, rout_sems = rest

        def issue(i, slot):
            _stripe_in_fresh("start", u_hbm, us, in_sems.at[slot, 0], i,
                             slot, bm, halo, n_stripes)
            _stripe_in_fresh("start", f_hbm, fs, in_sems.at[slot, 1], i,
                             slot, bm, halo, n_stripes)

        issue(0, 0)

        def body(i, _):
            slot = jax.lax.rem(i, 2)
            other = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < n_stripes)
            def _():
                if write_through:
                    # the other slot's write-through drain (started in
                    # body i-1) must land before its fresh reload
                    @pl.when(i >= 1)
                    def _():
                        pltpu.make_async_copy(
                            us.at[other, pl.ds(halo, bm)],
                            out_hbm.at[pl.ds(0, bm)],
                            out_sems.at[other]).wait()
                issue(i + 1, other)

            _stripe_in_fresh("wait", u_hbm, us, in_sems.at[slot, 0], i,
                             slot, bm, halo, n_stripes)
            _stripe_in_fresh("wait", f_hbm, fs, in_sems.at[slot, 1], i,
                             slot, bm, halo, n_stripes)

            @pl.when(i + 1 < n_stripes)
            def _():
                us[other, pl.ds(0, 2 * halo)] = us[slot,
                                                   pl.ds(bm, 2 * halo)]
                fs[other, pl.ds(0, 2 * halo)] = fs[slot,
                                                   pl.ds(bm, 2 * halo)]

            is_first = i == 0
            is_last = i == n_stripes - 1
            uv, fv = us[slot], fs[slot]
            xr, xb = uv[:, :w], uv[:, w:]
            fr, fb = fv[:, :w], fv[:, w:]
            mhq = jnp.asarray(-hsq * 0.25, dtype)
            xr, xb = _packed_core(xr, xb, fr * mhq, fb * mhq, nu,
                                  "ghost0", halo=halo, bm=bm,
                                  is_first=is_first, is_last=is_last)
            rows = jax.lax.broadcasted_iota(jnp.int32, (R_, 1), 0)
            er = (rows % 2) == 0
            r_r, r_b = _packed_residual(xr, xb, fr, fb, inv_hsq, er)
            # 2x2 restrict: colors union each lane's fine-col pair, so
            # sum colors then pair-sum rows — no lane matmul at all
            s = (r_r + r_b)[halo:halo + bm, :]
            Rv = s.reshape(bm // 2, 2, w).sum(axis=1) \
                * jnp.asarray(0.25, dtype)

            @pl.when(i >= 2)
            def _():
                if not write_through:
                    pltpu.make_async_copy(
                        outs.at[slot], out_hbm.at[pl.ds(0, bm)],
                        out_sems.at[slot]).wait()
                pltpu.make_async_copy(
                    routs.at[slot], rout_hbm.at[pl.ds(0, bm // 2)],
                    rout_sems.at[slot]).wait()

            if write_through:
                us[slot, pl.ds(halo, bm)] = jnp.concatenate(
                    [xr[halo:halo + bm, :], xb[halo:halo + bm, :]],
                    axis=1)
                pltpu.make_async_copy(
                    us.at[slot, pl.ds(halo, bm)],
                    out_hbm.at[pl.ds(pl.multiple_of(i * bm, 8), bm)],
                    out_sems.at[slot]).start()
            else:
                outs[slot] = jnp.concatenate(
                    [xr[halo:halo + bm, :], xb[halo:halo + bm, :]],
                    axis=1)
                pltpu.make_async_copy(
                    outs.at[slot],
                    out_hbm.at[pl.ds(pl.multiple_of(i * bm, 8), bm)],
                    out_sems.at[slot]).start()
            routs[slot] = Rv
            pltpu.make_async_copy(
                routs.at[slot],
                rout_hbm.at[pl.ds(pl.multiple_of(i * (bm // 2), 8),
                                  bm // 2)],
                rout_sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, n_stripes, body, 0)

        for k in (n_stripes - 2, n_stripes - 1):
            slot = k % 2
            src = us.at[slot, pl.ds(halo, bm)] if write_through \
                else outs.at[slot]
            pltpu.make_async_copy(
                src, out_hbm.at[pl.ds(k * bm, bm)],
                out_sems.at[slot]).wait()
            pltpu.make_async_copy(
                routs.at[slot], rout_hbm.at[pl.ds(k * (bm // 2), bm // 2)],
                rout_sems.at[slot]).wait()

    scratch = [
        pltpu.VMEM((2, R_, n), dtype),            # packed u stripes
        pltpu.VMEM((2, R_, n), dtype),            # packed f stripes
        pltpu.VMEM((2, bm, n), dtype),            # u out stripes
        pltpu.VMEM((2, bm // 2, n // 2), dtype),  # Rc out stripes
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if write_through:
        del scratch[2]                             # no out stripes
    census = dtype.itemsize * (4 * R_ * n + bm * n // 4
                               + (0 if write_through else 2 * bm * n))
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((n, n), dtype),
                   jax.ShapeDtypeStruct((n // 2, n // 2), dtype)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        input_output_aliases=_alias(up),
        scratch_shapes=scratch,
        compiler_params=_compiler_params(census),
        interpret=interpret,
    )(up, fp)


@functools.partial(
    jax.jit,
    static_argnames=("h", "nu", "kind", "interpret", "halo", "bm",
                     "rnorm", "write_through"))
def _packed_pc_fused(up, fp, V, *, h: float, nu: int, kind: str,
                     interpret: bool, halo: int, bm: int,
                     rnorm: bool = False, write_through: bool = False):
    """Packed up-leg: u += P(V) + nu rbgs sweeps in the packed layout;
    V is the UNPACKED (n/2, n/2) coarse correction.  rnorm: also
    return a (1, n) f32 row of column-partial sums of the result's
    squared residual (free stop='residual', as _pc_smooth_fused).
    write_through: drain from the input stripe buffer (see
    _packed_rr_fused) — frees 2*bm VMEM rows for a wider stripe."""
    n = up.shape[0]
    w = n // 2
    dtype = up.dtype
    n_stripes = n // bm
    assert n_stripes >= 2 and bm > 2 * halo and bm % 16 == 0
    assert halo % 8 == 0 and halo <= 14
    R_ = bm + 2 * halo
    chalo = 8
    Rc = bm // 2 + 2 * chalo
    hsq = h * h
    inv_hsq = 1.0 / hsq

    def kernel(u_hbm, f_hbm, v_hbm, out_hbm, *rest):
        if rnorm and write_through:
            (racc_hbm, us, fs, vs, racc,
             in_sems, out_sems, r_sem) = rest
            outs = None
        elif rnorm:
            (racc_hbm, us, fs, vs, outs, racc,
             in_sems, out_sems, r_sem) = rest
        elif write_through:
            us, fs, vs, in_sems, out_sems = rest
            outs = None
        else:
            us, fs, vs, outs, in_sems, out_sems = rest
        if rnorm:
            racc[:] = jnp.zeros_like(racc)

        def issue(i, slot):
            _stripe_in_fresh("start", u_hbm, us, in_sems.at[slot, 0], i,
                             slot, bm, halo, n_stripes)
            _stripe_in_fresh("start", f_hbm, fs, in_sems.at[slot, 1], i,
                             slot, bm, halo, n_stripes)
            _stripe_in("start", v_hbm, vs, in_sems.at[slot, 2], i, slot,
                       bm // 2, chalo, n_stripes)

        issue(0, 0)

        def body(i, _):
            slot = jax.lax.rem(i, 2)
            other = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < n_stripes)
            def _():
                if write_through:
                    @pl.when(i >= 1)
                    def _():
                        pltpu.make_async_copy(
                            us.at[other, pl.ds(halo, bm)],
                            out_hbm.at[pl.ds(0, bm)],
                            out_sems.at[other]).wait()
                issue(i + 1, other)

            _stripe_in_fresh("wait", u_hbm, us, in_sems.at[slot, 0], i,
                             slot, bm, halo, n_stripes)
            _stripe_in_fresh("wait", f_hbm, fs, in_sems.at[slot, 1], i,
                             slot, bm, halo, n_stripes)
            _stripe_in("wait", v_hbm, vs, in_sems.at[slot, 2], i, slot,
                       bm // 2, chalo, n_stripes)

            @pl.when(i + 1 < n_stripes)
            def _():
                us[other, pl.ds(0, 2 * halo)] = us[slot,
                                                   pl.ds(bm, 2 * halo)]
                fs[other, pl.ds(0, 2 * halo)] = fs[slot,
                                                   pl.ds(bm, 2 * halo)]

            is_first = i == 0
            is_last = i == n_stripes - 1
            pr, pb = _packed_prolong_stripe(vs[slot], kind, is_first,
                                            is_last, chalo, bm)
            lo = 2 * chalo - halo
            uv, fv = us[slot], fs[slot]
            fr, fb = fv[:, :w], fv[:, w:]
            xr = uv[:, :w] + pr[lo:lo + R_, :]
            xb = uv[:, w:] + pb[lo:lo + R_, :]
            mhq = jnp.asarray(-hsq * 0.25, dtype)
            xr, xb = _packed_core(xr, xb, fr * mhq, fb * mhq, nu,
                                  "ghost0", halo=halo, bm=bm,
                                  is_first=is_first, is_last=is_last)

            if rnorm:
                rows = jax.lax.broadcasted_iota(jnp.int32, (R_, 1), 0)
                er = (rows % 2) == 0
                r_r, r_b = _packed_residual(xr, xb, fr, fb, inv_hsq, er)
                rv = jnp.concatenate(
                    [r_r[halo:halo + bm, :], r_b[halo:halo + bm, :]],
                    axis=1).astype(jnp.float32)
                racc[:] = racc[:] + jnp.sum(rv * rv, axis=0,
                                            keepdims=True)

            if write_through:
                us[slot, pl.ds(halo, bm)] = jnp.concatenate(
                    [xr[halo:halo + bm, :], xb[halo:halo + bm, :]],
                    axis=1)
                pltpu.make_async_copy(
                    us.at[slot, pl.ds(halo, bm)],
                    out_hbm.at[pl.ds(pl.multiple_of(i * bm, 8), bm)],
                    out_sems.at[slot]).start()
            else:
                @pl.when(i >= 2)
                def _():
                    pltpu.make_async_copy(
                        outs.at[slot], out_hbm.at[pl.ds(0, bm)],
                        out_sems.at[slot]).wait()

                outs[slot] = jnp.concatenate(
                    [xr[halo:halo + bm, :], xb[halo:halo + bm, :]],
                    axis=1)
                pltpu.make_async_copy(
                    outs.at[slot],
                    out_hbm.at[pl.ds(pl.multiple_of(i * bm, 8), bm)],
                    out_sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, n_stripes, body, 0)

        for k in (n_stripes - 2, n_stripes - 1):
            slot = k % 2
            src = us.at[slot, pl.ds(halo, bm)] if write_through \
                else outs.at[slot]
            pltpu.make_async_copy(
                src, out_hbm.at[pl.ds(k * bm, bm)],
                out_sems.at[slot]).wait()

        if rnorm:
            rdma = pltpu.make_async_copy(racc, racc_hbm, r_sem)
            rdma.start()
            rdma.wait()

    out_shape = jax.ShapeDtypeStruct((n, n), dtype)
    scratch = [
        pltpu.VMEM((2, R_, n), dtype),        # packed u stripes
        pltpu.VMEM((2, R_, n), dtype),        # packed f stripes
        pltpu.VMEM((2, Rc, w), dtype),        # V coarse stripes
        pltpu.VMEM((2, bm, n), dtype),        # out stripes
    ]
    if write_through:
        del scratch[3]                         # no out stripes
    sems = [
        pltpu.SemaphoreType.DMA((2, 3)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if rnorm:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((1, n), jnp.float32))
        scratch = scratch + [pltpu.VMEM((1, n), jnp.float32)]
        sems = sems + [pltpu.SemaphoreType.DMA(())]
        out_specs = (pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pl.ANY))
    else:
        out_specs = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=out_specs,
        input_output_aliases=_alias(up),
        scratch_shapes=scratch + sems,
        compiler_params=_compiler_params(
            dtype.itemsize * (4 * R_ * n + 2 * Rc * w
                              + (0 if write_through else 2 * bm * n))),
        interpret=interpret,
    )(up, fp, V)


# --------------------- two-axis-blocked packed kernels ---------------
# At n >= 8192 one packed f32 row is >= 32 KB, so the full-width stripe
# plan bottoms out at thin stripes (bm=32 at 16384^2) whose 2*halo
# overlap is 50% redundant sweep rows — measured 1.45x the DMA floor
# where the 4096^2 striped kernels run at 1.01x.  These kernels block
# BOTH axes: per-COLOR windows of (bm + 2*hr rows, bcp + 256 packed
# lanes), four input streams (u, f x red, black), the lane halo at the
# 128-lane DMA granularity.  The sweep core is the same _packed_core
# (its hc>0 column-window path); restrict stays lane-trivial (coarse
# lane == packed lane) so Rc blocks write back directly.  No
# input-output aliasing: clipped halo re-reads would race an in-place
# drain (the unpacked wide kernels' stash machinery exists for exactly
# that; here a separate output costs capacity, not traffic).

_PACKED_WIDE_BUDGET = 19 * 1024 * 1024   # proven-compiling envelope:
# the striped bm=32@16384^2 geometry's ~18.9 MB of scratch compiles and
# runs (BENCH r5 config5); ~29 MB (bm=128@8192 striped) crashes Mosaic.


def packed_wide_plan(n: int, nu: int, itemsize: int):
    """(hr, bm, bcp) two-axis geometry for the packed kernels, or
    None.  bcp is in PACKED lanes (fine block = bm x 2*bcp).  f32 only
    (bf16 always has a wide-enough striped plan via the halved rows)."""
    if nu < 1 or nu > 3 or itemsize < 4:
        return None
    if n < 2 * _LANE_CHUNK or n % _LANE_CHUNK:
        return None
    w = n // 2
    hr = 8               # rbgs radius 2: 2*nu + 1 <= 7 < 8
    best = None
    for bm in (256, 128, 64):
        if n % bm:
            continue
        for bcp in (4096, 2048, 1024):
            if w % bcp or w // bcp < 2:
                continue
            R, Cp = bm + 2 * hr, bcp + 2 * _HC
            rr_bytes = itemsize * (4 * 2 * R * Cp + 2 * bm * 2 * bcp
                                   + 2 * (bm // 2) * bcp)
            pc_bytes = itemsize * (4 * 2 * R * Cp + 2 * bm * 2 * bcp
                                   + 2 * (bm // 2 + 16) * Cp)
            if max(rr_bytes, pc_bytes) > _PACKED_WIDE_BUDGET:
                continue
            util = (bm * bcp) / (R * Cp)
            if best is None or util > best[0]:
                best = (util, hr, bm, bcp)
    return None if best is None else best[1:]


def _pk_block_in(op, hbm, vref, sem, ir, ic, slot, bm, hr, nrs,
                 bcp, ncs, lane_off):
    """Two-axis clipped block DMA into a per-color window: rows
    [ir*bm - hr, ..+bm+hr) clipped, packed lanes [ic*bcp - 128,
    ..+bcp+128) clipped to the color plane [lane_off, lane_off +
    ncs*bcp)."""
    cases1 = [(c, lane_off + s, l, d)
              for (c, s, l, d) in _axis_cases(ic, bcp, _HC, ncs)]
    _block_in_cases(op, hbm, vref, sem, slot,
                    _axis_cases(ir, bm, hr, nrs), cases1,
                    _mult8, _mult128)


def _packed_prolong_block(vv, kind, is_first, is_last, cf, cl,
                          chalo, bm, bcp):
    """Windowed _packed_prolong_stripe: vv is a coarse V window of
    (bm/2 + 2*chalo, bcp + 2*_HC) — coarse lanes ARE packed lanes, so
    the lane halo is the DMA-granularity 128.  Returns (Pr, Pb) of
    (bm + 4*chalo, bcp + 2*_HC); edge weights apply only when the
    corresponding window flag marks a global boundary."""
    dtype = vv.dtype
    if kind == "bilinear" and dtype.itemsize < 4:
        pr, pb = _packed_prolong_block(vv.astype(jnp.float32), kind,
                                       is_first, is_last, cf, cl,
                                       chalo, bm, bcp)
        return pr.astype(dtype), pb.astype(dtype)
    v2 = jnp.repeat(vv, 2, axis=0)              # fine rows, packed lanes
    if kind == "inject":
        return v2, v2
    hcl = _HC
    rows = jax.lax.broadcasted_iota(jnp.int32, (v2.shape[0], 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, v2.shape[1]), 1)
    # zero outside-grid regions (clipped-DMA stale scratch or ghost)
    # before the shifts: 0-weight still propagates 0*garbage
    v2 = jnp.where(is_first & (rows < 2 * chalo), 0.0, v2)
    v2 = jnp.where(is_last & (rows >= bm + 2 * chalo), 0.0, v2)
    v2 = jnp.where(cf & (cols < hcl), 0.0, v2)
    v2 = jnp.where(cl & (cols >= hcl + bcp), 0.0, v2)
    # row blend (identical to the stripe form)
    zr2 = jnp.zeros_like(v2[:2, :])
    vm = jnp.concatenate([zr2, v2[:-2, :]], axis=0)
    vp = jnp.concatenate([v2[2:, :], zr2], axis=0)
    er = (rows % 2) == 0
    s0 = jnp.where(er, vm, vp)
    row_edge = ((is_first & (rows == 2 * chalo))
                | (is_last & (rows == bm + 2 * chalo - 1)))
    a0 = jnp.where(row_edge, jnp.asarray(0.5, dtype),
                   jnp.asarray(0.75, dtype))
    b0 = jnp.where(row_edge, jnp.asarray(0.0, dtype),
                   jnp.asarray(0.25, dtype))
    B = a0 * v2 + b0 * s0
    # lane blend per color; global edge columns live at local lanes
    # hcl / hcl + bcp - 1, active only on cf/cl windows
    zc = jnp.zeros_like(B[:, :1])
    bl = jnp.concatenate([zc, B[:, :-1]], axis=1)   # lane j-1
    br = jnp.concatenate([B[:, 1:], zc], axis=1)    # lane j+1
    half = jnp.asarray(0.5, dtype)
    a_in = jnp.asarray(0.75, dtype)
    b_in = jnp.asarray(0.25, dtype)
    c0i, c9i = hcl, hcl + bcp - 1

    def blend(red):
        s1 = jnp.where(er, bl, br) if red else jnp.where(er, br, bl)
        if red:
            edge = (cf & er & (cols == c0i)) | (cl & ~er & (cols == c9i))
        else:
            edge = (cf & ~er & (cols == c0i)) | (cl & er & (cols == c9i))
        a1 = jnp.where(edge, half, a_in)
        b1 = jnp.where(edge, jnp.asarray(0.0, dtype), b_in)
        return a1 * B + b1 * s1

    return blend(True), blend(False)


@functools.partial(
    jax.jit,
    static_argnames=("h", "nu", "interpret", "hr", "bm", "bcp"))
def _packed_rr_fused_wide(up, fp, *, h: float, nu: int, interpret: bool,
                          hr: int, bm: int, bcp: int):
    """Two-axis packed down-leg: nu rbgs sweeps + residual + 2x2
    restrict per (bm x 2*bcp)-cell block.  Returns (up', Rc) with Rc
    the UNPACKED (n/2, n/2) coarse rhs.  ghost0 only."""
    n = up.shape[0]
    w = n // 2
    dtype = up.dtype
    nrs, ncs = n // bm, w // bcp
    n_blocks = nrs * ncs
    assert nrs >= 1 and ncs >= 2 and bm % 16 == 0 and hr % 8 == 0
    R, Cp = bm + 2 * hr, bcp + 2 * _HC
    hsq = h * h
    inv_hsq = 1.0 / hsq

    def kernel(u_hbm, f_hbm, out_hbm, rout_hbm,
               urs, ubs, frs, fbs, outs, routs,
               in_sems, out_sems, rout_sems):
        def issue(b, slot):
            ir, ic = b // ncs, jax.lax.rem(b, ncs)
            _pk_block_in("start", u_hbm, urs, in_sems.at[slot, 0], ir,
                         ic, slot, bm, hr, nrs, bcp, ncs, 0)
            _pk_block_in("start", u_hbm, ubs, in_sems.at[slot, 1], ir,
                         ic, slot, bm, hr, nrs, bcp, ncs, w)
            _pk_block_in("start", f_hbm, frs, in_sems.at[slot, 2], ir,
                         ic, slot, bm, hr, nrs, bcp, ncs, 0)
            _pk_block_in("start", f_hbm, fbs, in_sems.at[slot, 3], ir,
                         ic, slot, bm, hr, nrs, bcp, ncs, w)

        issue(0, 0)

        def body(b, _):
            slot = jax.lax.rem(b, 2)
            ir, ic = b // ncs, jax.lax.rem(b, ncs)

            @pl.when(b + 1 < n_blocks)
            def _():
                issue(b + 1, jax.lax.rem(b + 1, 2))

            _pk_block_in("wait", u_hbm, urs, in_sems.at[slot, 0], ir,
                         ic, slot, bm, hr, nrs, bcp, ncs, 0)
            _pk_block_in("wait", u_hbm, ubs, in_sems.at[slot, 1], ir,
                         ic, slot, bm, hr, nrs, bcp, ncs, w)
            _pk_block_in("wait", f_hbm, frs, in_sems.at[slot, 2], ir,
                         ic, slot, bm, hr, nrs, bcp, ncs, 0)
            _pk_block_in("wait", f_hbm, fbs, in_sems.at[slot, 3], ir,
                         ic, slot, bm, hr, nrs, bcp, ncs, w)

            is_first = ir == 0
            is_last = ir == nrs - 1
            cf, cl = ic == 0, ic == ncs - 1
            xr, xb = urs[slot], ubs[slot]
            fr, fb_ = frs[slot], fbs[slot]
            mhq = jnp.asarray(-hsq * 0.25, dtype)
            xr, xb = _packed_core(xr, xb, fr * mhq, fb_ * mhq, nu,
                                  "ghost0", halo=hr, bm=bm,
                                  is_first=is_first, is_last=is_last,
                                  hc=2 * _HC, bcw=2 * bcp, cf=cf, cl=cl)
            rows = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
            er = (rows % 2) == 0
            r_r, r_b = _packed_residual(xr, xb, fr, fb_, inv_hsq, er)
            s = (r_r + r_b)[hr:hr + bm, _HC:_HC + bcp]
            Rv = s.reshape(bm // 2, 2, bcp).sum(axis=1) \
                * jnp.asarray(0.25, dtype)

            @pl.when(b >= 2)
            def _():
                for k in range(2):
                    pltpu.make_async_copy(
                        outs.at[slot, :, pl.ds(k * bcp, bcp)],
                        out_hbm.at[pl.ds(0, bm), pl.ds(0, bcp)],
                        out_sems.at[slot, k]).wait()
                pltpu.make_async_copy(
                    routs.at[slot],
                    rout_hbm.at[pl.ds(0, bm // 2), pl.ds(0, bcp)],
                    rout_sems.at[slot]).wait()

            outs[slot] = jnp.concatenate(
                [xr[hr:hr + bm, _HC:_HC + bcp],
                 xb[hr:hr + bm, _HC:_HC + bcp]], axis=1)
            for k, off in ((0, 0), (1, w)):
                pltpu.make_async_copy(
                    outs.at[slot, :, pl.ds(k * bcp, bcp)],
                    out_hbm.at[pl.ds(pl.multiple_of(ir * bm, 8), bm),
                               pl.ds(pl.multiple_of(off + ic * bcp,
                                                    128), bcp)],
                    out_sems.at[slot, k]).start()
            routs[slot] = Rv
            pltpu.make_async_copy(
                routs.at[slot],
                rout_hbm.at[pl.ds(pl.multiple_of(ir * (bm // 2), 8),
                                  bm // 2),
                            pl.ds(pl.multiple_of(ic * bcp, 128), bcp)],
                rout_sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, n_blocks, body, 0)

        for kb in (n_blocks - 2, n_blocks - 1):
            slot = kb % 2
            ir, ic = kb // ncs, kb % ncs
            for k in range(2):
                pltpu.make_async_copy(
                    outs.at[slot, :, pl.ds(k * bcp, bcp)],
                    out_hbm.at[pl.ds(ir * bm, bm),
                               pl.ds(k * w + ic * bcp, bcp)],
                    out_sems.at[slot, k]).wait()
            pltpu.make_async_copy(
                routs.at[slot],
                rout_hbm.at[pl.ds(ir * (bm // 2), bm // 2),
                            pl.ds(ic * bcp, bcp)],
                rout_sems.at[slot]).wait()

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((n, n), dtype),
                   jax.ShapeDtypeStruct((n // 2, n // 2), dtype)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, R, Cp), dtype),            # red u windows
            pltpu.VMEM((2, R, Cp), dtype),            # black u windows
            pltpu.VMEM((2, R, Cp), dtype),            # red f windows
            pltpu.VMEM((2, R, Cp), dtype),            # black f windows
            pltpu.VMEM((2, bm, 2 * bcp), dtype),      # out blocks
            pltpu.VMEM((2, bm // 2, bcp), dtype),     # Rc out blocks
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(up, fp)


@functools.partial(
    jax.jit,
    static_argnames=("h", "nu", "kind", "interpret", "hr", "bm", "bcp",
                     "rnorm"))
def _packed_pc_fused_wide(up, fp, V, *, h: float, nu: int, kind: str,
                          interpret: bool, hr: int, bm: int, bcp: int,
                          rnorm: bool = False):
    """Two-axis packed up-leg: u += P(V) + nu rbgs sweeps per block;
    V is the UNPACKED coarse correction (coarse lanes == packed
    lanes).  rnorm: also return a (1, 2*bcp) f32 row of lane-partial
    sums of the result's squared residual."""
    n = up.shape[0]
    w = n // 2
    dtype = up.dtype
    nrs, ncs = n // bm, w // bcp
    n_blocks = nrs * ncs
    assert nrs >= 1 and ncs >= 2 and bm % 16 == 0
    assert hr % 8 == 0 and hr <= 14
    R, Cp = bm + 2 * hr, bcp + 2 * _HC
    chalo = 8
    Rc = bm // 2 + 2 * chalo
    hsq = h * h
    inv_hsq = 1.0 / hsq

    def kernel(u_hbm, f_hbm, v_hbm, out_hbm, *rest):
        if rnorm:
            (racc_hbm, urs, ubs, frs, fbs, vs, outs, racc,
             in_sems, out_sems, r_sem) = rest
            racc[:] = jnp.zeros_like(racc)
        else:
            urs, ubs, frs, fbs, vs, outs, in_sems, out_sems = rest

        def issue(b, slot):
            ir, ic = b // ncs, jax.lax.rem(b, ncs)
            _pk_block_in("start", u_hbm, urs, in_sems.at[slot, 0], ir,
                         ic, slot, bm, hr, nrs, bcp, ncs, 0)
            _pk_block_in("start", u_hbm, ubs, in_sems.at[slot, 1], ir,
                         ic, slot, bm, hr, nrs, bcp, ncs, w)
            _pk_block_in("start", f_hbm, frs, in_sems.at[slot, 2], ir,
                         ic, slot, bm, hr, nrs, bcp, ncs, 0)
            _pk_block_in("start", f_hbm, fbs, in_sems.at[slot, 3], ir,
                         ic, slot, bm, hr, nrs, bcp, ncs, w)
            _pk_block_in("start", v_hbm, vs, in_sems.at[slot, 4], ir,
                         ic, slot, bm // 2, chalo, nrs, bcp, ncs, 0)

        issue(0, 0)

        def body(b, _):
            slot = jax.lax.rem(b, 2)
            ir, ic = b // ncs, jax.lax.rem(b, ncs)

            @pl.when(b + 1 < n_blocks)
            def _():
                issue(b + 1, jax.lax.rem(b + 1, 2))

            _pk_block_in("wait", u_hbm, urs, in_sems.at[slot, 0], ir,
                         ic, slot, bm, hr, nrs, bcp, ncs, 0)
            _pk_block_in("wait", u_hbm, ubs, in_sems.at[slot, 1], ir,
                         ic, slot, bm, hr, nrs, bcp, ncs, w)
            _pk_block_in("wait", f_hbm, frs, in_sems.at[slot, 2], ir,
                         ic, slot, bm, hr, nrs, bcp, ncs, 0)
            _pk_block_in("wait", f_hbm, fbs, in_sems.at[slot, 3], ir,
                         ic, slot, bm, hr, nrs, bcp, ncs, w)
            _pk_block_in("wait", v_hbm, vs, in_sems.at[slot, 4], ir,
                         ic, slot, bm // 2, chalo, nrs, bcp, ncs, 0)

            is_first = ir == 0
            is_last = ir == nrs - 1
            cf, cl = ic == 0, ic == ncs - 1
            pr, pb = _packed_prolong_block(vs[slot], kind, is_first,
                                           is_last, cf, cl, chalo, bm,
                                           bcp)
            lo = 2 * chalo - hr
            fr, fb_ = frs[slot], fbs[slot]
            xr = urs[slot] + pr[lo:lo + R, :]
            xb = ubs[slot] + pb[lo:lo + R, :]
            mhq = jnp.asarray(-hsq * 0.25, dtype)
            xr, xb = _packed_core(xr, xb, fr * mhq, fb_ * mhq, nu,
                                  "ghost0", halo=hr, bm=bm,
                                  is_first=is_first, is_last=is_last,
                                  hc=2 * _HC, bcw=2 * bcp, cf=cf, cl=cl)

            if rnorm:
                rows = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
                er = (rows % 2) == 0
                r_r, r_b = _packed_residual(xr, xb, fr, fb_, inv_hsq,
                                            er)
                rv = jnp.concatenate(
                    [r_r[hr:hr + bm, _HC:_HC + bcp],
                     r_b[hr:hr + bm, _HC:_HC + bcp]],
                    axis=1).astype(jnp.float32)
                racc[:] = racc[:] + jnp.sum(rv * rv, axis=0,
                                            keepdims=True)

            @pl.when(b >= 2)
            def _():
                for k in range(2):
                    pltpu.make_async_copy(
                        outs.at[slot, :, pl.ds(k * bcp, bcp)],
                        out_hbm.at[pl.ds(0, bm), pl.ds(0, bcp)],
                        out_sems.at[slot, k]).wait()

            outs[slot] = jnp.concatenate(
                [xr[hr:hr + bm, _HC:_HC + bcp],
                 xb[hr:hr + bm, _HC:_HC + bcp]], axis=1)
            for k, off in ((0, 0), (1, w)):
                pltpu.make_async_copy(
                    outs.at[slot, :, pl.ds(k * bcp, bcp)],
                    out_hbm.at[pl.ds(pl.multiple_of(ir * bm, 8), bm),
                               pl.ds(pl.multiple_of(off + ic * bcp,
                                                    128), bcp)],
                    out_sems.at[slot, k]).start()
            return 0

        jax.lax.fori_loop(0, n_blocks, body, 0)

        for kb in (n_blocks - 2, n_blocks - 1):
            slot = kb % 2
            ir, ic = kb // ncs, kb % ncs
            for k in range(2):
                pltpu.make_async_copy(
                    outs.at[slot, :, pl.ds(k * bcp, bcp)],
                    out_hbm.at[pl.ds(ir * bm, bm),
                               pl.ds(k * w + ic * bcp, bcp)],
                    out_sems.at[slot, k]).wait()

        if rnorm:
            rdma = pltpu.make_async_copy(racc, racc_hbm, r_sem)
            rdma.start()
            rdma.wait()

    out_shape = jax.ShapeDtypeStruct((n, n), dtype)
    scratch = [
        pltpu.VMEM((2, R, Cp), dtype),        # red u windows
        pltpu.VMEM((2, R, Cp), dtype),        # black u windows
        pltpu.VMEM((2, R, Cp), dtype),        # red f windows
        pltpu.VMEM((2, R, Cp), dtype),        # black f windows
        pltpu.VMEM((2, Rc, Cp), dtype),       # V coarse windows
        pltpu.VMEM((2, bm, 2 * bcp), dtype),  # out blocks
    ]
    sems = [
        pltpu.SemaphoreType.DMA((2, 5)),
        pltpu.SemaphoreType.DMA((2, 2)),
    ]
    if rnorm:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((1, 2 * bcp), jnp.float32))
        scratch = scratch + [pltpu.VMEM((1, 2 * bcp), jnp.float32)]
        sems = sems + [pltpu.SemaphoreType.DMA(())]
        out_specs = (pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pl.ANY))
    else:
        out_specs = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=out_specs,
        scratch_shapes=scratch + sems,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(up, fp, V)


# Write-through striped census: dropping the out stripes (drain from
# the input buffer) frees 2*bm full-width rows, admitting 2x the
# stripe at the sizes where the plain census bottoms out.  The budget
# is the proven-compiling envelope (see _PACKED_WIDE_BUDGET): the
# bm=64@16384^2 write-through geometry is ~24 MB of scratch.
_PACKED_WT_BUDGET = 25 * 1024 * 1024


def packed_plan_wt(n: int, nu: int, itemsize: int):
    """(halo, bm) for the write-through striped packed kernels, or
    None.  Only returned by packed_plan_any when it beats the plain
    striped bm (the write-through drain adds one pipeline wait, worth
    it only for the stripe-width doubling)."""
    if nu < 1 or nu > 3 or n < _LANE_CHUNK or n % _LANE_CHUNK:
        return None
    halo = -(-(2 * nu + 1) // 8) * 8
    cap = (_BF16_RBGS_MAX_BM if itemsize < 4 else n)
    bm = min(n // 2, cap)
    while bm > 2 * halo:
        if n % bm == 0 and bm % 16 == 0:
            both = itemsize * (4 * (bm + 2 * halo) * n
                               + 2 * (bm // 2 + 16) * (n // 2))
            if both <= _PACKED_WT_BUDGET:
                return halo, bm
        bm //= 2
    return None


def packed_plan_any(n: int, nu: int, itemsize: int):
    """Dispatch plan for the packed entry points:
    ('striped', halo, bm[, write_through]) | ('wide', hr, (bm, bcp)) |
    None.  Preference order, from on-device measurement (v5e, f32,
    16384^2): plain stripes while they stay wide (bm >= 16*halo:
    <= ~12.5% redundant rows), then WRITE-THROUGH stripes at 2x bm
    (the freed out-buffer VMEM halves the overlap fraction), then thin
    plain stripes, then the two-axis blocks — which measured 2.1x the
    DMA floor (per-block overhead of 7-10 strided-window DMA
    descriptors vs the stripe pipeline's contiguous transfers) and
    exist to EXTEND coverage past the striped VMEM ceiling
    (n >= 32768 f32), not to win under it."""
    p = packed_plan(n, nu, itemsize)
    if p is not None:
        # Write-through at 2x bm measured SLOWER than thin plain
        # stripes (16384^2 f32: wt bm=64 rr 5.73 ms vs plain bm=32
        # 5.35 — the drain-before-reload serialization costs more than
        # the halved row redundancy saves), so it never auto-engages;
        # packed_plan_wt + the write_through kernel variant stay for
        # the record (MGPOISSON_PACKED_WT=1 to force, for re-tuning on
        # future hardware).
        if os.environ.get("MGPOISSON_PACKED_WT") == "1":
            pw = packed_plan_wt(n, nu, itemsize)
            if pw is not None and pw[1] > p[1]:
                return ("striped", pw[0], pw[1], True)
        return ("striped", p[0], p[1], False)
    pwide = packed_wide_plan(n, nu, itemsize)
    if pwide is not None:
        return ("wide", pwide[0], (pwide[1], pwide[2]))
    return None


def packed_smooth_residual_restrict(up, fp, h, nu):
    """Packed-persistent down-leg.  Caller guarantees packed_plan_any
    is not None (mgpoisson.cycle.packed gates support)."""
    plan = packed_plan_any(up.shape[0], nu,
                           jnp.dtype(up.dtype).itemsize)
    if plan[0] == "wide":
        hr, (bm, bcp) = plan[1], plan[2]
        return _packed_rr_fused_wide(up, fp, h=float(h), nu=nu,
                                     interpret=_interpret(), hr=hr,
                                     bm=bm, bcp=bcp)
    _, halo, bm, wt = plan
    return _packed_rr_fused(up, fp, h=float(h), nu=nu,
                            interpret=_interpret(), halo=halo, bm=bm,
                            write_through=wt)


def packed_prolong_correct_smooth(up, fp, V, h, nu, kind="inject"):
    """Packed-persistent up-leg."""
    plan = packed_plan_any(up.shape[0], nu,
                           jnp.dtype(up.dtype).itemsize)
    if plan[0] == "wide":
        hr, (bm, bcp) = plan[1], plan[2]
        return _packed_pc_fused_wide(up, fp, V, h=float(h), nu=nu,
                                     kind=kind, interpret=_interpret(),
                                     hr=hr, bm=bm, bcp=bcp)
    _, halo, bm, wt = plan
    return _packed_pc_fused(up, fp, V, h=float(h), nu=nu, kind=kind,
                            interpret=_interpret(), halo=halo, bm=bm,
                            write_through=wt)


def packed_prolong_correct_smooth_rnorm(up, fp, V, h, nu,
                                        kind="inject"):
    """Packed-persistent up-leg + fused sum(r^2) of the result."""
    plan = packed_plan_any(up.shape[0], nu,
                           jnp.dtype(up.dtype).itemsize)
    if plan[0] == "wide":
        hr, (bm, bcp) = plan[1], plan[2]
        u2, racc = _packed_pc_fused_wide(up, fp, V, h=float(h), nu=nu,
                                         kind=kind,
                                         interpret=_interpret(), hr=hr,
                                         bm=bm, bcp=bcp, rnorm=True)
        return u2, jnp.sum(racc)
    _, halo, bm, wt = plan
    u2, racc = _packed_pc_fused(up, fp, V, h=float(h), nu=nu, kind=kind,
                                interpret=_interpret(), halo=halo,
                                bm=bm, rnorm=True, write_through=wt)
    return u2, jnp.sum(racc)


# =====================================================================
# sharded (per-shard) fused half-level kernels
# =====================================================================
# The shard_map SPMD path (mgpoisson.shard.spmd) hands each device its
# local block plus ppermute-exchanged HALO STRIPS:
#   top/bottom: (h8, ml)            — body columns of the row neighbor
#   left/right: (nl + 2*h8, _HC)    — column neighbor INCLUDING the
#                                     diagonal corners (chained permute)
# These kernels run the fused smooth+residual+restrict / prolong+
# correct+smooth half-levels on (body, strips) directly — the strips
# are never concatenated into an extended array in HBM (that would be
# an extra full round trip).  Each row stripe's VMEM window
# (bm + 2*h8, _HC + ml + _HC) is assembled by 3-5 disjoint DMAs (left
# strip, right strip, clipped body, top/bottom strip head/tail), and
# the compute is the existing _sweeps_wide with TRACED edge flags:
# a device whose shard touches the global boundary applies the real
# per-sweep bc fixups there, an interior device lets the strip region
# degrade one ring per sweep — the same deep-halo trapezoid, composed
# across devices.  Exchange depth == the kernel's 8-aligned stripe halo
# h8, so every DMA offset stays (8,128)-aligned and no clipping case
# reads outside a strip.
#
# Reference bar: the fine-level kernels ARE the hot path
# (`gpu.lua:286-346`); this makes the single-chip fused-kernel win
# apply per shard under the explicit partition (BASELINE config 5).


def sharded_plan(shape, nu, smoother, dtype, composite=True,
                 col_nbrs=True):
    """(h8, bm) stripe geometry for the strip kernels, or None.

    shape: the LOCAL block (nl, ml).  h8 is both the in-kernel stripe
    halo and the strip exchange depth the caller must use.

    col_nbrs=False: the mesh has a single device column, so the
    kernels compile WITHOUT the 128-lane column strips/window — column
    BCs are value-edge inline (the unsharded stripe scheme).  The
    caller then passes (top, bot, None, None) strips."""
    if len(shape) != 2 or nu < 1:
        return None
    if smoother not in ("jacobi", "wjacobi", "rbgs"):
        return None
    if jnp.dtype(dtype) not in (jnp.float32, jnp.bfloat16):
        return None
    nl, ml = shape
    if nl < 64 or ml < 256 or ml % 256 or nl % 16:
        return None
    radius = 2 if smoother == "rbgs" else 1
    need = radius * nu + (1 if composite else 0)
    h8 = -(-need // 8) * 8
    if h8 > 14:        # coarse-halo fine coverage (16) must exceed h8+2
        return None
    itemsize = jnp.dtype(dtype).itemsize
    hc = _HC if col_nbrs else 0
    C = ml + 2 * hc
    bm = nl
    best = None
    cap = (_BF16_RBGS_MAX_BM
           if itemsize < 4 and smoother == "rbgs" else nl)
    while bm >= 16:
        if (nl % bm == 0 and nl // bm >= 2 and bm % 16 == 0
                and bm >= h8 and bm <= cap):
            vmem = itemsize * (4 * (bm + 2 * h8) * C + 2 * bm * ml
                               + 2 * (bm // 2) * (ml // 2)
                               + 2 * (bm // 2 + 16) * (ml // 2 + 2 * hc))
            if vmem <= _VMEM_BUDGET:
                best = (h8, bm)
                break
        bm //= 2
    return best


def _strip_stripe_in(op, body, top, bot, left, right, vref, sems, i,
                     slot, bm, h8, n_str, ml):
    """Start/wait the 3-5 DMAs assembling stripe i of (body + strips)
    into vref[slot] of shape (bm + 2*h8, CH + ml + CH), CH = _HC, or
    (bm + 2*h8, ml) when left/right are None (single-device-column
    meshes compile without the column strips/window).  sems has a
    leading dim of 5 (left, right, body, head, tail)."""
    R = bm + 2 * h8
    CH = _HC if left is not None else 0

    def dma(src, rows_dst, cols_dst, sem):
        getattr(pltpu.make_async_copy(
            src, vref.at[slot, rows_dst, cols_dst], sem), op)()

    if left is not None:
        # left/right strips: rows [i*bm, i*bm + R) — always in range
        dma(left.at[pl.ds(_mult8(i * bm), R)],
            pl.ds(0, R), pl.ds(0, CH), sems.at[slot, 0])
        dma(right.at[pl.ds(_mult8(i * bm), R)],
            pl.ds(0, R), pl.ds(CH + ml, CH), sems.at[slot, 1])

    # clipped body window [i*bm - h8, i*bm + bm + h8)
    @pl.when(i == 0)
    def _():
        dma(body.at[pl.ds(0, R - h8)],
            pl.ds(h8, R - h8), pl.ds(CH, ml), sems.at[slot, 2])

    @pl.when((i > 0) & (i < n_str - 1))
    def _():
        dma(body.at[pl.ds(_mult8(i * bm - h8), R)],
            pl.ds(0, R), pl.ds(CH, ml), sems.at[slot, 2])

    @pl.when(i == n_str - 1)
    def _():
        dma(body.at[pl.ds(_mult8(i * bm - h8), R - h8)],
            pl.ds(0, R - h8), pl.ds(CH, ml), sems.at[slot, 2])

    # head/tail rows from the row-neighbor strips (real neighbor data
    # or the collective's zero fill at global edges — never stale)
    @pl.when(i == 0)
    def _():
        dma(top.at[pl.ds(0, h8)],
            pl.ds(0, h8), pl.ds(CH, ml), sems.at[slot, 3])

    @pl.when(i == n_str - 1)
    def _():
        dma(bot.at[pl.ds(0, h8)],
            pl.ds(R - h8, h8), pl.ds(CH, ml), sems.at[slot, 4])


@functools.partial(
    jax.jit,
    static_argnames=("h", "nu", "smoother", "bc", "interpret", "h8",
                     "bm", "cols"))
def _rr_sharded(u, f, ut, ub, ul, ur, ft, fb, fl, fr, flags, pmat_in,
                *, h: float, nu: int, smoother: str, bc: str,
                interpret: bool, h8: int, bm: int, cols: bool = True):
    """Per-shard fused pre-smooth x nu + residual + restrict on a local
    block with pre-exchanged halo strips.  Returns (u_center, R).

    cols=False (ul/ur/fl/fr are None): single-device-column mesh — no
    column strips, no 128-lane window padding, value-edge column BC
    inline (the unsharded stripe scheme); only the row strips differ
    from the unsharded composite, so a (N,1) mesh pays ~nothing over
    the single-chip kernel."""
    nl, ml = u.shape
    dtype = u.dtype
    CH = _HC if cols else 0
    n_str = nl // bm
    R, C = bm + 2 * h8, ml + 2 * CH
    hsq = h * h
    inv_hsq = 1.0 / hsq

    def kernel(*args):
        if cols:
            (u_hbm, f_hbm, ut_h, ub_h, ul_h, ur_h, ft_h, fb_h, fl_h,
             fr_h, flags_ref, p_hbm, out_hbm, rout_hbm,
             us, fs, pv, outs, routs, in_sems, out_sems, rout_sems,
             p_sem) = args
        else:
            (u_hbm, f_hbm, ut_h, ub_h, ft_h, fb_h, flags_ref, p_hbm,
             out_hbm, rout_hbm,
             us, fs, pv, outs, routs, in_sems, out_sems, rout_sems,
             p_sem) = args
            ul_h = ur_h = fl_h = fr_h = None
        rf_dev = flags_ref[0] == 1
        rl_dev = flags_ref[1] == 1
        cf_dev = flags_ref[2] == 1
        cl_dev = flags_ref[3] == 1

        pdma = pltpu.make_async_copy(p_hbm, pv, p_sem)
        pdma.start()

        def issue(i, slot):
            _strip_stripe_in("start", u_hbm, ut_h, ub_h, ul_h, ur_h, us,
                             in_sems.at[0], i, slot, bm, h8, n_str, ml)
            _strip_stripe_in("start", f_hbm, ft_h, fb_h, fl_h, fr_h, fs,
                             in_sems.at[1], i, slot, bm, h8, n_str, ml)

        issue(0, 0)
        pdma.wait()

        def body(i, _):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_str)
            def _():
                issue(i + 1, jax.lax.rem(i + 1, 2))

            _strip_stripe_in("wait", u_hbm, ut_h, ub_h, ul_h, ur_h, us,
                             in_sems.at[0], i, slot, bm, h8, n_str, ml)
            _strip_stripe_in("wait", f_hbm, ft_h, fb_h, fl_h, fr_h, fs,
                             in_sems.at[1], i, slot, bm, h8, n_str, ml)

            rf = (i == 0) & rf_dev
            rl = (i == n_str - 1) & rl_dev
            if cols:
                uv = _sweeps_wide(us[slot], fs[slot], nu, smoother, bc,
                                  hsq, h8, bm, CH, ml, rf, rl, cf_dev,
                                  cl_dev)
                # ghosts must hold boundary data for the residual reads
                uv = _apply_row_bc(uv, bc, rf, rl, h8 - 1, h8 + bm)
                uv = _apply_col_bc(uv, bc, cf_dev, cl_dev, CH - 1,
                                   CH + ml)
                nbr_uv = _nbr_plain(uv)
            else:
                uv = _sweeps(us[slot], fs[slot], nu, smoother, bc, hsq,
                             0.0, h8, bm, rf, rl)
                uv = _apply_row_bc(uv, bc, rf, rl, h8 - 1, h8 + bm)
                nbr_uv = _nbr(uv, bc)

            rv_full = fs[slot] - (nbr_uv - 4.0 * uv) \
                * jnp.asarray(inv_hsq, dtype)
            rv = rv_full[h8:h8 + bm, CH:CH + ml]
            s = rv.reshape(bm // 2, 2, ml).sum(axis=1)
            Rv = _lane_halve(s, pv[:]) * jnp.asarray(0.25, dtype)

            @pl.when(i >= 2)
            def _():
                pltpu.make_async_copy(
                    outs.at[slot], out_hbm.at[pl.ds(0, bm)],
                    out_sems.at[slot]).wait()
                pltpu.make_async_copy(
                    routs.at[slot], rout_hbm.at[pl.ds(0, bm // 2)],
                    rout_sems.at[slot]).wait()

            outs[slot] = uv[h8:h8 + bm, CH:CH + ml]
            pltpu.make_async_copy(
                outs.at[slot],
                out_hbm.at[pl.ds(pl.multiple_of(i * bm, 8), bm)],
                out_sems.at[slot]).start()
            routs[slot] = Rv
            pltpu.make_async_copy(
                routs.at[slot],
                rout_hbm.at[pl.ds(pl.multiple_of(i * (bm // 2), 8),
                                  bm // 2)],
                rout_sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, n_str, body, 0)

        for k in (n_str - 2, n_str - 1):
            slot = k % 2
            pltpu.make_async_copy(
                outs.at[slot], out_hbm.at[pl.ds(k * bm, bm)],
                out_sems.at[slot]).wait()
            pltpu.make_async_copy(
                routs.at[slot],
                rout_hbm.at[pl.ds(k * (bm // 2), bm // 2)],
                rout_sems.at[slot]).wait()

    operands = (u, f, ut, ub, ul, ur, ft, fb, fl, fr) if cols \
        else (u, f, ut, ub, ft, fb)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((nl, ml), dtype),
                   jax.ShapeDtypeStruct((nl // 2, ml // 2), dtype)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(operands)
        + [pl.BlockSpec(memory_space=pltpu.SMEM),
           pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, R, C), dtype),
            pltpu.VMEM((2, R, C), dtype),
            pltpu.VMEM(_halve_mat(ml, dtype).shape, dtype),
            pltpu.VMEM((2, bm, ml), dtype),
            pltpu.VMEM((2, bm // 2, ml // 2), dtype),
            pltpu.SemaphoreType.DMA((2, 2, 5)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*operands, flags, pmat_in)


@functools.partial(
    jax.jit,
    static_argnames=("h", "nu", "smoother", "bc", "kind", "interpret",
                     "h8", "bm", "rnorm", "cols"))
def _pc_sharded(u, f, V, ut, ub, ul, ur, ft, fb, fl, fr, vt, vb, vl, vr,
                flags, emat_in, *, h: float, nu: int, smoother: str,
                bc: str, kind: str, interpret: bool, h8: int, bm: int,
                rnorm: bool = False, cols: bool = True):
    """Per-shard fused u += P(V) + post-smooth x nu with pre-exchanged
    strips for u, f (fine, depth h8) and V (coarse, depth 8).

    rnorm: additionally return a (1, ml) f32 row of column-partial
    sums of the LOCAL result's squared residual — the sharded twin of
    _pc_smooth_fused's free residual stopping (psum the row's sum over
    the mesh for the global ||r||^2).  The composite exchange depth
    h8 = radius*nu + 1 keeps one exact halo ring after the sweeps for
    the residual's neighbor reads, in rows AND columns (CH=128 >> h8).
    """
    nl, ml = u.shape
    dtype = u.dtype
    CH = _HC if cols else 0
    n_str = nl // bm
    R, C = bm + 2 * h8, ml + 2 * CH
    chalo, CHc = 8, (_HC if cols else 0)
    Rc = bm // 2 + 2 * chalo
    hsq = h * h
    inv_hsq = 1.0 / hsq
    assert h8 <= 14, "coarse halo of 8 covers fine halo + bilinear shift"

    def kernel(*args):
        if cols:
            (u_hbm, f_hbm, v_hbm, ut_h, ub_h, ul_h, ur_h, ft_h, fb_h,
             fl_h, fr_h, vt_h, vb_h, vl_h, vr_h, flags_ref, e_hbm,
             out_hbm, *rest) = args
        else:
            (u_hbm, f_hbm, v_hbm, ut_h, ub_h, ft_h, fb_h, vt_h, vb_h,
             flags_ref, e_hbm, out_hbm, *rest) = args
            ul_h = ur_h = fl_h = fr_h = vl_h = vr_h = None
        if rnorm:
            (racc_hbm, us, fs, vs, ev, outs, racc,
             in_sems, out_sems, e_sem, r_sem) = rest
            racc[:] = jnp.zeros_like(racc)
        else:
            us, fs, vs, ev, outs, in_sems, out_sems, e_sem = rest
        rf_dev = flags_ref[0] == 1
        rl_dev = flags_ref[1] == 1
        # cols=False => a single device column: every device holds both
        # global column edges (static, lets the fixups constant-fold)
        cf_dev = flags_ref[2] == 1 if cols else True
        cl_dev = flags_ref[3] == 1 if cols else True

        edma = pltpu.make_async_copy(e_hbm, ev, e_sem)
        edma.start()

        def issue(i, slot):
            _strip_stripe_in("start", u_hbm, ut_h, ub_h, ul_h, ur_h, us,
                             in_sems.at[0], i, slot, bm, h8, n_str, ml)
            _strip_stripe_in("start", f_hbm, ft_h, fb_h, fl_h, fr_h, fs,
                             in_sems.at[1], i, slot, bm, h8, n_str, ml)
            _strip_stripe_in("start", v_hbm, vt_h, vb_h, vl_h, vr_h, vs,
                             in_sems.at[2], i, slot, bm // 2, chalo,
                             n_str, ml // 2)

        issue(0, 0)
        edma.wait()

        def body(i, _):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_str)
            def _():
                issue(i + 1, jax.lax.rem(i + 1, 2))

            _strip_stripe_in("wait", u_hbm, ut_h, ub_h, ul_h, ur_h, us,
                             in_sems.at[0], i, slot, bm, h8, n_str, ml)
            _strip_stripe_in("wait", f_hbm, ft_h, fb_h, fl_h, fr_h, fs,
                             in_sems.at[1], i, slot, bm, h8, n_str, ml)
            _strip_stripe_in("wait", v_hbm, vt_h, vb_h, vl_h, vr_h, vs,
                             in_sems.at[2], i, slot, bm // 2, chalo,
                             n_str, ml // 2)

            rf = (i == 0) & rf_dev
            rl = (i == n_str - 1) & rl_dev
            # expand the coarse stripe: rows x2 (sublane repeat), lanes
            # x2 on the MXU; coarse window starts at fine row
            # i*bm - 2*chalo, fine col -2*CHc
            v2 = jnp.repeat(vs[slot], 2, axis=0)      # (bm + 4*chalo, ..)
            vf = _lane_double(v2, ev[:])              # (.., ml + 4*CHc)
            if kind == "bilinear":
                # zero anything outside the grid before the blend: at
                # global edges the strip data is the collective's zero
                # fill already, but the +-2 shift must see hard zeros
                ridx = jax.lax.broadcasted_iota(jnp.int32,
                                                (vf.shape[0], 1), 0)
                cidx = jax.lax.broadcasted_iota(jnp.int32,
                                                (1, vf.shape[1]), 1)
                vf = jnp.where(rf & (ridx < 2 * chalo), 0.0, vf)
                vf = jnp.where(rl & (ridx >= bm + 2 * chalo), 0.0, vf)
                vf = jnp.where(cf_dev & (cidx < 2 * CHc), 0.0, vf)
                vf = jnp.where(cl_dev & (cidx >= ml + 2 * CHc), 0.0, vf)
                vf = _bilinear_blend_2d(
                    vf, 2 * chalo, bm + 2 * chalo - 1, rf, rl,
                    vf.shape[1], left_col=2 * CHc,
                    right_col=ml + 2 * CHc - 1, cf=cf_dev, cl=cl_dev)
            # slice to the u stripe's window (rows i*bm - h8, cols -CH)
            vf = vf[2 * chalo - h8:2 * chalo - h8 + R,
                    2 * CHc - CH:2 * CHc - CH + C]

            uv = us[slot] + vf
            if cols:
                uv = _sweeps_wide(uv, fs[slot], nu, smoother, bc, hsq,
                                  h8, bm, CH, ml, rf, rl, cf_dev,
                                  cl_dev)
            else:
                uv = _sweeps(uv, fs[slot], nu, smoother, bc, hsq, 0.0,
                             h8, bm, rf, rl)

            if rnorm:
                # ghosts must hold boundary data for the residual
                # reads (the final sweep leaves them stale)
                uvb = _apply_row_bc(uv, bc, rf, rl, h8 - 1, h8 + bm)
                if cols:
                    uvb = _apply_col_bc(uvb, bc, cf_dev, cl_dev,
                                        CH - 1, CH + ml)
                    nbr_uvb = _nbr_plain(uvb)
                else:
                    nbr_uvb = _nbr(uvb, bc)
                rv = (fs[slot] - (nbr_uvb - 4.0 * uvb)
                      * jnp.asarray(inv_hsq, dtype))[h8:h8 + bm,
                                                     CH:CH + ml]
                rv = rv.astype(jnp.float32)
                racc[:] = racc[:] + jnp.sum(rv * rv, axis=0,
                                            keepdims=True)

            @pl.when(i >= 2)
            def _():
                pltpu.make_async_copy(
                    outs.at[slot], out_hbm.at[pl.ds(0, bm)],
                    out_sems.at[slot]).wait()

            outs[slot] = uv[h8:h8 + bm, CH:CH + ml]
            pltpu.make_async_copy(
                outs.at[slot],
                out_hbm.at[pl.ds(pl.multiple_of(i * bm, 8), bm)],
                out_sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, n_str, body, 0)

        for k in (n_str - 2, n_str - 1):
            slot = k % 2
            pltpu.make_async_copy(
                outs.at[slot], out_hbm.at[pl.ds(k * bm, bm)],
                out_sems.at[slot]).wait()

        if rnorm:
            rdma = pltpu.make_async_copy(racc, racc_hbm, r_sem)
            rdma.start()
            rdma.wait()

    out_shape = jax.ShapeDtypeStruct((nl, ml), dtype)
    scratch = [
        pltpu.VMEM((2, R, C), dtype),
        pltpu.VMEM((2, R, C), dtype),
        pltpu.VMEM((2, Rc, ml // 2 + 2 * CHc), dtype),
        pltpu.VMEM(_double_mat(ml, dtype).shape, dtype),
        pltpu.VMEM((2, bm, ml), dtype),
    ]
    sems = [
        pltpu.SemaphoreType.DMA((3, 2, 5)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA(()),
    ]
    if rnorm:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((1, ml), jnp.float32))
        scratch = scratch + [pltpu.VMEM((1, ml), jnp.float32)]
        sems = sems + [pltpu.SemaphoreType.DMA(())]
    operands = (u, f, V, ut, ub, ul, ur, ft, fb, fl, fr, vt, vb, vl,
                vr) if cols else (u, f, V, ut, ub, ft, fb, vt, vb)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(operands)
        + [pl.BlockSpec(memory_space=pltpu.SMEM),
           pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),) * 2 if rnorm
        else pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch + sems,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*operands, flags, emat_in)


def smooth_rr_sharded(u, f, ustrips, fstrips, flags, h, nu,
                      smoother="jacobi", bc="ghost0", *, plan):
    """Per-shard fused pre-smooth + residual + restrict (see the
    section comment).  ustrips/fstrips = (top, bottom, left_full,
    right_full) at exchange depth plan[0]; flags = (4,) int32
    [row_first, row_last, col_first, col_last].  left/right of None
    (single-device-column mesh) compile without the column window."""
    h8, bm = plan
    pmat = _halve_mat(u.shape[1], u.dtype)
    return _rr_sharded(u, f, *ustrips, *fstrips, flags, pmat,
                       h=float(h), nu=nu, smoother=smoother, bc=bc,
                       interpret=_interpret(), h8=h8, bm=bm,
                       cols=ustrips[2] is not None)


def pc_smooth_sharded(u, f, V, ustrips, fstrips, vstrips, flags, h, nu,
                      smoother="jacobi", bc="ghost0", kind="inject",
                      *, plan, rnorm=False):
    """Per-shard fused prolong + correct + post-smooth.  vstrips are
    exchanged on the COARSE grid at depth 8 (rows) / 128 (cols).
    rnorm=True also returns the (1, ml) f32 local residual-square
    partial row (free stop='residual' under the explicit partition)."""
    h8, bm = plan
    emat = _double_mat(u.shape[1], u.dtype)
    return _pc_sharded(u, f, V, *ustrips, *fstrips, *vstrips, flags,
                       emat, h=float(h), nu=nu, smoother=smoother,
                       bc=bc, kind=kind, interpret=_interpret(), h8=h8,
                       bm=bm, rnorm=rnorm,
                       cols=ustrips[2] is not None)


# ---------------------------------------------------------------------
# packed-persistent per-shard strip kernels (row-sharded meshes)
# ---------------------------------------------------------------------
# The packed-persistent fine level (section above) composed with the
# explicit shard_map partition (VERDICT r4 item 4: the fast path must
# survive distribution — the hybrid's lesson, `cpu-gpu.lua:17-52`).
# Key fact: pack_grid is ROW-PRESERVING and lane-local, so on a row-
# sharded (N, 1) mesh — the natural ICI ring — a globally packed array
# IS a per-shard packed array, and the halo strips are plain 8-deep
# row strips of the PACKED local block, exchanged with the same
# ppermute as the unpacked path.  Column-sharded meshes (y > 1) keep
# the unpacked strip kernels: the packed striped core has no column
# window machinery.
#
# The kernels below are the packed twins of _rr_sharded/_pc_sharded
# (strip-fed DMA assembly, device edge flags in SMEM) running the
# _packed_core sweep loop of _packed_rr_fused/_packed_pc_fused.


def packed_sharded_plan(shape, nu, itemsize):
    """(halo, bm) stripe geometry for the packed strip kernels on a
    LOCAL packed block (nl, ml) — ml is the GLOBAL packed width
    (row-sharded mesh; the left ml/2 lanes are the red plane) — or
    None.  f32-only and rbgs-only like packed_plan; halo is both the
    in-kernel stripe halo and the strip exchange depth."""
    if len(shape) != 2 or nu < 1 or nu > 3 or itemsize < 4:
        return None
    nl, ml = shape
    if ml < _LANE_CHUNK or ml % _LANE_CHUNK or ml % 2:
        return None
    if nl < 32 or nl % 16:
        return None
    halo = 8           # rbgs radius 2: 2*nu + 1 <= 7 < 8
    bm = nl
    while bm >= 16:
        if nl % bm == 0 and nl // bm >= 2 and bm % 16 == 0 \
                and bm >= halo:
            vmem = itemsize * (4 * (bm + 2 * halo) * ml   # u, f stripes
                               + 2 * bm * ml              # out stripes
                               + 2 * (bm // 2) * (ml // 2)       # routs
                               + 2 * (bm // 2 + 16) * (ml // 2))  # V (pc)
            if vmem <= _VMEM_BUDGET:
                return halo, bm
        bm //= 2
    return None


@functools.partial(
    jax.jit,
    static_argnames=("h", "nu", "interpret", "halo", "bm"))
def _packed_rr_sharded(up, fp, ut, ub, ft, fb, flags, *, h: float,
                       nu: int, interpret: bool, halo: int, bm: int):
    """Per-shard packed down-leg: nu rbgs sweeps + residual + restrict
    on a LOCAL packed block with pre-exchanged halo strips.  Returns
    (up', Rc) with Rc the UNPACKED local coarse rhs.  ghost0 only (the
    fine level's bc).  Strip rows hold real neighbor data (or the
    collective's zero fill at global edges); the in-kernel bc fixups
    gate on the device edge flags, so interior devices let the strip
    region degrade one ring per sweep — the cross-device deep-halo
    trapezoid, in the packed layout."""
    nl, ml = up.shape
    w = ml // 2
    dtype = up.dtype
    n_str = nl // bm
    assert n_str >= 2 and bm >= halo and bm % 16 == 0 and halo % 8 == 0
    R_ = bm + 2 * halo
    hsq = h * h
    inv_hsq = 1.0 / hsq

    def kernel(u_hbm, f_hbm, ut_h, ub_h, ft_h, fb_h, flags_ref,
               out_hbm, rout_hbm, us, fs, outs, routs,
               in_sems, out_sems, rout_sems):
        rf_dev = flags_ref[0] == 1
        rl_dev = flags_ref[1] == 1

        def issue(i, slot):
            _strip_stripe_in("start", u_hbm, ut_h, ub_h, None, None, us,
                             in_sems.at[0], i, slot, bm, halo, n_str, ml)
            _strip_stripe_in("start", f_hbm, ft_h, fb_h, None, None, fs,
                             in_sems.at[1], i, slot, bm, halo, n_str, ml)

        issue(0, 0)

        def body(i, _):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_str)
            def _():
                issue(i + 1, jax.lax.rem(i + 1, 2))

            _strip_stripe_in("wait", u_hbm, ut_h, ub_h, None, None, us,
                             in_sems.at[0], i, slot, bm, halo, n_str, ml)
            _strip_stripe_in("wait", f_hbm, ft_h, fb_h, None, None, fs,
                             in_sems.at[1], i, slot, bm, halo, n_str, ml)

            is_first = (i == 0) & rf_dev
            is_last = (i == n_str - 1) & rl_dev
            uv, fv = us[slot], fs[slot]
            xr, xb = uv[:, :w], uv[:, w:]
            fr, fb_ = fv[:, :w], fv[:, w:]
            mhq = jnp.asarray(-hsq * 0.25, dtype)
            xr, xb = _packed_core(xr, xb, fr * mhq, fb_ * mhq, nu,
                                  "ghost0", halo=halo, bm=bm,
                                  is_first=is_first, is_last=is_last)
            rows = jax.lax.broadcasted_iota(jnp.int32, (R_, 1), 0)
            er = (rows % 2) == 0
            r_r, r_b = _packed_residual(xr, xb, fr, fb_, inv_hsq, er)
            s = (r_r + r_b)[halo:halo + bm, :]
            Rv = s.reshape(bm // 2, 2, w).sum(axis=1) \
                * jnp.asarray(0.25, dtype)

            @pl.when(i >= 2)
            def _():
                pltpu.make_async_copy(
                    outs.at[slot], out_hbm.at[pl.ds(0, bm)],
                    out_sems.at[slot]).wait()
                pltpu.make_async_copy(
                    routs.at[slot], rout_hbm.at[pl.ds(0, bm // 2)],
                    rout_sems.at[slot]).wait()

            outs[slot] = jnp.concatenate(
                [xr[halo:halo + bm, :], xb[halo:halo + bm, :]], axis=1)
            pltpu.make_async_copy(
                outs.at[slot],
                out_hbm.at[pl.ds(pl.multiple_of(i * bm, 8), bm)],
                out_sems.at[slot]).start()
            routs[slot] = Rv
            pltpu.make_async_copy(
                routs.at[slot],
                rout_hbm.at[pl.ds(pl.multiple_of(i * (bm // 2), 8),
                                  bm // 2)],
                rout_sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, n_str, body, 0)

        for k in (n_str - 2, n_str - 1):
            slot = k % 2
            pltpu.make_async_copy(
                outs.at[slot], out_hbm.at[pl.ds(k * bm, bm)],
                out_sems.at[slot]).wait()
            pltpu.make_async_copy(
                routs.at[slot],
                rout_hbm.at[pl.ds(k * (bm // 2), bm // 2)],
                rout_sems.at[slot]).wait()

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((nl, ml), dtype),
                   jax.ShapeDtypeStruct((nl // 2, ml // 2), dtype)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, R_, ml), dtype),            # packed u stripes
            pltpu.VMEM((2, R_, ml), dtype),            # packed f stripes
            pltpu.VMEM((2, bm, ml), dtype),            # u out stripes
            pltpu.VMEM((2, bm // 2, ml // 2), dtype),  # Rc out stripes
            pltpu.SemaphoreType.DMA((2, 2, 5)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(up, fp, ut, ub, ft, fb, flags)


@functools.partial(
    jax.jit,
    static_argnames=("h", "nu", "kind", "interpret", "halo", "bm",
                     "rnorm"))
def _packed_pc_sharded(up, fp, V, ut, ub, ft, fb, vt, vb, flags, *,
                       h: float, nu: int, kind: str, interpret: bool,
                       halo: int, bm: int, rnorm: bool = False):
    """Per-shard packed up-leg: u += P(V) + nu rbgs sweeps on a LOCAL
    packed block with pre-exchanged strips for u, f (fine, depth halo)
    and V (coarse, depth 8; V is UNPACKED — coarse lanes are packed
    lanes).  rnorm: also return a (1, ml) f32 row of column-partial
    sums of the LOCAL result's squared residual (psum over the mesh
    for the global ||r||^2 — free stop='residual')."""
    nl, ml = up.shape
    w = ml // 2
    dtype = up.dtype
    n_str = nl // bm
    assert n_str >= 2 and bm >= halo and bm % 16 == 0
    assert halo % 8 == 0 and halo <= 14
    R_ = bm + 2 * halo
    chalo = 8
    Rc = bm // 2 + 2 * chalo
    hsq = h * h
    inv_hsq = 1.0 / hsq

    def kernel(u_hbm, f_hbm, v_hbm, ut_h, ub_h, ft_h, fb_h, vt_h, vb_h,
               flags_ref, out_hbm, *rest):
        if rnorm:
            (racc_hbm, us, fs, vs, outs, racc,
             in_sems, out_sems, r_sem) = rest
            racc[:] = jnp.zeros_like(racc)
        else:
            us, fs, vs, outs, in_sems, out_sems = rest
        rf_dev = flags_ref[0] == 1
        rl_dev = flags_ref[1] == 1

        def issue(i, slot):
            _strip_stripe_in("start", u_hbm, ut_h, ub_h, None, None, us,
                             in_sems.at[0], i, slot, bm, halo, n_str, ml)
            _strip_stripe_in("start", f_hbm, ft_h, fb_h, None, None, fs,
                             in_sems.at[1], i, slot, bm, halo, n_str, ml)
            _strip_stripe_in("start", v_hbm, vt_h, vb_h, None, None, vs,
                             in_sems.at[2], i, slot, bm // 2, chalo,
                             n_str, w)

        issue(0, 0)

        def body(i, _):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_str)
            def _():
                issue(i + 1, jax.lax.rem(i + 1, 2))

            _strip_stripe_in("wait", u_hbm, ut_h, ub_h, None, None, us,
                             in_sems.at[0], i, slot, bm, halo, n_str, ml)
            _strip_stripe_in("wait", f_hbm, ft_h, fb_h, None, None, fs,
                             in_sems.at[1], i, slot, bm, halo, n_str, ml)
            _strip_stripe_in("wait", v_hbm, vt_h, vb_h, None, None, vs,
                             in_sems.at[2], i, slot, bm // 2, chalo,
                             n_str, w)

            is_first = (i == 0) & rf_dev
            is_last = (i == n_str - 1) & rl_dev
            pr, pb = _packed_prolong_stripe(vs[slot], kind, is_first,
                                            is_last, chalo, bm)
            lo = 2 * chalo - halo
            uv, fv = us[slot], fs[slot]
            fr, fb_ = fv[:, :w], fv[:, w:]
            xr = uv[:, :w] + pr[lo:lo + R_, :]
            xb = uv[:, w:] + pb[lo:lo + R_, :]
            mhq = jnp.asarray(-hsq * 0.25, dtype)
            xr, xb = _packed_core(xr, xb, fr * mhq, fb_ * mhq, nu,
                                  "ghost0", halo=halo, bm=bm,
                                  is_first=is_first, is_last=is_last)

            if rnorm:
                rows = jax.lax.broadcasted_iota(jnp.int32, (R_, 1), 0)
                er = (rows % 2) == 0
                r_r, r_b = _packed_residual(xr, xb, fr, fb_, inv_hsq,
                                            er)
                rv = jnp.concatenate(
                    [r_r[halo:halo + bm, :], r_b[halo:halo + bm, :]],
                    axis=1).astype(jnp.float32)
                racc[:] = racc[:] + jnp.sum(rv * rv, axis=0,
                                            keepdims=True)

            @pl.when(i >= 2)
            def _():
                pltpu.make_async_copy(
                    outs.at[slot], out_hbm.at[pl.ds(0, bm)],
                    out_sems.at[slot]).wait()

            outs[slot] = jnp.concatenate(
                [xr[halo:halo + bm, :], xb[halo:halo + bm, :]], axis=1)
            pltpu.make_async_copy(
                outs.at[slot],
                out_hbm.at[pl.ds(pl.multiple_of(i * bm, 8), bm)],
                out_sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, n_str, body, 0)

        for k in (n_str - 2, n_str - 1):
            slot = k % 2
            pltpu.make_async_copy(
                outs.at[slot], out_hbm.at[pl.ds(k * bm, bm)],
                out_sems.at[slot]).wait()

        if rnorm:
            rdma = pltpu.make_async_copy(racc, racc_hbm, r_sem)
            rdma.start()
            rdma.wait()

    out_shape = jax.ShapeDtypeStruct((nl, ml), dtype)
    scratch = [
        pltpu.VMEM((2, R_, ml), dtype),        # packed u stripes
        pltpu.VMEM((2, R_, ml), dtype),        # packed f stripes
        pltpu.VMEM((2, Rc, w), dtype),         # V coarse stripes
        pltpu.VMEM((2, bm, ml), dtype),        # out stripes
    ]
    sems = [
        pltpu.SemaphoreType.DMA((3, 2, 5)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if rnorm:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((1, ml), jnp.float32))
        scratch = scratch + [pltpu.VMEM((1, ml), jnp.float32)]
        sems = sems + [pltpu.SemaphoreType.DMA(())]
        out_specs = (pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pl.ANY))
    else:
        out_specs = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 9
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=out_specs,
        scratch_shapes=scratch + sems,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(up, fp, V, ut, ub, ft, fb, vt, vb, flags)


def packed_rr_sharded(up, fp, ustrips, fstrips, flags, h, nu, *, plan):
    """Per-shard packed down-leg (see the section comment).  ustrips/
    fstrips = (top, bottom[, None, None]) 8-deep PACKED row strips at
    exchange depth plan[0]; flags = (4,) int32 device edge flags (only
    rows are consulted — row-sharded meshes only)."""
    halo, bm = plan
    return _packed_rr_sharded(up, fp, ustrips[0], ustrips[1],
                              fstrips[0], fstrips[1], flags,
                              h=float(h), nu=nu,
                              interpret=_interpret(), halo=halo, bm=bm)


def packed_pc_sharded(up, fp, V, ustrips, fstrips, vstrips, flags, h,
                      nu, kind="inject", *, plan, rnorm=False):
    """Per-shard packed up-leg; vstrips are exchanged on the UNPACKED
    coarse grid at depth 8 rows.  rnorm=True also returns the (1, ml)
    f32 local residual-square partial row."""
    halo, bm = plan
    return _packed_pc_sharded(up, fp, V, ustrips[0], ustrips[1],
                              fstrips[0], fstrips[1], vstrips[0],
                              vstrips[1], flags, h=float(h), nu=nu,
                              kind=kind, interpret=_interpret(),
                              halo=halo, bm=bm, rnorm=rnorm)


# ---------------------------------------------------------------------
# 3D per-shard fused strip kernels.  The 3D analog of the 2D section
# above.  On an (N, 1) device grid — the natural ICI ring for 3D
# domains — only the leading (z) axis is device-sharded: the kernels
# take z-slab strips (whose DMA offsets are free: z is the untiled
# axis of the (8, 128) tile) and keep y/x local with the unsharded
# kernels' in-block clipping + bc fixups.  (a, b>1) meshes also shard
# y (the sublane axis): the kernels additionally take 8-deep
# z-EXTENDED y-edge strips whose extension rows carry the diagonal
# corners, so the y-strip DMA window never clips (see
# _strip_block_in_3d and docs/KERNELS.md).


def sharded_plan3(shape, nu, smoother, dtype, y_nbrs=False):
    """(hz, bz, by, chz) block geometry for the 3D sharded strip
    kernels, or None.  shape: the LOCAL block (nzl, ny, nx) — z is
    device-sharded; with y_nbrs the y axis is device-sharded too (the
    (a, b>1) mesh) and the kernels take additional y-edge strips at the
    fixed in-kernel y halo depth 8 (fine) / 8 (coarse), z-extended so
    the sequential per-axis exchange carries the corners.  hz is both
    the in-kernel z halo and the strip exchange depth for u/f; chz the
    coarse (V) exchange depth."""
    if len(shape) != 3 or nu < 1:
        return None
    if smoother not in ("jacobi", "wjacobi", "rbgs"):
        return None
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                jnp.dtype(jnp.bfloat16)):
        return None
    nzl, ny, nx = shape
    # y-sharded meshes exchange 8-deep y-edge strips on the fine AND
    # the coarse (ny/2) grid: the coarse edge slice needs ny/2 >= 8.
    # (Unreachable through _plan3d's by >= 32 search, kept as the
    # explicit floor for direct API callers.)
    if y_nbrs and ny < 16:
        return None
    # nx % 256 (not 128): the composite outputs R (lanes nx // 2) and
    # reads V (lanes nx // 2) — their VMEM slices crash Mosaic below
    # 128-lane alignment ("Slice shape along dimension 3 must be
    # aligned to tiling (128)", not reproducible in interpret mode);
    # sub-256-lane levels fall back to XLA, which wins there anyway
    if nx % 256 or ny % 8 or nzl % 2 or nzl < 8:
        return None
    plan = _plan3d(shape, nu, smoother, jnp.dtype(dtype).itemsize,
                   composite=True)
    if plan is None:
        return None
    hz, bz, by = plan
    return hz, bz, by, (hz + 3) // 2


def _strip_block_in_3d(op, body, top, bot, vref, sems, iz, iy, slot,
                       bz, hz, nzs, by, hy, nys, front=None, back=None):
    """Start/wait the DMAs assembling (z, y) block (iz, iy) of body +
    neighbor strips into vref[slot] of shape (bz+2*hz, by+2*hy, nx).
    z is device-sharded: the halo outside the local array comes from
    `top`/`bot` strips of shape (hz, ny, nx) (real neighbor planes or
    the collective's zero fill at global edges — never stale).  y is
    local when front/back are None (clipped windows whose stale edge
    scratch the in-kernel bc fixups overwrite); on a y-sharded mesh
    front/back are z-EXTENDED y-edge strips of shape
    (nzl + 2*hz, hy, nx) — their z-extension rows hold the y-neighbor's
    z halo, i.e. the diagonal-device corners, so the full
    [iz*bz, iz*bz + Rz) window is always valid.  sems: a (5,)
    semaphore slice (body, z-head, z-tail, y-front, y-back); at most
    one DMA fires per semaphore per block."""
    Rz = bz + 2 * hz
    Ry = by + 2 * hy
    ycases = _axis_cases(iy, by, hy, nys)

    def dma(src, z_dst, cols_dst, sem):
        getattr(pltpu.make_async_copy(
            src, vref.at[slot, z_dst, cols_dst], sem), op)()

    # body: z window clipped to the local array (same as unsharded)
    _block_in_3d(op, body, vref, sems.at[0], iz, iy, slot,
                 bz, hz, nzs, by, hy, nys)

    # head/tail planes from the z-neighbor strips, y-windowed like the
    # body (z strips span full local (ny, nx), so corners are carried)
    for cy, sy, ly, dy in ycases:
        cond = iz == 0 if cy is None else (iz == 0) & cy

        def head(sy=sy, ly=ly, dy=dy):
            dma(top.at[pl.ds(0, hz), pl.ds(_mult8(sy), ly)],
                pl.ds(0, hz), pl.ds(dy, ly), sems.at[1])

        pl.when(cond)(head)
    for cy, sy, ly, dy in ycases:
        cond = iz == nzs - 1 if cy is None else (iz == nzs - 1) & cy

        def tail(sy=sy, ly=ly, dy=dy):
            dma(bot.at[pl.ds(0, hz), pl.ds(_mult8(sy), ly)],
                pl.ds(Rz - hz, hz), pl.ds(dy, ly), sems.at[2])

        pl.when(cond)(tail)

    if front is None:
        return

    # y front/back rows from the y-neighbor strips: the full extended
    # z window [iz*bz, iz*bz + Rz) in strip coords (strip z origin is
    # local z = -hz), valid for every iz including the z edges
    def yfront():
        dma(front.at[pl.ds(iz * bz, Rz), pl.ds(0, hy)],
            pl.ds(0, Rz), pl.ds(0, hy), sems.at[3])

    pl.when(iy == 0)(yfront)

    def yback():
        dma(back.at[pl.ds(iz * bz, Rz), pl.ds(0, hy)],
            pl.ds(0, Rz), pl.ds(Ry - hy, hy), sems.at[4])

    pl.when(iy == nys - 1)(yback)


@functools.partial(
    jax.jit,
    static_argnames=("h", "nu", "smoother", "bc", "interpret",
                     "hz", "bz", "by", "ycols"))
def _rr_sharded_3d(u, f, *strip_args, h: float,
                   nu: int, smoother: str, bc: str, interpret: bool,
                   hz: int, bz: int, by: int, ycols: bool = False):
    """Per-shard 3D fused pre-smooth x nu + residual + restrict on a
    local (nzl, ny, nx) block with pre-exchanged z-slab strips (and,
    when ycols, z-extended y-edge strips — the (a, b>1) mesh).
    Returns (u_center, R).  Mirrors _rr_fused_3d; only the sharded
    edges differ: halo planes come from strips, and the bc fixups fire
    only on devices holding a global edge (flags[0..3]).

    strip_args: (ut, ub, ft, fb, flags, pmat) or with ycols
    (ut, ub, uyf, uyb, ft, fb, fyf, fyb, flags, pmat)."""
    nzl, ny, nx = u.shape
    dtype = u.dtype
    hy = 8
    nzs, nys = nzl // bz, ny // by
    n_blocks = nzs * nys
    Rz, Ry = bz + 2 * hz, by + 2 * hy
    hsq = h * h
    inv_hsq = 1.0 / hsq

    def kernel(*args):
        if ycols:
            (u_hbm, f_hbm, ut_h, ub_h, uyf_h, uyb_h, ft_h, fb_h, fyf_h,
             fyb_h, flags_ref, p_hbm, out_hbm, rout_hbm, us, fs, pv,
             outs, routs, in_sems, out_sems, rout_sems, p_sem) = args
        else:
            (u_hbm, f_hbm, ut_h, ub_h, ft_h, fb_h, flags_ref, p_hbm,
             out_hbm, rout_hbm, us, fs, pv, outs, routs,
             in_sems, out_sems, rout_sems, p_sem) = args
            uyf_h = uyb_h = fyf_h = fyb_h = None
        zf_dev = flags_ref[0] == 1
        zl_dev = flags_ref[1] == 1
        yf_dev = flags_ref[2] == 1 if ycols else True
        yl_dev = flags_ref[3] == 1 if ycols else True
        pdma = pltpu.make_async_copy(p_hbm, pv, p_sem)
        pdma.start()

        def issue(b, slot, op):
            iz, iy = b // nys, jax.lax.rem(b, nys)
            _strip_block_in_3d(op, u_hbm, ut_h, ub_h, us,
                               in_sems.at[slot, 0], iz, iy, slot,
                               bz, hz, nzs, by, hy, nys,
                               front=uyf_h, back=uyb_h)
            _strip_block_in_3d(op, f_hbm, ft_h, fb_h, fs,
                               in_sems.at[slot, 1], iz, iy, slot,
                               bz, hz, nzs, by, hy, nys,
                               front=fyf_h, back=fyb_h)

        issue(0, 0, "start")
        pdma.wait()

        def body(b, _):
            slot = jax.lax.rem(b, 2)
            iz, iy = b // nys, jax.lax.rem(b, nys)

            @pl.when(b + 1 < n_blocks)
            def _():
                issue(b + 1, jax.lax.rem(b + 1, 2), "start")

            issue(b, slot, "wait")

            zf = (iz == 0) & zf_dev
            zl = (iz == nzs - 1) & zl_dev
            yf = (iy == 0) & yf_dev
            yl = (iy == nys - 1) & yl_dev
            uv = _sweeps3(us[slot], fs[slot], nu, smoother, bc, hsq,
                          hz, bz, hy, by, zf, zl, yf, yl)
            # ghosts must hold boundary data for the residual reads
            uv = _apply_bc_3d(uv, bc, zf, zl, yf, yl, hz, bz, hy, by)

            rv_full = fs[slot] - (_nbr3(uv, bc) - 6.0 * uv) \
                * jnp.asarray(inv_hsq, dtype)
            rv = rv_full[hz:hz + bz, hy:hy + by, :]
            s = rv.reshape(bz // 2, 2, by, nx).sum(axis=1)
            s = s.reshape(bz // 2, by // 2, 2, nx).sum(axis=2)
            Rv = _lane_halve3(s, pv[:]) * jnp.asarray(0.125, dtype)

            @pl.when(b >= 2)
            def _():
                pltpu.make_async_copy(
                    outs.at[slot], out_hbm.at[pl.ds(0, bz), pl.ds(0, by)],
                    out_sems.at[slot]).wait()
                pltpu.make_async_copy(
                    routs.at[slot],
                    rout_hbm.at[pl.ds(0, bz // 2), pl.ds(0, by // 2)],
                    rout_sems.at[slot]).wait()

            outs[slot] = uv[hz:hz + bz, hy:hy + by, :]
            pltpu.make_async_copy(
                outs.at[slot],
                out_hbm.at[pl.ds(iz * bz, bz),
                           pl.ds(pl.multiple_of(iy * by, 8), by)],
                out_sems.at[slot]).start()
            routs[slot] = Rv
            pltpu.make_async_copy(
                routs.at[slot],
                rout_hbm.at[pl.ds(iz * (bz // 2), bz // 2),
                            pl.ds(pl.multiple_of(iy * (by // 2), 8),
                                  by // 2)],
                rout_sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, n_blocks, body, 0)

        for k in (n_blocks - 2, n_blocks - 1):
            if k < 0:
                continue
            slot = k % 2
            iz, iy = k // nys, k % nys
            pltpu.make_async_copy(
                outs.at[slot],
                out_hbm.at[pl.ds(iz * bz, bz), pl.ds(iy * by, by)],
                out_sems.at[slot]).wait()
            pltpu.make_async_copy(
                routs.at[slot],
                rout_hbm.at[pl.ds(iz * (bz // 2), bz // 2),
                            pl.ds(iy * (by // 2), by // 2)],
                rout_sems.at[slot]).wait()

    pmat_shape = strip_args[-1].shape
    n_strips = 8 if ycols else 4
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((nzl, ny, nx), dtype),
                   jax.ShapeDtypeStruct((nzl // 2, ny // 2, nx // 2),
                                        dtype)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (2 + n_strips)
        + [pl.BlockSpec(memory_space=pltpu.SMEM),
           pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, Rz, Ry, nx), dtype),
            pltpu.VMEM((2, Rz, Ry, nx), dtype),
            pltpu.VMEM(pmat_shape, dtype),
            pltpu.VMEM((2, bz, by, nx), dtype),
            pltpu.VMEM((2, bz // 2, by // 2, nx // 2), dtype),
            pltpu.SemaphoreType.DMA((2, 2, 5)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(u, f, *strip_args)


@functools.partial(
    jax.jit,
    static_argnames=("h", "nu", "smoother", "bc", "kind", "interpret",
                     "hz", "bz", "by", "chz", "rnorm", "ycols"))
def _pc_sharded_3d(u, f, V, *strip_args,
                   h: float, nu: int, smoother: str, bc: str, kind: str,
                   interpret: bool, hz: int, bz: int, by: int, chz: int,
                   rnorm: bool = False, ycols: bool = False):
    """Per-shard 3D fused u += P(V) + post-smooth x nu with
    pre-exchanged z strips for u, f (depth hz) and V (coarse, depth
    chz), plus z-extended y-edge strips when ycols (the (a, b>1)
    mesh).  Mirrors _pc_fused_3d; rnorm adds a (1, by, nx) f32 local
    residual-square partial slab (free stop='residual').

    strip_args: (ut, ub, ft, fb, vt, vb, flags, emat) or with ycols
    (ut, ub, uyf, uyb, ft, fb, fyf, fyb, vt, vb, vyf, vyb, flags,
    emat)."""
    nzl, ny, nx = u.shape
    dtype = u.dtype
    hy = 8
    nzs, nys = nzl // bz, ny // by
    n_blocks = nzs * nys
    Rz, Ry = bz + 2 * hz, by + 2 * hy
    chy = 8
    Rcz, Rcy = bz // 2 + 2 * chz, by // 2 + 2 * chy
    hsq = h * h
    inv_hsq = 1.0 / hsq
    assert hz <= 14 and chz <= bz // 2 and chy <= by // 2

    def kernel(*args):
        if ycols:
            (u_hbm, f_hbm, v_hbm, ut_h, ub_h, uyf_h, uyb_h, ft_h, fb_h,
             fyf_h, fyb_h, vt_h, vb_h, vyf_h, vyb_h, flags_ref, e_hbm,
             out_hbm, *rest) = args
        else:
            (u_hbm, f_hbm, v_hbm, ut_h, ub_h, ft_h, fb_h, vt_h, vb_h,
             flags_ref, e_hbm, out_hbm, *rest) = args
            uyf_h = uyb_h = fyf_h = fyb_h = vyf_h = vyb_h = None
        if rnorm:
            (racc_hbm, us, fs, vs, ev, outs, racc,
             in_sems, out_sems, e_sem, r_sem) = rest
            racc[:] = jnp.zeros_like(racc)
        else:
            us, fs, vs, ev, outs, in_sems, out_sems, e_sem = rest
        zf_dev = flags_ref[0] == 1
        zl_dev = flags_ref[1] == 1
        yf_dev = flags_ref[2] == 1 if ycols else True
        yl_dev = flags_ref[3] == 1 if ycols else True
        edma = pltpu.make_async_copy(e_hbm, ev, e_sem)
        edma.start()

        def issue(b, slot, op):
            iz, iy = b // nys, jax.lax.rem(b, nys)
            _strip_block_in_3d(op, u_hbm, ut_h, ub_h, us,
                               in_sems.at[slot, 0], iz, iy, slot,
                               bz, hz, nzs, by, hy, nys,
                               front=uyf_h, back=uyb_h)
            _strip_block_in_3d(op, f_hbm, ft_h, fb_h, fs,
                               in_sems.at[slot, 1], iz, iy, slot,
                               bz, hz, nzs, by, hy, nys,
                               front=fyf_h, back=fyb_h)
            _strip_block_in_3d(op, v_hbm, vt_h, vb_h, vs,
                               in_sems.at[slot, 2], iz, iy, slot,
                               bz // 2, chz, nzs, by // 2, chy, nys,
                               front=vyf_h, back=vyb_h)

        issue(0, 0, "start")
        edma.wait()

        def body(b, _):
            slot = jax.lax.rem(b, 2)
            iz, iy = b // nys, jax.lax.rem(b, nys)

            @pl.when(b + 1 < n_blocks)
            def _():
                issue(b + 1, jax.lax.rem(b + 1, 2), "start")

            issue(b, slot, "wait")

            zf = (iz == 0) & zf_dev
            zl = (iz == nzs - 1) & zl_dev
            yf = (iy == 0) & yf_dev
            yl = (iy == nys - 1) & yl_dev
            v2 = jnp.repeat(vs[slot], 2, axis=0)
            v2 = jnp.repeat(v2, 2, axis=1)
            vf = _lane_double3(v2, ev[:])
            if kind == "bilinear":
                # zero stale-scratch ghosts only at GLOBAL edges — at
                # device-interior z edges the halo holds valid strip
                # data the blend must read (seamless across shards)
                zi = jax.lax.broadcasted_iota(jnp.int32,
                                              (vf.shape[0], 1, 1), 0)
                yi = jax.lax.broadcasted_iota(jnp.int32,
                                              (1, vf.shape[1], 1), 1)
                vf = jnp.where(zf & (zi < 2 * chz), 0.0, vf)
                vf = jnp.where(zl & (zi >= bz + 2 * chz), 0.0, vf)
                vf = jnp.where(yf & (yi < 2 * chy), 0.0, vf)
                vf = jnp.where(yl & (yi >= by + 2 * chy), 0.0, vf)
                vf = _trilinear_blend_3d(
                    vf,
                    pos=((2 * chz, bz + 2 * chz - 1),
                         (2 * chy, by + 2 * chy - 1),
                         (0, nx - 1)),
                    flags=((zf, zl), (yf, yl), (True, True)))
            vf = vf[2 * chz - hz:2 * chz - hz + Rz,
                    2 * chy - hy:2 * chy - hy + Ry, :]

            uv = us[slot] + vf
            uv = _sweeps3(uv, fs[slot], nu, smoother, bc, hsq,
                          hz, bz, hy, by, zf, zl, yf, yl)

            if rnorm:
                uv = _apply_bc_3d(uv, bc, zf, zl, yf, yl, hz, bz, hy, by)
                rv = (fs[slot] - (_nbr3(uv, bc) - 6.0 * uv)
                      * jnp.asarray(inv_hsq, dtype))[hz:hz + bz,
                                                     hy:hy + by, :]
                rv = rv.astype(jnp.float32)
                racc[:] = racc[:] + jnp.sum(rv * rv, axis=0,
                                            keepdims=True)

            @pl.when(b >= 2)
            def _():
                pltpu.make_async_copy(
                    outs.at[slot], out_hbm.at[pl.ds(0, bz), pl.ds(0, by)],
                    out_sems.at[slot]).wait()

            outs[slot] = uv[hz:hz + bz, hy:hy + by, :]
            pltpu.make_async_copy(
                outs.at[slot],
                out_hbm.at[pl.ds(iz * bz, bz),
                           pl.ds(pl.multiple_of(iy * by, 8), by)],
                out_sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, n_blocks, body, 0)

        for k in (n_blocks - 2, n_blocks - 1):
            if k < 0:
                continue
            slot = k % 2
            pltpu.make_async_copy(
                outs.at[slot],
                out_hbm.at[pl.ds((k // nys) * bz, bz),
                           pl.ds((k % nys) * by, by)],
                out_sems.at[slot]).wait()

        if rnorm:
            rdma = pltpu.make_async_copy(racc, racc_hbm, r_sem)
            rdma.start()
            rdma.wait()

    out_shape = jax.ShapeDtypeStruct((nzl, ny, nx), dtype)
    scratch = [
        pltpu.VMEM((2, Rz, Ry, nx), dtype),
        pltpu.VMEM((2, Rz, Ry, nx), dtype),
        pltpu.VMEM((2, Rcz, Rcy, nx // 2), dtype),
        pltpu.VMEM(strip_args[-1].shape, dtype),
        pltpu.VMEM((2, bz, by, nx), dtype),
    ]
    sems = [
        pltpu.SemaphoreType.DMA((2, 3, 5)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA(()),
    ]
    if rnorm:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((1, by, nx), jnp.float32))
        scratch = scratch + [pltpu.VMEM((1, by, nx), jnp.float32)]
        sems = sems + [pltpu.SemaphoreType.DMA(())]
        out_specs = (pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pl.ANY))
    else:
        out_specs = pl.BlockSpec(memory_space=pl.ANY)
    n_strips = 12 if ycols else 6
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (3 + n_strips)
        + [pl.BlockSpec(memory_space=pltpu.SMEM),
           pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        scratch_shapes=scratch + sems,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(u, f, V, *strip_args)


def smooth_rr_sharded3(u, f, ustrips, fstrips, flags, h, nu,
                       smoother="jacobi", bc="ghost0", *, plan):
    """3D per-shard fused pre-smooth + residual + restrict.
    ustrips/fstrips = (top, bottom) z-slab strips of shape
    (plan[0], ny, nx) — z-sharded-only mesh — or (top, bottom, front,
    back) with z-EXTENDED y-edge strips of shape (nzl + 2*plan[0], 8,
    nx) on a y-sharded mesh; flags = (4,) int32
    [z_first, z_last, y_first, y_last]."""
    hz, bz, by, _ = plan
    pmat = _halve_mat(u.shape[2], u.dtype)
    ycols = len(ustrips) > 2 and ustrips[2] is not None
    return _rr_sharded_3d(u, f, *ustrips[:2 + 2 * ycols],
                          *fstrips[:2 + 2 * ycols], flags, pmat,
                          h=float(h), nu=nu, smoother=smoother, bc=bc,
                          interpret=_interpret(), hz=hz, bz=bz, by=by,
                          ycols=ycols)


def pc_smooth_sharded3(u, f, V, ustrips, fstrips, vstrips, flags, h, nu,
                       smoother="jacobi", bc="ghost0", kind="inject",
                       *, plan, rnorm=False):
    """3D per-shard fused prolong + correct + post-smooth.  vstrips
    are COARSE z-slab strips at depth plan[3] (= (hz+3)//2), with
    z-extended coarse y-edge strips of depth 8 appended on a y-sharded
    mesh (see smooth_rr_sharded3); rnorm=True also returns the
    (1, by, nx) f32 local residual-square partial."""
    hz, bz, by, chz = plan
    emat = _double_mat(u.shape[2], u.dtype)
    ycols = len(ustrips) > 2 and ustrips[2] is not None
    k = 2 + 2 * ycols
    return _pc_sharded_3d(u, f, V, *ustrips[:k], *fstrips[:k],
                          *vstrips[:k], flags,
                          emat, h=float(h), nu=nu, smoother=smoother,
                          bc=bc, kind=kind, interpret=_interpret(),
                          hz=hz, bz=bz, by=by, chz=chz, rnorm=rnorm,
                          ycols=ycols)


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
