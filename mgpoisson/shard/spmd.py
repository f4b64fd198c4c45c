"""Explicit SPMD multigrid: shard_map + ppermute halo exchange.

The hand-scheduled counterpart to the GSPMD path (mgpoisson.shard.gspmd):
the whole V-cycle runs inside one `jax.shard_map` over a 2D ('x','y')
mesh, with the communication written out explicitly —

- deep-halo exchange per smoother PHASE: one radius*nu-deep
  `jax.lax.ppermute` neighbor shift per phase (f exchanged once per
  level), halo cells recomputed locally — the in-chip deep-halo
  trapezoid (kernels/pallas.py) applied across devices.  Same lines
  over ICI as per-sweep exchange, 1/nu the messages in the
  latency-bound small-halo regime; the residual keeps its own 1-cell
  exchange.  The nearest-neighbor torus pattern is what ICI is built
  for (SURVEY.md section 5, the PDE analog of ring attention).
  Non-wrapping permutes deliver zeros to edge devices,
  which IS the reference's zero-ghost Dirichlet boundary
  (`cpu.lua:28-31`) — the boundary condition falls out of the
  collective's semantics.  Face-Dirichlet (tuned scheme's coarse
  levels) overrides the received halo with -edge on boundary devices.
- restriction and injection prolongation are halo-free (local 2^ndim
  blocks); bilinear prolongation exchanges one coarse halo cell per
  sharded axis.
- below spec.replicate_below the level is all-gathered and every device
  redundantly computes the coarse subtree, then slices its shard back —
  the reference hybrid's cpuDepth handoff (`cpu-gpu.lua:17-52`) reborn:
  tiny grids are collective-latency-bound, so stop communicating.
- error reductions are local sums + psum.

Per-shard fused Pallas kernels (2D): when a level's LOCAL block meets
`kernels.pallas.sharded_plan` (f32/bf16, lane-aligned shape) and the
backend allows Pallas, the down-leg runs `smooth_rr_sharded` and the
up-leg `pc_smooth_sharded` — the fused single-chip strip kernels with
the halo handed in as pre-exchanged ppermute strips (rows at the plan
depth, 128-lane-aligned columns with corners carried).  This is what
makes the single-chip kernel win apply to the scale-out config: the
fine-level kernels ARE the hot path (`gpu.lua:286-346`), and without
them each shard would run the ~7x-slower unfused XLA sweeps.
Coarser sharded levels (blocks below the plan minimum) keep the jnp
deep-halo path — the hybrid's cpuDepth idea applied a second time.

Rank-polymorphic: 2D grids shard both axes; 3D grids shard axes 0 and 1
over the same ('x','y') mesh with axis 2 kept local (contiguous lanes).
Both schemes and all smoothers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mgpoisson.cycle.vcycle import _cycle as _replicated_cycle
from mgpoisson.kernels import xla


def _pallas_enabled(spec) -> bool:
    """Per-shard Pallas strip kernels: on for 2D and 3D on any mesh
    under backend 'auto' (TPU) or 'pallas' (forced — interpret-mode
    tests set the MGPOISSON_PALLAS_INTERPRET env and force the backend
    on CPU)."""
    if spec.ndim not in (2, 3) or spec.backend == "xla":
        return False
    if spec.smoother_resolved not in ("jacobi", "wjacobi", "rbgs"):
        return False
    if spec.nu_pre < 1 or spec.nu_post < 1:
        return False
    if spec.backend == "pallas":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False

# mesh axis name per sharded array axis; array axes >= 2 are local
_AXIS_NAMES = ("x", "y")


def _edge(u, ax, side):
    """One-cell-thick boundary slice of u along ax ('lo' or 'hi')."""
    idx = [slice(None)] * u.ndim
    idx[ax] = slice(0, 1) if side == "lo" else slice(-1, None)
    return u[tuple(idx)]


def _build_parts(spec, mesh):
    """Shared closures for the explicit-SPMD step and FMG entry points."""
    # cycle='fmg' means the FMG pass initializes (see build_spmd_fmg);
    # the per-step cycle is then a V-cycle, like make_cycle's mapping
    gamma = 2 if spec.cycle == "w" else 1
    mesh_sizes = {"x": mesh.shape["x"], "y": mesh.shape["y"]}
    ndim = spec.ndim
    sharded_axes = list(range(min(2, ndim)))
    h0 = spec.fine_h
    smoother = spec.smoother_resolved

    def shift(x, axis_name, direction):
        """Neighbor transfer along a mesh axis; zeros arrive at the
        global boundary (non-wrapping permute == zero-ghost bc)."""
        n = mesh_sizes[axis_name]
        if n == 1:
            return jnp.zeros_like(x)
        if direction > 0:      # receive from the lower-index neighbor
            perm = [(i, i + 1) for i in range(n - 1)]
        else:
            perm = [(i + 1, i) for i in range(n - 1)]
        return jax.lax.ppermute(x, axis_name, perm)

    def axis_halos(u, ax, bc):
        """(lo_halo, hi_halo) line pair for array axis ax."""
        if ax in sharded_axes:
            name = _AXIS_NAMES[ax]
            lo = shift(_edge(u, ax, "hi"), name, +1)
            hi = shift(_edge(u, ax, "lo"), name, -1)
            if bc == "face":
                aidx = jax.lax.axis_index(name)
                lo = jnp.where(aidx == 0, -_edge(u, ax, "lo"), lo)
                hi = jnp.where(aidx == mesh_sizes[name] - 1,
                               -_edge(u, ax, "hi"), hi)
            return lo, hi
        # local axis: the global boundary is in-block
        if bc == "face":
            return -_edge(u, ax, "lo"), -_edge(u, ax, "hi")
        z = jnp.zeros_like(_edge(u, ax, "lo"))
        return z, z

    def nbr(u, bc):
        s = None
        for ax in range(ndim):
            lo, hi = axis_halos(u, ax, bc)
            idx_lo = [slice(None)] * ndim
            idx_lo[ax] = slice(None, -1)
            idx_hi = [slice(None)] * ndim
            idx_hi[ax] = slice(1, None)
            up = jnp.concatenate([lo, u[tuple(idx_lo)]], axis=ax)
            dn = jnp.concatenate([u[tuple(idx_hi)], hi], axis=ax)
            term = up + dn
            s = term if s is None else s + term
        return s

    def sweep(u, f, h, bc):
        hsq = h * h
        adiag = -2.0 * ndim / hsq
        if smoother == "jacobi":
            return (f - nbr(u, bc) / hsq) / adiag
        if smoother == "wjacobi":
            omega = 2.0 * ndim / (2.0 * ndim + 1.0)
            return u + omega * ((f - nbr(u, bc) / hsq) / adiag - u)
        # red-black: local sizes are even, so local parity == global parity
        parity = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
        for ax in range(1, ndim):
            parity = parity + jax.lax.broadcasted_iota(jnp.int32, u.shape, ax)
        parity = parity % 2
        for p in (0, 1):
            upd = (f - nbr(u, bc) / hsq) / adiag
            u = jnp.where(parity == p, upd, u)
        return u

    # ---------------- deep-halo smoothing phase (comm aggregation) ----
    # One r-deep halo exchange per smooth PHASE instead of a 1-cell
    # exchange per sweep (r = per-sweep dependency radius x nu): the
    # same total lines cross ICI, but in one message per neighbor per
    # phase instead of nu — the latency-bound regime for small halo
    # lines is where ICI time actually goes.  Halo cells are recomputed
    # redundantly and lose one ring of exactness per sweep, exactly the
    # deep-halo trapezoid the Pallas kernels use in-chip
    # (kernels/pallas.py); values are bit-identical to the per-sweep
    # exchange (same stencil on the same neighbor data).

    def _lines(u, ax, side, r):
        idx = [slice(None)] * u.ndim
        idx[ax] = slice(0, r) if side == "lo" else slice(-r, None)
        return u[tuple(idx)]

    def deep_halos(u, r):
        """Extend u with r-deep neighbor halos along every sharded axis
        (sequential per-axis extension carries the corners); zeros
        arrive at global edges (non-wrapping ppermute)."""
        for ax in sharded_axes:
            name = _AXIS_NAMES[ax]
            lo = shift(_lines(u, ax, "hi", r), name, +1)
            hi = shift(_lines(u, ax, "lo", r), name, -1)
            u = jnp.concatenate([lo, u, hi], axis=ax)
        return u

    def fix_ghost(ue, r, bc):
        """Per-sweep global-boundary fixup on an r-extended block: on
        edge devices the halo region lies OUTSIDE the grid and must
        hold boundary data every sweep (ghost0: zeros; face: the
        adjacent line = -edge)."""
        for ax in sharded_axes:
            name = _AXIS_NAMES[ax]
            aidx = jax.lax.axis_index(name)
            first = aidx == 0
            last = aidx == mesh_sizes[name] - 1
            n_ax = ue.shape[ax]
            shape = [1] * ue.ndim
            shape[ax] = n_ax
            idx = jax.lax.iota(jnp.int32, n_ax).reshape(shape)
            if bc == "ghost0":
                ue = jnp.where(first & (idx < r), 0.0, ue)
                ue = jnp.where(last & (idx >= n_ax - r), 0.0, ue)
            else:  # face: ghost = -edge on the adjacent line, 0 beyond
                sl = [slice(None)] * ue.ndim
                sl[ax] = slice(r, r + 1)
                lo_edge = ue[tuple(sl)]
                sl[ax] = slice(n_ax - r - 1, n_ax - r)
                hi_edge = ue[tuple(sl)]
                ue = jnp.where(first & (idx == r - 1), -lo_edge, ue)
                ue = jnp.where(first & (idx < r - 1), 0.0, ue)
                ue = jnp.where(last & (idx == n_ax - r), -hi_edge, ue)
                ue = jnp.where(last & (idx > n_ax - r), 0.0, ue)
        return ue

    def _center(ue, r):
        idx = tuple(slice(r, -r) if ax in sharded_axes else slice(None)
                    for ax in range(ue.ndim))
        return ue[idx]

    def _shrink(xe, d):
        """Trim d halo lines off each sharded axis of an extended block."""
        if d == 0:
            return xe
        idx = tuple(slice(d, -d) if ax in sharded_axes else slice(None)
                    for ax in range(xe.ndim))
        return xe[idx]

    def _deep_ok(u, r):
        """Can a depth-r halo be taken from the immediate neighbors?"""
        min_local = min(u.shape[ax] for ax in sharded_axes)
        return r <= min_local and not all(
            mesh_sizes[_AXIS_NAMES[ax]] == 1 for ax in sharded_axes)

    _RADIUS = 2 if smoother == "rbgs" else 1

    def smooth_phase(u, f, h, nu, bc, fe=None, fe_r=0):
        """nu sweeps with ONE halo exchange (falls back to per-sweep
        exchange when the halo depth would exceed the local block).

        fe/fe_r: optionally a pre-extended RHS block with fe_r-deep
        halos — f is level-invariant, so the caller exchanges it once
        per level and both smooth phases slice from it."""
        if nu == 0:
            return u
        r = _RADIUS * nu
        if not _deep_ok(u, r):
            for _ in range(nu):
                u = sweep(u, f, h, bc)
            return u
        ue = deep_halos(u, r)
        fe = deep_halos(f, r) if fe is None or fe_r < r \
            else _shrink(fe, fe_r - r)

        # local neighbor sum on the extended block: value-edge zeros on
        # SHARDED axes (that is halo degradation, not a bc), the real
        # bc on LOCAL axes (their global boundary is in-block)
        def nbr_ext(x):
            s = xla.neighbor_sum(x, "ghost0")
            if bc == "face":
                for ax in range(ndim):
                    if ax in sharded_axes:
                        continue
                    first = tuple(slice(None) if a != ax else slice(0, 1)
                                  for a in range(ndim))
                    last = tuple(slice(None) if a != ax else
                                 slice(-1, None) for a in range(ndim))
                    s = s.at[first].add(-x[first])
                    s = s.at[last].add(-x[last])
            return s

        hsq = h * h
        adiag = -2.0 * ndim / hsq
        # sharded-axis real BCs applied by fix_ghost per sweep (and per
        # rbgs color); rbgs parity is preserved because r is even for
        # rbgs and the local origin shifts by r per sharded axis
        if smoother == "rbgs":
            parity = jax.lax.broadcasted_iota(jnp.int32, ue.shape, 0)
            for ax in range(1, ndim):
                parity = parity + jax.lax.broadcasted_iota(
                    jnp.int32, ue.shape, ax)
            parity = parity % 2
            for _ in range(nu):
                for p in (0, 1):
                    # ghosts must hold boundary data before EACH color:
                    # the second color's boundary cells read ghosts the
                    # first color just overwrote
                    ue = fix_ghost(ue, r, bc)
                    upd = (fe - nbr_ext(ue) / hsq) / adiag
                    ue = jnp.where(parity == p, upd, ue)
        else:
            omega = 2.0 * ndim / (2.0 * ndim + 1.0)
            for _ in range(nu):
                ue = fix_ghost(ue, r, bc)
                jac = (fe - nbr_ext(ue) / hsq) / adiag
                ue = jac if smoother == "jacobi" \
                    else ue + omega * (jac - ue)
        return _center(ue, r)

    def residual(u, f, h, bc):
        hsq = h * h
        return f - (nbr(u, bc) / hsq + (-2.0 * ndim / hsq) * u)

    def prolong_correct(u, V, kind):
        if kind == "inject":
            v = V
            for ax in range(ndim):
                v = jnp.repeat(v, 2, axis=ax)
            return u + v
        # bilinear with face-adapted global-edge weights: fine-space
        # blend per axis (see kernels/xla.py); the +-2 fine shift needs
        # the neighbor's edge coarse line, fetched with one ppermute on
        # sharded axes (zero-filled on local axes / at global edges)
        v = V
        for ax in range(ndim):
            R = jnp.repeat(v, 2, axis=ax)
            lo_h, hi_h = axis_halos(v, ax, "ghost0")
            lo_h = jnp.repeat(lo_h, 2, axis=ax)   # 2 fine halo lines
            hi_h = jnp.repeat(hi_h, 2, axis=ax)
            idx_m = [slice(None)] * ndim
            idx_m[ax] = slice(None, -2)
            idx_p = [slice(None)] * ndim
            idx_p[ax] = slice(2, None)
            Rm = jnp.concatenate([lo_h, R[tuple(idx_m)]], axis=ax)
            Rp = jnp.concatenate([R[tuple(idx_p)], hi_h], axis=ax)
            idx = jax.lax.broadcasted_iota(jnp.int32, R.shape, ax)
            out = 0.75 * R + 0.25 * jnp.where(idx % 2 == 0, Rm, Rp)
            nloc = R.shape[ax]
            if ax in sharded_axes:
                name = _AXIS_NAMES[ax]
                aidx = jax.lax.axis_index(name)
                first = (aidx == 0) & (idx == 0)
                last = (aidx == mesh_sizes[name] - 1) & (idx == nloc - 1)
            else:
                first = idx == 0
                last = idx == nloc - 1
            v = jnp.where(first | last, 0.5 * R, out)
        return u + v

    def gather_full(x):
        full = jax.lax.all_gather(x, "x", axis=0, tiled=True)
        if 1 in sharded_axes:
            full = jax.lax.all_gather(full, "y", axis=1, tiled=True)
        return full

    def slice_local(full, local_shape):
        starts = [jnp.int32(0)] * ndim
        starts[0] = jax.lax.axis_index("x") * local_shape[0]
        if 1 in sharded_axes:
            starts[1] = jax.lax.axis_index("y") * local_shape[1]
        return jax.lax.dynamic_slice(full, tuple(starts), local_shape)

    def shardable(g):
        # every device keeps an even block of at least 2 cells per axis
        for name in ("x", "y"):
            m = mesh_sizes[name]
            if g % m != 0 or g // m < 2 or (g // m) % 2 != 0:
                return False
        return True

    # -------------- per-shard fused Pallas strip kernels (2D) ---------
    # The fused single-chip half-level kernels, fed by ppermute strips:
    # top/bottom at the plan's halo depth, left/right as 128-lane
    # columns row-extended so the sequential per-axis exchange carries
    # the corners (same scheme as deep_halos).  Non-wrapping permutes
    # zero-fill past the global boundary, which the kernels' in-kernel
    # bc fixup expects (flags mark which device edges are global).
    pallas_on = _pallas_enabled(spec)
    nu_plan = max(spec.nu_pre, spec.nu_post)
    # a single device column means no column neighbors exist: the strip
    # kernels compile without the 128-lane column strips/window and the
    # (N,1) mesh — the natural ICI-ring decomposition — pays only the
    # tiny row-strip DMAs over the single-chip fused kernels
    col_nbrs = mesh_sizes["y"] > 1

    def level_plan(shape, dtype):
        if not pallas_on:
            return None
        from mgpoisson.kernels import pallas as pk
        if ndim == 3:
            return pk.sharded_plan3(shape, nu_plan, smoother, dtype,
                                    y_nbrs=col_nbrs)
        return pk.sharded_plan(shape, nu_plan, smoother, dtype,
                               col_nbrs=col_nbrs)

    def strips(a, depth):
        """(top, bot, left, right) ppermute halo strips for local
        block a: 'x'-axis strips `depth` deep; 'y'-axis strips 128
        lanes wide in 2D (the strip kernels' lane-aligned DMA
        granularity) / 8 sublanes deep in 3D (the kernels' fixed y
        halo), extended along the first axis so the sequential
        per-axis exchange carries the corners.  left/right are None on
        a single-device-column mesh."""
        top = shift(_lines(a, 0, "hi", depth), "x", +1)
        bot = shift(_lines(a, 0, "lo", depth), "x", -1)
        if a.ndim == 3:
            if not col_nbrs:
                return top, bot, None, None
            # y-edge slices of the z-extended block (only the 8-deep
            # edges are read, never the full concatenation)
            fcol = jnp.concatenate(
                [top[:, -8:], a[:, -8:], bot[:, -8:]], axis=0)
            bcol = jnp.concatenate(
                [top[:, :8], a[:, :8], bot[:, :8]], axis=0)
            return (top, bot, shift(fcol, "y", +1),
                    shift(bcol, "y", -1))
        if not col_nbrs:
            return top, bot, None, None
        # edge columns of the row-extended block, WITHOUT materializing
        # the (nl + 2*depth, ml) concatenation in HBM (two full array
        # passes) — only the 128-lane edge columns are ever read
        lcol = jnp.concatenate(
            [top[:, -128:], a[:, -128:], bot[:, -128:]], axis=0)
        rcol = jnp.concatenate(
            [top[:, :128], a[:, :128], bot[:, :128]], axis=0)
        left = shift(lcol, "y", +1)
        right = shift(rcol, "y", -1)
        return top, bot, left, right

    def edge_flags():
        ax = jax.lax.axis_index("x")
        ay = jax.lax.axis_index("y")
        return jnp.stack(
            [ax == 0, ax == mesh_sizes["x"] - 1,
             ay == 0, ay == mesh_sizes["y"] - 1]).astype(jnp.int32)

    def cycle(u, f, h, global_size, fine_level, want_r2=False):
        """want_r2: also return the LOCAL sum of the result's squared
        residual as an f32 scalar (fused into the up-leg strip kernel
        when the Pallas plan is live — free stop='residual' under the
        explicit partition), or None when no fused path produced it
        (caller falls back to a separate residual pass)."""
        bc = "ghost0" if fine_level else spec.coarse_bc

        if global_size <= spec.replicate_below \
                or not shardable(global_size // 2):
            # replicated handoff: gather once, run the remaining subtree
            # redundantly on every device, slice back
            u_full = gather_full(u)
            f_full = gather_full(f)
            u_full = _replicated_cycle(u_full, f_full, h, spec, gamma,
                                       fine_level, None)
            u = slice_local(u_full, u.shape)
            return (u, None) if want_r2 else u

        plan = level_plan(u.shape, u.dtype)
        if plan is not None:
            from mgpoisson.kernels import pallas as pk
            h8 = plan[0]
            cdepth = plan[3] if ndim == 3 else 8
            rr = pk.smooth_rr_sharded3 if ndim == 3 \
                else pk.smooth_rr_sharded
            pc = pk.pc_smooth_sharded3 if ndim == 3 \
                else pk.pc_smooth_sharded
            fl = edge_flags()
            fstrips = strips(f, h8)       # f is level-invariant: once
            ustrips = strips(u, h8)
            u, R = rr(
                u, f, ustrips, fstrips, fl, h, spec.nu_pre, smoother,
                bc, plan=plan)
            V = jnp.zeros_like(R)
            for _ in range(gamma):
                V = cycle(V, R, 2 * h, global_size // 2, False)
            vstrips = strips(V, cdepth)   # coarse exchange depth
            ustrips = strips(u, h8)       # u changed: re-exchange
            out = pc(
                u, f, V, ustrips, fstrips, vstrips, fl, h,
                spec.nu_post, smoother, bc, spec.prolong_kind,
                plan=plan, rnorm=want_r2)
            if want_r2:
                u, racc = out
                return u, jnp.sum(racc)
            return out

        # exchange the level-invariant RHS halo ONCE for both phases
        rmax = _RADIUS * max(spec.nu_pre, spec.nu_post)
        fe = deep_halos(f, rmax) \
            if rmax > 0 and _deep_ok(u, rmax) else None
        u = smooth_phase(u, f, h, spec.nu_pre, bc, fe, rmax)
        R = xla.restrict(residual(u, f, h, bc))   # local 2^ndim blocks
        V = jnp.zeros_like(R)
        for _ in range(gamma):
            V = cycle(V, R, 2 * h, global_size // 2, False)
        u = prolong_correct(u, V, spec.prolong_kind)
        u = smooth_phase(u, f, h, spec.nu_post, bc, fe, rmax)
        return (u, None) if want_r2 else u

    def step_local(psi, f):
        """Returns (psi_new, rms_update, residual_norm) — the solver
        picks the stopping metric.  Only the metric spec.stop selects
        is computed (spec.stop is static at build time); the other slot
        is a zero scalar, so stop='update' never pays the extra
        full-grid residual pass and stop='residual' never pays the
        update reduction."""
        zero = jnp.zeros((), psi.dtype)
        if spec.stop == "update":
            psi_new = cycle(psi, f, h0, spec.size, True)
            d = psi_new - psi
            sq = jax.lax.psum(jnp.sum(d * d), ("x", "y"))
            err_upd = jnp.sqrt(sq / (spec.size ** ndim))
            rn = zero
        else:
            # ||r||^2 fused into the up-leg strip kernel when the
            # Pallas plan is live; separate pass only on fallbacks
            psi_new, r2l = cycle(psi, f, h0, spec.size, True,
                                 want_r2=True)
            err_upd = zero
            if r2l is None:
                r = residual(psi_new, f, h0, "ghost0")
                r2l = jnp.sum(r * r)
            # accumulate in at least f32 (unifies the bf16 Pallas racc)
            # but never BELOW the solve dtype — an f64 solve's stopping
            # metric must not round through f32
            acc_dt = jnp.promote_types(r2l.dtype, jnp.float32)
            rn = jnp.sqrt(jax.lax.psum(r2l.astype(acc_dt),
                                       ("x", "y"))).astype(psi.dtype)
        return psi_new, err_upd, rn

    # -------- mixed-precision refinement step (spec.sweep_dtype) ------
    sweep_dt = None
    if spec.sweep_dtype is not None and \
            jnp.dtype(spec.sweep_dtype) != jnp.dtype(spec.dtype):
        sweep_dt = jnp.dtype(spec.sweep_dtype)

    def step_mixed_local(psi, f):
        """Iterative-refinement step under the explicit partition (the
        shard-local twin of solver/multigrid.py's gspmd mixed step):
        the V-cycle runs on the error equation A e = r entirely in
        sweep_dtype — including the per-shard Pallas strip kernels,
        whose plan re-resolves for the narrower dtype — while the
        residual, correction, and stopping metric stay in dtype.  All
        extra work is elementwise plus the one halo exchange `residual`
        already performs.  With stop='residual' the reported err is
        ||r|| of the INCOMING iterate (same convention as the gspmd
        path: the residual is in hand before the correction)."""
        zero = jnp.zeros((), psi.dtype)
        r = residual(psi, f, h0, "ghost0")
        e = cycle(jnp.zeros(r.shape, sweep_dt), r.astype(sweep_dt),
                  h0, spec.size, True)
        psi_new = psi + e.astype(psi.dtype)
        if spec.stop == "residual":
            acc = jnp.promote_types(psi.dtype, jnp.float32)
            ra = r.astype(acc)
            rn = jnp.sqrt(jax.lax.psum(jnp.sum(ra * ra), ("x", "y"))
                          ).astype(psi.dtype)
            err_upd = zero
        else:
            d = psi_new - psi
            sq = jax.lax.psum(jnp.sum(d * d), ("x", "y"))
            err_upd = jnp.sqrt(sq / (spec.size ** ndim))
            rn = zero
        return psi_new, err_upd, rn

    # -------- packed-persistent fine level under the partition --------
    # The packed-persistent fine level (mgpoisson.cycle.packed) composed
    # with the explicit partition, on ROW-SHARDED meshes: pack_grid is
    # row-preserving and lane-local, so with columns unsharded a
    # globally packed array is exactly a per-shard packed array.  The
    # solver packs psi/f once per solve; the fine level runs the packed
    # strip kernels (kernels/pallas.py packed_rr_sharded /
    # packed_pc_sharded) with 8-deep PACKED row strips exchanged by the
    # same ppermute as the unpacked path, and the coarse subtree runs
    # the existing sharded cycle on the UNPACKED coarse rhs the packed
    # down-leg emits (same structure as the single-device
    # make_packed_cycle).

    def _packed_plan():
        if not pallas_on or ndim != 2 or smoother != "rbgs":
            return None
        if mesh_sizes["y"] != 1:
            return None
        if not (1 <= spec.nu_pre <= 3 and 1 <= spec.nu_post <= 3):
            return None
        # the fine level must actually run sharded (no replicated
        # handoff at the top) for the packed strip kernels to own it
        if spec.size <= spec.replicate_below \
                or not shardable(spec.size) \
                or not shardable(spec.size // 2):
            return None
        from mgpoisson.kernels import pallas as pk
        local = (spec.size // mesh_sizes["x"], spec.size)
        return pk.packed_sharded_plan(
            local, max(spec.nu_pre, spec.nu_post),
            jnp.dtype(spec.dtype).itemsize)

    packed_plan = _packed_plan()

    def cycle_packed(pp, fp, want_r2=False):
        """One cycle over PACKED local fine state (pp, fp); returns
        (pp', local sum(r^2) or None)."""
        from mgpoisson.kernels import pallas as pk
        fl = edge_flags()
        d = packed_plan[0]
        fstrips = strips(fp, d)
        ustrips = strips(pp, d)
        pp, R = pk.packed_rr_sharded(pp, fp, ustrips, fstrips, fl, h0,
                                     spec.nu_pre, plan=packed_plan)
        V = jnp.zeros_like(R)
        for _ in range(gamma):
            V = cycle(V, R, 2 * h0, spec.size // 2, False)
        vstrips = strips(V, 8)
        ustrips = strips(pp, d)
        out = pk.packed_pc_sharded(pp, fp, V, ustrips, fstrips,
                                   vstrips, fl, h0, spec.nu_post,
                                   spec.prolong_kind, plan=packed_plan,
                                   rnorm=want_r2)
        if want_r2:
            ppn, racc = out
            return ppn, jnp.sum(racc)
        return out, None

    def step_local_packed(pp, fp):
        """The packed twin of step_local; update-RMS is permutation-
        invariant, so the packed difference gives the exact metric."""
        zero = jnp.zeros((), pp.dtype)
        if spec.stop == "update":
            ppn, _ = cycle_packed(pp, fp)
            dl = ppn - pp
            sq = jax.lax.psum(jnp.sum(dl * dl), ("x", "y"))
            return ppn, jnp.sqrt(sq / (spec.size ** ndim)), zero
        ppn, r2l = cycle_packed(pp, fp, want_r2=True)
        rn = jnp.sqrt(jax.lax.psum(r2l, ("x", "y"))).astype(pp.dtype)
        return ppn, zero, rn

    def cycle_plain_local_packed(pp, fp):
        return cycle_packed(pp, fp)[0]

    def cycle_rnorm_local_packed(pp, fp):
        ppn, r2l = cycle_packed(pp, fp, want_r2=True)
        return ppn, jax.lax.psum(r2l, ("x", "y"))

    # -------- bare cycles for the adaptive solve loop ------------------
    def cycle_plain_local(psi, f):
        return cycle(psi, f, h0, spec.size, True)

    def cycle_rnorm_local(psi, f):
        psi_new, r2l = cycle(psi, f, h0, spec.size, True, want_r2=True)
        if r2l is None:
            r = residual(psi_new, f, h0, "ghost0")
            r2l = jnp.sum(r * r)
        acc_dt = jnp.promote_types(r2l.dtype, jnp.float32)
        return psi_new, jax.lax.psum(r2l.astype(acc_dt), ("x", "y"))

    def fmg_local(f):
        """Full-multigrid initialization (`cycle/vcycle.py::fmg`) under
        the explicit partition: restrict f shard-locally down to the
        replicated-handoff level, gather once, finish the down sweep and
        coarse solve replicated, then prolong back up — slicing local at
        the handoff — with one sharded V-cycle per sharded level."""
        # down sweep: (f_block, h, global_size, sharded?) finest first
        g, h, cur = spec.size, h0, f
        shd = g > spec.replicate_below and shardable(g)
        if not shd:
            cur = gather_full(cur)
        levels = [(cur, h, g, shd)]
        while g > spec.coarse_size:
            gn = g // 2
            if shd and (gn <= spec.replicate_below or not shardable(gn)):
                cur = gather_full(cur)
                shd = False
            cur = xla.restrict(cur)            # local 2^ndim blocks
            g, h = gn, 2 * h
            levels.append((cur, h, g, shd))

        fL, hL, gL, shdL = levels[-1]
        if shdL:                                # only if size == coarse_size
            fL = gather_full(fL)
        bcL = "ghost0" if len(levels) == 1 else spec.coarse_bc
        u = xla.coarse_solve(jnp.zeros_like(fL), fL, hL, smoother, bcL)
        if shdL:
            u = slice_local(u, levels[-1][0].shape)

        for lvl in range(len(levels) - 2, -1, -1):
            f_l, h_l, g_l, shd_l = levels[lvl]
            shd_child = levels[lvl + 1][3]
            if shd_l and not shd_child:
                # replicated -> sharded handoff: prolong the full coarse
                # solution, then keep only this device's block
                u = xla.prolong(u, spec.prolong_kind)
                u = slice_local(u, f_l.shape)
            elif shd_l:
                u = prolong_correct(jnp.zeros_like(f_l), u,
                                    spec.prolong_kind)
            else:
                u = xla.prolong(u, spec.prolong_kind)
            fine = lvl == 0
            if shd_l:
                u = cycle(u, f_l, h_l, g_l, fine)
            else:
                u = _replicated_cycle(u, f_l, h_l, spec, 1, fine, None)
        if not levels[0][3]:
            # finest level ran replicated (size <= replicate_below or
            # unshardable on this mesh): u is the FULL grid here, but
            # the shard_map out_spec expects this device's local block
            u = slice_local(u, f.shape)
        return u

    pspec = P(*(_AXIS_NAMES[ax] for ax in sharded_axes),
              *([None] * (ndim - len(sharded_axes))))
    return {"step_local": step_local, "fmg_local": fmg_local,
            "step_mixed_local": step_mixed_local,
            "cycle_plain_local": cycle_plain_local,
            "cycle_rnorm_local": cycle_rnorm_local,
            "packed_plan": packed_plan,
            "step_local_packed": step_local_packed,
            "cycle_plain_local_packed": cycle_plain_local_packed,
            "cycle_rnorm_local_packed": cycle_rnorm_local_packed,
            "pspec": pspec}


def build_spmd_step(spec, mesh, mixed: bool = False):
    """step(psi, f) -> (psi_new, rms_update, residual_norm) with the
    whole V-cycle inside one shard_map.  mixed=True selects the
    sweep_dtype iterative-refinement step (spec.sweep_dtype set)."""
    parts = _build_parts(spec, mesh)
    pspec = parts["pspec"]
    fn = parts["step_mixed_local"] if mixed else parts["step_local"]
    return jax.shard_map(fn, mesh=mesh,
                         in_specs=(pspec, pspec),
                         out_specs=(pspec, P(), P()),
                         check_vma=False)


def build_spmd_cycles(spec, mesh):
    """(plain, rnorm) global-array cycle functions for the adaptive
    solve loop (stop_check='adaptive' under the explicit partition):
    plain(psi, f) -> psi_new runs the metric-free V-cycle; rnorm
    additionally returns the psum'd global sum(r^2) — fused into the
    up-leg strip kernel when the Pallas plan is live."""
    parts = _build_parts(spec, mesh)
    pspec = parts["pspec"]
    plain = jax.shard_map(parts["cycle_plain_local"], mesh=mesh,
                          in_specs=(pspec, pspec), out_specs=pspec,
                          check_vma=False)
    rnorm = jax.shard_map(parts["cycle_rnorm_local"], mesh=mesh,
                          in_specs=(pspec, pspec),
                          out_specs=(pspec, P()), check_vma=False)
    return plain, rnorm


def spmd_packed_plan(spec, mesh):
    """The packed-persistent stripe plan under this mesh, or None —
    row-sharded meshes only (see the packed sharded section of
    kernels/pallas.py).  Cheap: builds closures, compiles nothing."""
    return _build_parts(spec, mesh)["packed_plan"]


def build_spmd_step_packed(spec, mesh):
    """step(pp, fp) -> (pp_new, rms_update, residual_norm) over PACKED
    global state (the solver packs/unpacks at the solve boundary)."""
    parts = _build_parts(spec, mesh)
    if parts["packed_plan"] is None:
        raise ValueError("packed-persistent spmd path unsupported for "
                         "this spec/mesh (row-sharded f32 rbgs only)")
    pspec = parts["pspec"]
    return jax.shard_map(parts["step_local_packed"], mesh=mesh,
                         in_specs=(pspec, pspec),
                         out_specs=(pspec, P(), P()),
                         check_vma=False)


def build_spmd_cycles_packed(spec, mesh):
    """(plain, rnorm) cycle functions over PACKED global state for the
    adaptive solve loop under the explicit partition."""
    parts = _build_parts(spec, mesh)
    if parts["packed_plan"] is None:
        raise ValueError("packed-persistent spmd path unsupported for "
                         "this spec/mesh (row-sharded f32 rbgs only)")
    pspec = parts["pspec"]
    plain = jax.shard_map(parts["cycle_plain_local_packed"], mesh=mesh,
                          in_specs=(pspec, pspec), out_specs=pspec,
                          check_vma=False)
    rnorm = jax.shard_map(parts["cycle_rnorm_local_packed"], mesh=mesh,
                          in_specs=(pspec, pspec),
                          out_specs=(pspec, P()), check_vma=False)
    return plain, rnorm


def build_spmd_fmg(spec, mesh):
    """fmg(f) -> u0: full-multigrid initialization under the explicit
    partition (sharded fine levels, replicated coarse subtree)."""
    parts = _build_parts(spec, mesh)
    pspec = parts["pspec"]
    return jax.shard_map(parts["fmg_local"], mesh=mesh,
                         in_specs=(pspec,), out_specs=pspec,
                         check_vma=False)
