"""Explicit SPMD multigrid: shard_map + ppermute halo exchange.

The hand-scheduled counterpart to the GSPMD path (mgpoisson.shard.gspmd):
the whole V-cycle runs inside one `jax.shard_map` over a 2D ('x','y')
mesh, with the communication written out explicitly —

- one-cell halo exchange per smoother sweep / residual via
  `jax.lax.ppermute` neighbor shifts: the nearest-neighbor torus
  pattern ICI is built for (SURVEY.md section 5, the PDE analog of ring
  attention).  Non-wrapping permutes deliver zeros to edge devices,
  which IS the reference's zero-ghost Dirichlet boundary
  (`cpu.lua:28-31`) — the boundary condition falls out of the
  collective's semantics.  Face-Dirichlet (tuned scheme's coarse
  levels) overrides the received halo with -edge on boundary devices.
- restriction and injection prolongation are halo-free (local 2x2
  blocks); bilinear prolongation exchanges one coarse halo cell.
- below spec.replicate_below the level is all-gathered and every device
  redundantly computes the coarse subtree, then slices its shard back —
  the reference hybrid's cpuDepth handoff (`cpu-gpu.lua:17-52`) reborn:
  tiny grids are collective-latency-bound, so stop communicating.
- error reductions are local sums + psum.

2D only (the sharded axes); both schemes and smoothers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mgpoisson.cycle.vcycle import _cycle as _replicated_cycle
from mgpoisson.kernels import xla


def build_spmd_step(spec, mesh):
    """Return step(psi, f) -> (psi_new, rms_update_err, residual_norm)
    with the whole V-cycle inside one shard_map."""
    mx = mesh.shape["x"]
    my = mesh.shape["y"]
    h0 = spec.fine_h
    smoother = spec.smoother_resolved

    def shift(x, axis_name, direction):
        """Neighbor transfer along a mesh axis; zeros arrive at the
        global boundary (non-wrapping permute == zero-ghost bc)."""
        n = mx if axis_name == "x" else my
        if n == 1:
            return jnp.zeros_like(x)
        if direction > 0:      # receive from the lower-index neighbor
            perm = [(i, i + 1) for i in range(n - 1)]
        else:
            perm = [(i + 1, i) for i in range(n - 1)]
        return jax.lax.ppermute(x, axis_name, perm)

    def halos(u, bc):
        top = shift(u[-1:, :], "x", +1)
        bot = shift(u[:1, :], "x", -1)
        lef = shift(u[:, -1:], "y", +1)
        rig = shift(u[:, :1], "y", -1)
        if bc == "face":
            ix = jax.lax.axis_index("x")
            iy = jax.lax.axis_index("y")
            top = jnp.where(ix == 0, -u[:1, :], top)
            bot = jnp.where(ix == mx - 1, -u[-1:, :], bot)
            lef = jnp.where(iy == 0, -u[:, :1], lef)
            rig = jnp.where(iy == my - 1, -u[:, -1:], rig)
        return top, bot, lef, rig

    def nbr(u, bc):
        t, b, l, r = halos(u, bc)
        up = jnp.concatenate([t, u[:-1, :]], axis=0)
        dn = jnp.concatenate([u[1:, :], b], axis=0)
        lf = jnp.concatenate([l, u[:, :-1]], axis=1)
        rt = jnp.concatenate([u[:, 1:], r], axis=1)
        return up + dn + lf + rt

    def sweep(u, f, h, bc):
        hsq = h * h
        adiag = -4.0 / hsq
        if smoother == "jacobi":
            return (f - nbr(u, bc) / hsq) / adiag
        if smoother == "wjacobi":
            omega = 2.0 * u.ndim / (2.0 * u.ndim + 1.0)
            return u + omega * ((f - nbr(u, bc) / hsq) / adiag - u)
        # red-black: local sizes are even, so local parity == global parity
        rows = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, u.shape, 1)
        parity = (rows + cols) % 2
        for p in (0, 1):
            upd = (f - nbr(u, bc) / hsq) / adiag
            u = jnp.where(parity == p, upd, u)
        return u

    def residual(u, f, h, bc):
        hsq = h * h
        return f - (nbr(u, bc) / hsq + (-4.0 / hsq) * u)

    def prolong_correct(u, V, kind):
        if kind == "inject":
            return u + jnp.repeat(jnp.repeat(V, 2, axis=0), 2, axis=1)
        # bilinear with face-adapted global-edge weights: fine-space
        # blend per axis (see kernels/xla.py); the +-2 fine shift needs
        # the neighbor's edge coarse line, fetched with one ppermute
        v = V
        ix = jax.lax.axis_index("x")
        iy = jax.lax.axis_index("y")
        for ax, (axis_name, nmesh, aidx) in enumerate(
                [("x", mx, ix), ("y", my, iy)]):
            R = jnp.repeat(v, 2, axis=ax)
            lo_h = shift(v[-1:, :] if ax == 0 else v[:, -1:], axis_name, +1)
            hi_h = shift(v[:1, :] if ax == 0 else v[:, :1], axis_name, -1)
            lo_h = jnp.repeat(lo_h, 2, axis=ax)   # 2 fine halo lines
            hi_h = jnp.repeat(hi_h, 2, axis=ax)
            if ax == 0:
                Rm = jnp.concatenate([lo_h, R[:-2, :]], axis=0)
                Rp = jnp.concatenate([R[2:, :], hi_h], axis=0)
            else:
                Rm = jnp.concatenate([lo_h, R[:, :-2]], axis=1)
                Rp = jnp.concatenate([R[:, 2:], hi_h], axis=1)
            idx = jax.lax.broadcasted_iota(jnp.int32, R.shape, ax)
            out = 0.75 * R + 0.25 * jnp.where(idx % 2 == 0, Rm, Rp)
            nloc = R.shape[ax]
            first = (aidx == 0) & (idx == 0)
            last = (aidx == nmesh - 1) & (idx == nloc - 1)
            v = jnp.where(first | last, 0.5 * R, out)
        return u + v

    def restrict(r):
        return xla.restrict(r)   # local 2x2 blocks, halo-free

    def gather_full(x):
        full = jax.lax.all_gather(x, "x", axis=0, tiled=True)
        return jax.lax.all_gather(full, "y", axis=1, tiled=True)

    def slice_local(full, nloc, mloc):
        ix = jax.lax.axis_index("x")
        iy = jax.lax.axis_index("y")
        return jax.lax.dynamic_slice(full, (ix * nloc, iy * mloc),
                                     (nloc, mloc))

    def shardable(g):
        # every device keeps an even block of at least 2 cells per axis
        return (g % mx == 0 and g % my == 0
                and g // mx >= 2 and g // my >= 2
                and (g // mx) % 2 == 0 and (g // my) % 2 == 0)

    def cycle(u, f, h, global_size, fine_level):
        bc = "ghost0" if fine_level else spec.coarse_bc

        if global_size <= spec.replicate_below or not shardable(global_size // 2):
            # replicated handoff: gather once, run the remaining subtree
            # redundantly on every device, slice back
            u_full = gather_full(u)
            f_full = gather_full(f)
            u_full = _replicated_cycle(u_full, f_full, h, spec, 1,
                                       fine_level, None)
            return slice_local(u_full, u.shape[0], u.shape[1])

        for _ in range(spec.nu_pre):
            u = sweep(u, f, h, bc)
        R = restrict(residual(u, f, h, bc))
        V = jnp.zeros_like(R)
        V = cycle(V, R, 2 * h, global_size // 2, False)
        u = prolong_correct(u, V, spec.prolong_kind)
        for _ in range(spec.nu_post):
            u = sweep(u, f, h, bc)
        return u

    def step_local(psi, f):
        """Returns (psi_new, rms_update, residual_norm) — the solver
        picks the stopping metric."""
        psi_new = cycle(psi, f, h0, spec.size, True)
        d = psi_new - psi
        sq = jax.lax.psum(jnp.sum(d * d), ("x", "y"))
        err_upd = jnp.sqrt(sq / (spec.size ** spec.ndim))
        r = residual(psi_new, f, h0, "ghost0")
        rn = jnp.sqrt(jax.lax.psum(jnp.sum(r * r), ("x", "y")))
        return psi_new, err_upd, rn

    pspec = P("x", "y")
    return jax.shard_map(step_local, mesh=mesh,
                         in_specs=(pspec, pspec),
                         out_specs=(pspec, P(), P()),
                         check_vma=False)
