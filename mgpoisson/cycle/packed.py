"""Packed-persistent V-cycle: the fine level runs entirely in the
checkerboard-packed layout.

The reference's whole design goal was making the smoother sweep the
only per-cycle cost (`gpu.lua:37-202`: everything else is transfers).
This module makes the sweep itself ~2x cheaper: red-black Gauss-Seidel
evaluates the 5-point stencil once per color instead of twice with
half discarded (the where-select form), but realizing that win
requires the state to LIVE in the packed layout — per-call packing
costs ~0.7 ms of MXU selection matmuls at 4096^2 and loses at every
production nu (docs/KERNELS.md).  Here the solver packs psi and f once
per solve (mgpoisson.solver), every fine-level half-cycle runs the
packed Pallas kernels (kernels/pallas.py `_packed_rr_fused` /
`_packed_pc_fused`), and coarse levels run the normal unpacked path —
the restriction output is already unpacked (a sublane pair-sum; coarse
lane == packed lane), and the prolongation input is the unpacked
coarse correction.

Engages automatically (mgpoisson.solver checks `supported(spec)`):
2D, single-device, f32/bf16, rbgs smoother, nu <= 3, fine side with a
striped packed plan.  Force off with MGPOISSON_PACKED=0.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from mgpoisson.cycle import vcycle as _vc
from mgpoisson.kernels import xla as _xla


def _flag() -> str:
    return os.environ.get("MGPOISSON_PACKED", "auto")


def supported(spec) -> bool:
    """True when the solve loop should run the packed-persistent fine
    level.  Mirrors kernels.get_ops' gating plus the packed plan."""
    if _flag() == "0":
        return False
    if spec.ndim != 2 or spec.mesh_shape is not None:
        return False
    if spec.smoother_resolved != "rbgs":
        return False
    if spec.cycle not in ("v", "w", "fmg"):
        return False
    if spec.backend == "xla":
        return False
    if spec.size <= spec.coarse_size or spec.size < spec.pallas_min_size:
        return False
    if jnp.dtype(spec.dtype) not in (jnp.float32, jnp.bfloat16):
        # f32 + bf16: both covered by the on-device compiled parity
        # sweep (bench/parity.py packed cases — default and forced
        # multi-stripe geometries, r5: 135 cases, zero failures; bf16
        # max err ~3e-2 = nu-sweep reorder noise at bf16 precision)
        return False
    from mgpoisson.kernels import _tpu_available
    if spec.backend == "auto" and not _tpu_available() \
            and _flag() != "1":
        return False
    from mgpoisson.kernels import pallas as P
    itemsize = jnp.dtype(spec.dtype).itemsize
    return (P.packed_plan_any(spec.size, spec.nu_pre, itemsize)
            is not None
            and P.packed_plan_any(spec.size, spec.nu_post, itemsize)
            is not None)


def supported_spmd(spec, mesh) -> bool:
    """Packed-persistent fine level under the explicit shard_map
    partition (row-sharded meshes): pack_grid is row-preserving and
    lane-local, so with columns unsharded a globally packed array is
    exactly a per-shard packed array and the strip kernels compose
    (kernels/pallas.py packed sharded section).  Mirrors supported()'s
    gates with the mesh-shape condition replacing single-device."""
    if _flag() == "0":
        return False
    if spec.ndim != 2 or spec.smoother_resolved != "rbgs":
        return False
    if spec.cycle not in ("v", "w", "fmg"):
        return False
    if spec.backend == "xla":
        return False
    if jnp.dtype(spec.dtype) != jnp.float32:
        return False
    if spec.sweep_dtype is not None and \
            jnp.dtype(spec.sweep_dtype) != jnp.dtype(spec.dtype):
        return False
    from mgpoisson.shard.spmd import spmd_packed_plan
    return spmd_packed_plan(spec, mesh) is not None


def pack(u):
    from mgpoisson.kernels import pallas as P
    return P.pack_grid(u)


def unpack(up):
    from mgpoisson.kernels import pallas as P
    return P.unpack_grid(up)


def make_packed_cycle(spec, rnorm: bool = False, constrain=None):
    """Cycle function over PACKED fine-level state: (up, fp, h) -> up'
    (or (up', sum(r^2)) with rnorm).  Coarse levels are the normal
    unpacked `_cycle` recursion — bit-identical to the unpacked solve
    below the fine level; the fine level differs by add-order rounding
    only (tests/test_packed_persistent.py).

    `constrain` (a GSPMD layout-constraint fn) is accepted only to
    reject it loudly: supported() guarantees mesh_shape is None, and a
    caller composing a sharding constraint with the packed layout
    would otherwise have it silently dropped."""
    if constrain is not None:
        raise ValueError("packed-persistent cycle is single-device "
                         "only; cannot compose a sharding constrain "
                         "(Spec.mesh_shape must be None)")
    from mgpoisson.kernels import pallas as P
    gamma = {"v": 1, "fmg": 1, "w": 2}[spec.cycle]

    def cycle(up, fp, h):
        up, Rc = P.packed_smooth_residual_restrict(up, fp, h,
                                                   spec.nu_pre)
        # first coarse visit runs the from-zero down-leg (u=None)
        V = _vc._cycle(None, Rc, 2 * h, spec, gamma, False, None)
        for _ in range(gamma - 1):
            V = _vc._cycle(V, Rc, 2 * h, spec, gamma, False, None)
        if rnorm:
            return P.packed_prolong_correct_smooth_rnorm(
                up, fp, V, h, spec.nu_post, kind=spec.prolong_kind)
        return P.packed_prolong_correct_smooth(
            up, fp, V, h, spec.nu_post, kind=spec.prolong_kind)

    return cycle


def residual_norm_packed(up, fp, h):
    """||r|| from packed state (adaptive stop's stale-exit remeasure:
    rare, so unpack-then-norm is fine)."""
    return _xla.residual_norm(unpack(up), unpack(fp), h)
