"""Kernel layer: the grid-point operations of the reference's L1
(OpenCL kernels `gpu.lua:37-202`, FFI loops `cpu-raw.lua:8-114`),
implemented two ways behind one interface:

- `mgpoisson.kernels.xla`   — pure jnp, rank-polymorphic (2D/3D), runs
  anywhere; XLA fuses the pad/shift stencils.
- `mgpoisson.kernels.pallas`— TPU Pallas kernels for the hot 2D path:
  fused multi-sweep smoothers (one HBM round-trip for all nu sweeps)
  and fused residual+restrict.

`get_ops(spec, level_size)` picks the backend per level: Pallas on TPU
for levels at least `spec.pallas_min_size` wide, XLA otherwise — the
TPU analog of the reference hybrid's cpuDepth switch (`cpu-gpu.lua:17-52`).
"""

from __future__ import annotations

import jax

from mgpoisson.kernels import xla


def _tpu_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def get_ops(spec, level_size: int):
    """Return the op module to use for a level of side `level_size`."""
    if spec.backend == "xla":
        return xla
    if spec.smoother_resolved == "gs_lex":
        # sequential scan smoother — XLA-only by construction
        return xla
    if spec.mesh_shape is not None:
        # Under a device mesh the GSPMD partitioner cannot split a
        # pallas_call (no partitioning rule for the custom call), so a
        # sharded operand would be all-gathered onto one device — worse
        # than the XLA ops it replaces.  Force the XLA formulations,
        # whose stencils partition cleanly (halo collectives inserted
        # by XLA).  This fence applies to the GSPMD path only: the
        # explicit partition (spec.partition='spmd') runs the fused
        # strip kernels per shard inside shard_map — see
        # mgpoisson.shard.spmd (it dispatches itself, not via get_ops).
        return xla
    if spec.ndim == 3:
        # 3D: the fused multi-sweep smoother is Pallas (the other ops
        # delegate to XLA inside the module); size gating happens in
        # pallas._supported3 by total bytes, so level_size isn't
        # compared against pallas_min_size here
        if spec.backend == "pallas" or (
                spec.backend == "auto" and _tpu_available()):
            from mgpoisson.kernels import pallas as pallas_ops
            return pallas_ops
        return xla
    if spec.ndim != 2:
        return xla
    use_pallas = spec.backend == "pallas" or (
        spec.backend == "auto"
        and _tpu_available()
        and level_size >= spec.pallas_min_size
    )
    if use_pallas:
        from mgpoisson.kernels import pallas as pallas_ops
        return pallas_ops
    return xla
