"""Right-hand-side constructors and initial guess.

Reference semantics (`gpu.lua:41-59` `init` kernel; FFI twin
`cpu-raw.lua:8-20`; matrix twin `cpu.lua:182-193`):

    f[i,j]  = -charge/epsilon0 = -1e6 at the single center cell
              (center = size // 2, 0-based), 0 elsewhere
    psi0    = -f
"""

from __future__ import annotations

import jax.numpy as jnp

CHARGE = 1.0e6
EPSILON0 = 1.0


def point_charge_rhs(size: int, ndim: int = 2, dtype=jnp.float32,
                     charge: float = CHARGE, epsilon0: float = EPSILON0):
    """Delta-function RHS: -charge/epsilon0 at the center cell, 0 elsewhere."""
    f = jnp.zeros((size,) * ndim, dtype=dtype)
    center = (size // 2,) * ndim
    return f.at[center].set(jnp.asarray(-charge / epsilon0, dtype=dtype))


def initial_guess(f):
    """psi0 = -f (`cpu.lua:193`, `gpu.lua:57`)."""
    return -f
