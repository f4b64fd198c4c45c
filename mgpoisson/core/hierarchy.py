"""Grid hierarchy bookkeeping.

The reference pre-allocates per-level buffers keyed by side length
(``rs/Rs/vs/Vs[L]`` for L = 1, 2, 4, ..., size, `cpu-raw.lua:155-171`,
`gpu.lua:222-232`).  Under jit the hierarchy is instead a *static* tuple
of shapes: the V-cycle unrolls over it at trace time (shapes differ per
level, so no dynamic loop is possible — SURVEY.md section 7 'hard parts').
"""

from __future__ import annotations

from typing import List, Tuple


def num_levels(size: int, coarse_size: int = 1) -> int:
    """Number of levels from side `size` down to side `coarse_size` inclusive."""
    n = 1
    s = size
    while s > coarse_size:
        s //= 2
        n += 1
    return n


def level_sizes(size: int, coarse_size: int = 1) -> List[int]:
    """Side lengths fine -> coarse: [size, size/2, ..., coarse_size]."""
    out = [size]
    while out[-1] > coarse_size:
        out.append(out[-1] // 2)
    return out


def level_spacings(size: int, fine_h: float, coarse_size: int = 1) -> List[float]:
    """Grid spacing per level; h doubles as the side halves (`cpu.lua:139`)."""
    return [fine_h * (2 ** i) for i in range(num_levels(size, coarse_size))]


def level_shapes(size: int, ndim: int, coarse_size: int = 1) -> List[Tuple[int, ...]]:
    return [(s,) * ndim for s in level_sizes(size, coarse_size)]
