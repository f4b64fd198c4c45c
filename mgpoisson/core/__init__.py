from mgpoisson.core.spec import Spec
from mgpoisson.core.rhs import point_charge_rhs, initial_guess
from mgpoisson.core.hierarchy import level_sizes, level_spacings, num_levels

__all__ = [
    "Spec",
    "point_charge_rhs",
    "initial_guess",
    "level_sizes",
    "level_spacings",
    "num_levels",
]
