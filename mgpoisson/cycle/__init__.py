from mgpoisson.cycle.vcycle import v_cycle, w_cycle, fmg, make_cycle

__all__ = ["v_cycle", "w_cycle", "fmg", "make_cycle"]
