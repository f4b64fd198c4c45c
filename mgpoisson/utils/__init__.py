from mgpoisson.utils.debug import (check_finite, compare_traces, dump_trace,
                                   validate_cycle)
from mgpoisson.utils.checkpoint import save_state, load_state

__all__ = ["check_finite", "compare_traces", "dump_trace", "validate_cycle",
           "save_state", "load_state"]
