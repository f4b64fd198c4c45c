from mgpoisson.solver.multigrid import MultigridPoisson, SolveResult

__all__ = ["MultigridPoisson", "SolveResult"]
