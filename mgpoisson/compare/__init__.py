from mgpoisson.compare.krylov import cg, bicgstab, conjugate_residual, gmres

__all__ = ["cg", "bicgstab", "conjugate_residual", "gmres"]
