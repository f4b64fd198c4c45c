from mgpoisson.compare.krylov import cg, bicgstab, conjugate_residual

__all__ = ["cg", "bicgstab", "conjugate_residual"]
