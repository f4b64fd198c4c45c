from mgpoisson.compare.krylov import (cg, bicgstab, conjugate_residual,
                                      gmres, pcg, mg_preconditioner)

__all__ = ["cg", "bicgstab", "conjugate_residual", "gmres", "pcg",
           "mg_preconditioner"]
