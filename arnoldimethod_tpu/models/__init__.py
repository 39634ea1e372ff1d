from .operators import (
    BsrOperator,
    DenseOperator,
    DiaOperator,
    EllOperator,
    FunctionOperator,
    LinearOperator,
    ShiftInvertDenseOperator,
    Stencil5Operator,
    as_operator,
    csr_to_ell,
    dense_to_bsr,
    dia_from_diagonals,
)
from .problems import convection_diffusion_2d, laplacian_1d, laplacian_2d, tridiagonal

__all__ = [
    "LinearOperator",
    "DenseOperator",
    "BsrOperator",
    "dense_to_bsr",
    "DiaOperator",
    "dia_from_diagonals",
    "EllOperator",
    "FunctionOperator",
    "ShiftInvertDenseOperator",
    "Stencil5Operator",
    "as_operator",
    "csr_to_ell",
    "laplacian_1d",
    "laplacian_2d",
    "tridiagonal",
    "convection_diffusion_2d",
]
