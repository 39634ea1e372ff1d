from .operators import (
    DenseOperator,
    EllOperator,
    FunctionOperator,
    LinearOperator,
    ShiftInvertDenseOperator,
    as_operator,
    csr_to_ell,
)
from .problems import convection_diffusion_2d, laplacian_1d, laplacian_2d, tridiagonal

__all__ = [
    "LinearOperator",
    "DenseOperator",
    "EllOperator",
    "FunctionOperator",
    "ShiftInvertDenseOperator",
    "as_operator",
    "csr_to_ell",
    "laplacian_1d",
    "laplacian_2d",
    "tridiagonal",
    "convection_diffusion_2d",
]
