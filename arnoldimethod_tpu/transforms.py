"""Spectral transformations: the reference's documented user-side recipes
(docs/src/index.md:230-352) as first-class operators.

  * shift-and-invert for interior / smallest eigenvalues
    (ShiftInvertDenseOperator in models.operators);
  * shift-and-invert for the generalized problem A x = B x lambda
    (GeneralizedShiftInvertOperator, docs recipe :262-304);
  * B-inner-product Schur decomposition for s.p.d. B via Cholesky
    (BInnerProductOperator, docs recipe :306-352).

All matvecs are jit-traceable (triangular solves on device); the
eigenvalue back-maps are provided as methods so user code stays one-liner.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class

from .models.operators import LinearOperator

__all__ = ["GeneralizedShiftInvertOperator", "BInnerProductOperator"]


@register_pytree_node_class
class GeneralizedShiftInvertOperator(LinearOperator):
    """x -> (A - sigma B)^{-1} B x for the generalized problem
    A x = B x lambda: eigenvalues transform as theta = 1/(lambda - sigma),
    so target which='LM' and map back with `eigenvalues_back`
    (ref: docs/src/index.md:262-304)."""

    def __init__(self, lu, piv, B, sigma, shape):
        self.lu = lu
        self.piv = piv
        self.B = B
        self.sigma = sigma
        self.shape = tuple(shape)
        self.dtype = lu.dtype

    @classmethod
    def build(cls, A, B, sigma=0.0):
        A = jnp.asarray(A)
        B = jnp.asarray(B)
        dtype = jnp.result_type(A.dtype, B.dtype, type(sigma))
        M = A.astype(dtype) - sigma * B.astype(dtype)
        lu, piv = jax.scipy.linalg.lu_factor(M)
        return cls(lu, piv, B.astype(dtype), sigma, A.shape)

    def matvec(self, x):
        return jax.scipy.linalg.lu_solve(
            (self.lu, self.piv),
            jnp.matmul(self.B, x, precision=jax.lax.Precision.HIGHEST),
        )

    def eigenvalues_back(self, thetas):
        """Map the transformed eigenvalues theta back to lambda."""
        return self.sigma + 1.0 / thetas

    def tree_flatten(self):
        return (self.lu, self.piv, self.B, self.sigma), (self.shape, self.dtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.lu, obj.piv, obj.B, obj.sigma = children
        obj.shape, obj.dtype = aux
        return obj


@register_pytree_node_class
class BInnerProductOperator(LinearOperator):
    """C = L^{-H} A L^{-1} where B = L L^H (Cholesky): a standard Schur
    decomposition C Y = Y R yields a B-orthonormal partial Schur
    decomposition of the pencil — Q = L^{-H} Y satisfies Q^H A Q = R and
    Q^H B Q = I (ref: docs/src/index.md:306-352)."""

    def __init__(self, A, L, shape):
        self.A = A
        self.L = L
        self.shape = tuple(shape)
        self.dtype = A.dtype

    @classmethod
    def build(cls, A, B):
        A = jnp.asarray(A)
        B = jnp.asarray(B)
        dtype = jnp.result_type(A.dtype, B.dtype)
        L = jnp.linalg.cholesky(B.astype(dtype))
        return cls(A.astype(dtype), L, A.shape)

    def matvec(self, x):
        t = jax.scipy.linalg.solve_triangular(self.L, x, lower=True)
        t = jnp.matmul(self.A, t, precision=jax.lax.Precision.HIGHEST)
        return jax.scipy.linalg.solve_triangular(
            self.L.conj().T, t, lower=False
        )

    def recover_q(self, Y):
        """Map Schur vectors Y of C back to B-orthonormal vectors Q of the
        original pencil: Q = L^{-H} Y."""
        return jax.scipy.linalg.solve_triangular(
            self.L.conj().T, Y, lower=False
        )

    def tree_flatten(self):
        return (self.A, self.L), (self.shape, self.dtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.A, obj.L = children
        obj.shape, obj.dtype = aux
        return obj
