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

from jax import lax

from .models.operators import LinearOperator, as_operator

__all__ = [
    "GeneralizedShiftInvertOperator",
    "BInnerProductOperator",
    "ChebyshevFilterOperator",
    "power_bound",
    "rayleigh_ritz",
]


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


@register_pytree_node_class
class ChebyshevFilterOperator(LinearOperator):
    """Chebyshev polynomial filter p(A) = T_k((A - c I)/e), c = (a+b)/2,
    e = (b-a)/2: eigenvalues inside the damping interval [a, b] map into
    [-1, 1], eigenvalues BELOW `a` are amplified like cosh(k*acosh|.|) —
    exponentially in the degree.  Solving p(A) with which='LM' therefore
    targets A's smallest eigenvalues with restart counts that shrink by
    ~the filter's amplification, at `degree` A-matvecs per operator
    application.

    This is the TPU-first acceleration for smallest-eigenvalue problems
    (BASELINE.json config 2): each filtered matvec is `degree` cheap
    streaming SpMVs inside ONE device dispatch (a lax.fori Chebyshev
    three-term recurrence — pure VPU/HBM work), while the restart count —
    the host-latency-bound part — collapses.  The reference has no
    counterpart; shift-invert (docs recipe) is its sequential-hardware
    analogue.

    The filtered operator shares A's invariant subspaces: recover A's
    eigenvalues from the converged Schur vectors with `rayleigh_ritz`.
    """

    def __init__(self, op, a, b, degree):
        self.op = op
        self.a = float(a)
        self.b = float(b)
        self.degree = int(degree)
        self.shape = op.shape
        self.dtype = op.dtype

    def matvec(self, x):
        c = (self.a + self.b) / 2
        e = (self.b - self.a) / 2

        def L(v):
            return (self.op.matvec(v) - c * v) * (1.0 / e)

        t0, t1 = x, L(x)

        def body(i, carry):
            tkm1, tk = carry
            return tk, 2.0 * L(tk) - tkm1

        _, t = lax.fori_loop(0, self.degree - 1, body, (t0, t1))
        return t

    def tree_flatten(self):
        return (self.op,), (self.a, self.b, self.degree)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        (obj.op,) = children
        obj.a, obj.b, obj.degree = aux
        obj.shape = getattr(obj.op, "shape", None)
        obj.dtype = getattr(obj.op, "dtype", None)
        return obj


def power_bound(A, iters=20, seed=0, safety=1.05):
    """Upper bound on the spectral radius by `iters` power iterations with
    a safety factor — the `b` endpoint for ChebyshevFilterOperator."""
    import jax

    op = as_operator(A)
    key = jax.random.PRNGKey(seed)
    v = jax.random.normal(key, (op.shape[0],), dtype=op.dtype)

    def body(i, carry):
        v, _ = carry
        w = op.matvec(v)
        nrm = jnp.linalg.norm(w)
        return w / nrm, nrm

    v, nrm = lax.fori_loop(0, iters, body, (v, jnp.asarray(1.0, op.dtype)))
    return float(nrm) * safety


def rayleigh_ritz(A, Q):
    """Eigenvalues of A restricted to the (filtered-solve) basis Q: solve
    the small dense eigenproblem of Q^H A Q and return (values, vectors,
    residual_norms) with vectors = Q @ S rotated into A's eigenbasis.
    Used to map a ChebyshevFilterOperator solve back to A's spectrum."""
    import numpy as np

    op = as_operator(A)
    AQ = jnp.stack([op.matvec(Q[:, j]) for j in range(Q.shape[1])], axis=1)
    S = jnp.matmul(
        Q.conj().T, AQ, precision=jax.lax.Precision.HIGHEST
    )
    Sh = np.asarray(S, dtype=np.float64)
    w, V = np.linalg.eig(Sh)
    order = np.argsort(w.real)
    w, V = w[order], V[:, order]
    if np.all(np.abs(w.imag) < 1e-10 * (1 + np.abs(w.real))):
        w, V = w.real, V.real
    X = jnp.matmul(Q, jnp.asarray(V, dtype=Q.dtype),
                   precision=jax.lax.Precision.HIGHEST)
    AX = jnp.matmul(AQ, jnp.asarray(V, dtype=Q.dtype),
                    precision=jax.lax.Precision.HIGHEST)
    import numpy as _np

    R = _np.asarray(AX) - _np.asarray(X) * w
    res = _np.linalg.norm(R, axis=0)
    return w, X, res
