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
    "estimate_interval",
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

    def __init__(self, op, a, b, degree, scale_point=None):
        """scale_point: a point at (or slightly above) the spectrum's lower
        edge.  When given, the SCALED three-term recurrence
        y_{k+1} = 2 sigma_{k+1} L y_k - sigma_k sigma_{k+1} y_{k-1}
        (Zhou & Saad's Chebyshev-Davidson normalization) divides every
        iterate by T_k(t(scale_point)), so |p| stays ~<= 1 across the whole
        spectrum instead of growing like cosh(degree * acosh|t|) — without
        it, float32 overflows for degrees past a few hundred whenever the
        interval estimate is loose.  Relative amplification (what drives
        convergence) is unchanged.  None = unscaled T_k (exact Chebyshev
        values, fine for small degrees / float64)."""
        self.op = as_operator(op)
        self.a = float(a)
        self.b = float(b)
        self.degree = int(degree)
        self.scale_point = None if scale_point is None else float(scale_point)
        self.shape = self.op.shape
        self.dtype = self.op.dtype

    def matvec(self, x):
        c = (self.a + self.b) / 2
        e = (self.b - self.a) / 2

        def L(v):
            return (self.op.matvec(v) - c * v) * (1.0 / e)

        if self.scale_point is None:
            t0, t1 = x, L(x)

            def body(i, carry):
                tkm1, tk = carry
                return tk, 2.0 * L(tk) - tkm1

            _, t = lax.fori_loop(0, self.degree - 1, body, (t0, t1))
            return t

        # Scaled recurrence: carry sigma_k = T_{k-1}(t0)/T_k(t0) via
        # 1/sigma_{k+1} = 2 t0 - sigma_k (never materializing T_k itself).
        t0v = (self.scale_point - c) / e
        sig1 = 1.0 / t0v
        y0, y1 = x, sig1 * L(x)

        def body(i, carry):
            ykm1, yk, sig = carry
            sig_next = 1.0 / (2.0 * t0v - sig)
            y_next = 2.0 * sig_next * L(yk) - sig * sig_next * ykm1
            return yk, y_next, sig_next

        _, y, _ = lax.fori_loop(
            0, self.degree - 1, body, (y0, y1, jnp.asarray(sig1, self.dtype))
        )
        return y

    def tree_flatten(self):
        # a/b/scale_point are LEAVES (traced): re-tightening the interval
        # (estimate_interval's refinement rounds) must not recompile the
        # degree-`degree` filter program.
        return (self.op, self.a, self.b, self.scale_point), (self.degree,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.op, obj.a, obj.b, obj.scale_point = children
        (obj.degree,) = aux
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


def estimate_interval(A, nev, maxdim=None, safety=3.0, seed=0, b_iters=30,
                      refine=2, refine_degree=100):
    """Damping interval for ChebyshevFilterOperator computed from solver
    outputs only — no knowledge of the spectrum required.  Returns a
    namedtuple (a, b, lo):

      b:  upper bound on the spectral radius via `power_bound`;
      lo: estimate of the spectrum's lower edge — pass it as the filter's
          `scale_point` so high degrees cannot overflow;
      a:  the lower damping edge, placed `safety` x the estimated width
          of the wanted band above `lo`.

    The first (lo, a) guess comes from one coarse m-step Arnoldi pass
    (m ~ 2*nev + 10): for symmetric A the Ritz values interlace the
    spectrum, so the nev-th smallest Ritz value >= lambda_nev.  On large
    problems that coarse guess overestimates the band by orders of
    magnitude (the interval edge then sits deep inside the spectrum and
    the filter separates nothing), so `refine` rounds of Chebyshev
    FILTERED subspace iteration follow: apply a moderate-degree scaled
    filter to a random (nev+5)-block, orthonormalize, Rayleigh-Ritz on A,
    and re-tighten (lo, a) from the improved eigenvalue estimates — the
    standard ChebFSI bootstrap.  Each round costs ~(nev+5)*refine_degree
    streaming matvecs inside a handful of dispatches.

    Cost: b_iters + m + refine*(nev+5)*refine_degree matvecs.
    Recipe: docs/transforms.md.
    """
    import collections

    import numpy as np

    from .ops.expansion import expand_range_impl, set_initial_vector

    Interval = collections.namedtuple("Interval", ["a", "b", "lo"])
    op = as_operator(A)
    b = power_bound(op, iters=b_iters, seed=seed)
    m = int(maxdim or min(max(2 * nev + 10, 30), op.shape[0]))
    n = op.shape[0]
    key = jax.random.PRNGKey(seed)
    V = jnp.zeros((m + 1, n), dtype=op.dtype)
    H = jnp.zeros((m + 1, m), dtype=op.dtype)
    V = set_initial_vector(V, jax.random.normal(key, (n,), dtype=op.dtype))
    _, H = expand_range_impl(op, V, H, 0, m, key)
    ritz = np.sort(np.linalg.eigvals(np.asarray(H[:m, :m], np.float64)).real)
    lo, theta = ritz[0], ritz[min(nev, m) - 1]

    def edge(lo, theta):
        a = lo + safety * (theta - lo)
        if not a < b:  # degenerate (flat) estimate: damp the top half
            a = lo + 0.5 * (b - lo)
        return a

    a = edge(lo, theta)
    k = min(nev + 5, n)
    X = jax.random.normal(jax.random.fold_in(key, 1), (n, k), dtype=op.dtype)
    # lax.map, not vmap: Pallas kernels with resident (ANY/VMEM) operands
    # do not batch, and sequential filtered matvecs inside one dispatch
    # are exactly as HBM-bound as a batched one would be.
    filt = jax.jit(lambda fop, X: lax.map(fop.matvec, X.T).T)
    for _ in range(refine):
        fop = ChebyshevFilterOperator(op, a, b, refine_degree, scale_point=lo)
        Q, _ = jnp.linalg.qr(filt(fop, X))
        w, _, _ = rayleigh_ritz(op, Q)
        w = np.sort(np.asarray(w).real)
        lo, theta = min(lo, w[0]), w[min(nev, k) - 1]
        a = edge(lo, theta)
        X = Q
    return Interval(float(a), float(b), float(lo))


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
