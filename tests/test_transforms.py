"""Spectral transformation recipes, mirroring the reference's worked docs
examples (docs/src/index.md:234-352): shift-invert, generalized
shift-invert, and the B-inner-product Schur decomposition."""

import numpy as np
import jax.numpy as jnp

from arnoldimethod_tpu import partial_eigen, partial_schur
from arnoldimethod_tpu.transforms import (
    BInnerProductOperator,
    GeneralizedShiftInvertOperator,
)


def test_generalized_shift_invert():
    """A x = B x lambda via (A)^{-1} B, nev=4, tol=1e-5: residual
    ||A X - B X diag(lams)|| small (docs example gives 2.8e-6)."""
    rng = np.random.default_rng(42)
    A = rng.standard_normal((100, 100))
    B = rng.standard_normal((100, 100))

    op = GeneralizedShiftInvertOperator.build(A, B, sigma=0.0)
    decomp, history = partial_schur(op, nev=4, which="LM", tol=1e-5, restarts=100)
    assert history.converged

    thetas, X = partial_eigen(decomp)
    lams = np.asarray(op.eigenvalues_back(thetas))
    X = np.asarray(X)
    resid = np.linalg.norm(A @ X - B @ X @ np.diag(lams))
    assert resid < 1e-4


def test_b_inner_product_schur():
    """Q^H A Q = R with Q^H B Q = I for s.p.d. B (docs example residuals
    3.9e-14 / 3.2e-15)."""
    rng = np.random.default_rng(7)
    A = rng.standard_normal((100, 100))
    B = np.diag(np.linspace(1.0, 2.0, 100))

    op = BInnerProductOperator.build(A, B)
    decomp, history = partial_schur(op, nev=4, which="LM", tol=1e-10)
    assert history.converged

    Q = np.asarray(op.recover_q(decomp.Q))
    R = np.asarray(decomp.R)
    assert np.linalg.norm(Q.T @ A @ Q - R) < 1e-8
    assert np.linalg.norm(Q.T @ B @ Q - np.eye(4)) < 1e-10


def test_b_inner_product_symmetric_gives_eigen():
    """If A is also symmetric, R is diagonal and Q holds B-orthonormal
    eigenvectors of the pencil."""
    rng = np.random.default_rng(8)
    A = rng.standard_normal((60, 60))
    A = (A + A.T) / 2
    B = np.diag(np.linspace(0.5, 3.0, 60))

    op = BInnerProductOperator.build(A, B)
    decomp, history = partial_schur(op, nev=3, which="LM", tol=1e-10)
    assert history.converged
    R = np.asarray(decomp.R)
    assert np.linalg.norm(R - np.diag(np.diag(R))) < 1e-7

    Q = np.asarray(op.recover_q(decomp.Q))
    lams = np.diag(R)
    resid = np.linalg.norm(A @ Q - B @ Q @ np.diag(lams))
    assert resid < 1e-7 * np.linalg.norm(A)
