"""BSR block-sparse operator: XLA fallback and Pallas (interpret) kernels
against a dense reference, and end-to-end through the solver."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arnoldimethod_tpu import partial_schur
from arnoldimethod_tpu.models.operators import dense_to_bsr
from arnoldimethod_tpu.ops.bsr_pallas import bsr_matvec


def _block_matrix(rng, n, B, fill=0.3):
    nb = n // B
    A = np.zeros((n, n))
    for i in range(nb):
        for j in range(nb):
            if i == j or rng.random() < fill:
                A[i * B : (i + 1) * B, j * B : (j + 1) * B] = rng.standard_normal(
                    (B, B)
                )
    return A


@pytest.mark.parametrize("B", [8, 32])
def test_bsr_matvec_matches_dense(B):
    rng = np.random.default_rng(0)
    n = 8 * B
    A = _block_matrix(rng, n, B)
    op = dense_to_bsr(A, B)
    x = rng.standard_normal(n)
    y_ref = A @ x
    y = np.asarray(op.matvec(jnp.asarray(x)))
    assert np.allclose(y, y_ref, atol=1e-10)

    y_pl = np.asarray(
        bsr_matvec(op.block_cols, op.block_data, jnp.asarray(x), interpret=True)
    )
    assert np.allclose(y_pl, y_ref, atol=1e-10)


def test_bsr_through_solver():
    rng = np.random.default_rng(1)
    n, B = 128, 16
    A = _block_matrix(rng, n, B, fill=0.2)
    op = dense_to_bsr(A, B)
    d_bsr, h_bsr = partial_schur(op, nev=4, which="LM", tol=1e-9)
    d_dense, h_dense = partial_schur(A, nev=4, which="LM", tol=1e-9)
    assert h_bsr.converged
    assert h_bsr.mvproducts == h_dense.mvproducts
    assert np.allclose(
        np.sort_complex(d_bsr.eigenvalues), np.sort_complex(d_dense.eigenvalues),
        atol=1e-8,
    )


def test_bsr_requires_divisible_n():
    with pytest.raises(ValueError):
        dense_to_bsr(np.eye(100), 16)
