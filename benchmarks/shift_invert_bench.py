"""Shift-invert convergence benchmark: n=6000 tridiagonal
(-1, 2, -1.001), nev=10, tol=1e-10, mindim=11, maxdim=22 — the reference's
bench/partial_schur.jl:37-52 configuration (there via a sparse
factorization; here via a dense LU on device)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from arnoldimethod_tpu import ShiftInvertDenseOperator, partial_eigen, partial_schur


def run(n=6000):
    A = (
        np.diag(np.full(n, 2.0))
        + np.diag(np.full(n - 1, -1.0), -1)
        + np.diag(np.full(n - 1, -1.001), 1)
    )

    t0 = time.perf_counter()
    si = ShiftInvertDenseOperator.build(jnp.asarray(A, dtype=jnp.float32), 0.0)
    jax.block_until_ready(si.lu)
    t_fact = time.perf_counter() - t0

    t0 = time.perf_counter()
    decomp, history = partial_schur(
        si, nev=10, which="LM", tol=1e-7, mindim=11, maxdim=22
    )
    jax.block_until_ready(decomp.Q)
    t_solve = time.perf_counter() - t0

    thetas, X = partial_eigen(decomp)
    lams = 1.0 / thetas
    X = np.asarray(X)
    resid = np.linalg.norm(A @ X - X @ np.diag(lams)) / np.linalg.norm(lams)
    print(
        f"n={n}: factorize {t_fact:.2f}s, solve {t_solve:.2f}s, "
        f"{history.mvproducts} matvecs, {history.restarts} restarts, "
        f"relative eig residual {resid:.2e}"
    )


if __name__ == "__main__":
    run()
