"""Shared test helpers, mirroring reference test/utils.jl."""

import numpy as np


def hessenberg_form(A):
    """Reduce A to upper Hessenberg form by Householder similarity (numpy,
    no LAPACK hessenberg needed)."""
    A = np.array(A, copy=True)
    n = A.shape[0]
    for k in range(n - 2):
        x = A[k + 1 :, k].copy()
        if np.linalg.norm(x[1:]) == 0:
            continue
        alpha = x[0]
        nrm = np.linalg.norm(x)
        sign = 1.0 if np.real(alpha) >= 0 else -1.0
        v = x.copy()
        v[0] += sign * nrm * (alpha / abs(alpha) if alpha != 0 else 1.0)
        v /= np.linalg.norm(v)
        # A <- P A P with P = I - 2 v v^H on the trailing block
        A[k + 1 :, k:] -= 2.0 * np.outer(v, v.conj() @ A[k + 1 :, k:])
        A[:, k + 1 :] -= 2.0 * np.outer(A[:, k + 1 :] @ v, v.conj())
    # Flush below-subdiagonal to exactly zero.
    for j in range(n - 2):
        A[j + 2 :, j] = 0
    return A


def normal_hessenberg_matrix(vals, rng, complex_dtype=False):
    """Generate a Hessenberg matrix with prescribed eigenvalues `vals`
    (ref: test/utils.jl:8-33).  For real output with complex conjugate
    pairs, consecutive (lam, conj(lam)) entries become 2x2 rotation
    blocks."""
    vals = np.asarray(vals)
    n = len(vals)
    if complex_dtype or np.iscomplexobj(vals) is False:
        dtype = complex if complex_dtype else float
        X = rng.standard_normal((n, n))
        if complex_dtype:
            X = X + 1j * rng.standard_normal((n, n))
        Q, _ = np.linalg.qr(X)
        A = Q @ np.diag(vals.astype(dtype)) @ Q.conj().T
        return hessenberg_form(A)
    # Real matrix with complex spectrum: block-diagonal D.
    D = np.zeros((n, n))
    i = 0
    while i < n:
        if np.imag(vals[i]) != 0:
            a, b = np.real(vals[i]), np.imag(vals[i])
            D[i, i] = a
            D[i + 1, i] = b
            D[i, i + 1] = -b
            D[i + 1, i + 1] = a
            i += 2
        else:
            D[i, i] = np.real(vals[i])
            i += 1
    X = rng.standard_normal((n, n))
    Q, _ = np.linalg.qr(X)
    return hessenberg_form(Q @ D @ Q.T)


def realimag_sort(lams):
    """Sort complex values by (real, imag) for spectrum comparison."""
    lams = np.asarray(lams)
    return np.array(sorted(lams, key=lambda z: (np.real(z), np.imag(z))))


def is_hessenberg(H):
    """True iff everything below the first subdiagonal is exactly zero."""
    return np.linalg.norm(np.tril(H, -2)) == 0
