"""Model problems: standard test/benchmark matrices as ELL operators.

These mirror the matrices used throughout the reference's README, docs and
bench harnesses (1-D Laplacian readme.md:30-34, n=6000 tridiagonal
bench/partial_schur.jl:9, 2-D Laplacian / convection-diffusion from
BASELINE.json configs).
"""

from __future__ import annotations

import numpy as np

from .operators import EllOperator

__all__ = ["laplacian_1d", "tridiagonal", "laplacian_2d", "convection_diffusion_2d"]


def tridiagonal(n, lower, diag, upper, dtype=np.float64):
    """Tridiagonal Toeplitz matrix as an ELL operator."""
    data = np.zeros((n, 3), dtype=dtype)
    cols = np.zeros((n, 3), dtype=np.int32)
    i = np.arange(n)
    data[:, 1] = diag
    cols[:, 1] = i
    data[1:, 0] = lower
    cols[1:, 0] = i[1:] - 1
    data[:-1, 2] = upper
    cols[:-1, 2] = i[:-1] + 1
    return EllOperator(data, cols, (n, n))


def laplacian_1d(n, dtype=np.float64):
    """1-D Laplacian (-1, 2, -1): the README parity matrix
    (ref: readme.md:30-34)."""
    return tridiagonal(n, -1.0, 2.0, -1.0, dtype=dtype)


def laplacian_2d(nx, ny=None, dtype=np.float64):
    """2-D 5-point Laplacian on an nx-by-ny grid (row-major ordering),
    n = nx*ny rows with <= 5 nonzeros per row."""
    if ny is None:
        ny = nx
    n = nx * ny
    data = np.zeros((n, 5), dtype=dtype)
    cols = np.zeros((n, 5), dtype=np.int32)
    idx = np.arange(n).reshape(ny, nx)

    flat = idx.ravel()
    data[:, 2] = 4.0
    cols[:, 2] = flat

    # West / east neighbours.
    west = idx[:, 1:].ravel()
    data[west, 1] = -1.0
    cols[west, 1] = west - 1
    east = idx[:, :-1].ravel()
    data[east, 3] = -1.0
    cols[east, 3] = east + 1

    # North / south neighbours.
    north = idx[1:, :].ravel()
    data[north, 0] = -1.0
    cols[north, 0] = north - nx
    south = idx[:-1, :].ravel()
    data[south, 4] = -1.0
    cols[south, 4] = south + nx

    return EllOperator(data, cols, (n, n))


def convection_diffusion_2d(nx, ny=None, peclet=10.0, dtype=np.float64):
    """Nonsymmetric 2-D convection-diffusion (upwind convection in x):
    produces complex conjugate eigenvalue pairs for the 2x2-block real
    Schur path (BASELINE.json config 3)."""
    if ny is None:
        ny = nx
    n = nx * ny
    h = 1.0 / (nx + 1)
    beta = peclet * h / 2.0
    data = np.zeros((n, 5), dtype=dtype)
    cols = np.zeros((n, 5), dtype=np.int32)
    idx = np.arange(n).reshape(ny, nx)
    flat = idx.ravel()
    data[:, 2] = 4.0
    cols[:, 2] = flat

    west = idx[:, 1:].ravel()
    data[west, 1] = -1.0 - beta
    cols[west, 1] = west - 1
    east = idx[:, :-1].ravel()
    data[east, 3] = -1.0 + beta
    cols[east, 3] = east + 1
    north = idx[1:, :].ravel()
    data[north, 0] = -1.0
    cols[north, 0] = north - nx
    south = idx[:-1, :].ravel()
    data[south, 4] = -1.0
    cols[south, 4] = south + nx

    return EllOperator(data, cols, (n, n))
