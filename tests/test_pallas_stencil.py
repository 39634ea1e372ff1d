"""Pallas stencil kernel vs the DIA reference matvec, in interpreter mode
on CPU (the TPU-compiled path is exercised by bench.py on hardware)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arnoldimethod_tpu.models.problems import convection_diffusion_2d, laplacian_2d
from arnoldimethod_tpu.ops.stencil_pallas import stencil5_matvec


@pytest.mark.parametrize(
    "ny,nx", [(16, 128), (32, 128), (64, 256), (8, 128)]
)
def test_matches_dia_laplacian(ny, nx):
    op = laplacian_2d(nx, ny, dtype=np.float32, fmt="dia")
    rng = np.random.default_rng(ny + nx)
    x = jnp.asarray(rng.standard_normal(ny * nx).astype(np.float32))
    y_ref = np.asarray(op.matvec(x))
    y_pl = np.asarray(
        stencil5_matvec(
            x, coeffs=(4.0, -1.0, -1.0, -1.0, -1.0), grid=(ny, nx), interpret=True
        )
    )
    assert np.allclose(y_pl, y_ref, atol=1e-4)


def test_matches_convection_diffusion():
    nx = ny = 16
    # fmt="stencil" coefficients replicated here.
    h = 1.0 / (nx + 1)
    beta = 10.0 * h / 2.0
    op = convection_diffusion_2d(nx, ny, peclet=10.0, dtype=np.float32, fmt="dia")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(ny * nx).astype(np.float32))
    y_ref = np.asarray(op.matvec(x))
    y_pl = np.asarray(
        stencil5_matvec(
            x,
            coeffs=(4.0, -1.0 - beta, -1.0 + beta, -1.0, -1.0),
            grid=(ny, nx),
            interpret=True,
        )
    )
    assert np.allclose(y_pl, y_ref, atol=1e-4)


def test_stencil_operator_through_solver():
    """The Stencil5Operator drives partial_schur end to end."""
    from arnoldimethod_tpu import partial_schur
    from arnoldimethod_tpu.models.problems import laplacian_2d

    op = laplacian_2d(16, 16, fmt="stencil", dtype=jnp.float64)
    decomp, history = partial_schur(op, nev=4, which="SR", tol=1e-8)
    assert history.converged
    # Every returned eigenvalue is in the exact spectrum (multiplicities
    # need not all be found — documented Arnoldi behavior, ref:
    # test/partial_schur.jl:93-94), and the smallest one is found.
    k = np.pi * np.arange(1, 17) / 17
    mu = 2 - 2 * np.cos(k)
    spectrum = np.sort((mu[:, None] + mu[None, :]).ravel())
    got = np.sort(decomp.eigenvalues.real)
    for lam in got:
        assert np.min(np.abs(spectrum - lam)) < 1e-7
    assert abs(got[0] - spectrum[0]) < 1e-7


@pytest.mark.parametrize("ny,tile_rows", [(32, 8), (48, 16), (16, 8)])
def test_multi_tile_boundaries(ny, tile_rows):
    """Forced small tiles exercise the first/interior/last in-kernel halo
    branches (the padless DMA paths) in interpreter mode."""
    nx = 128
    op = laplacian_2d(nx, ny, dtype=np.float32, fmt="dia")
    rng = np.random.default_rng(7 * ny + tile_rows)
    x = jnp.asarray(rng.standard_normal(ny * nx).astype(np.float32))
    y_ref = np.asarray(op.matvec(x))
    y_pl = np.asarray(
        stencil5_matvec(
            x,
            coeffs=(4.0, -1.0, -1.0, -1.0, -1.0),
            grid=(ny, nx),
            interpret=True,
            tile_rows=tile_rows,
        )
    )
    assert np.allclose(y_pl, y_ref, atol=1e-4)


@pytest.mark.parametrize("ny,nx", [(16, 128), (64, 256), (24, 128)])
def test_sliding_matches_dia(ny, nx):
    """Sliding-window kernel (the single-chip auto path) vs DIA reference,
    interpreter mode; nonsymmetric coefficients to catch transposes."""
    from arnoldimethod_tpu.ops.stencil_pallas import stencil5_matvec_sliding

    coeffs = (4.0, -1.2, -0.8, -1.1, -0.9)
    op = convection_diffusion_2d(nx, ny, peclet=0.0, dtype=np.float32,
                                 fmt="dia")
    # build the same nonsymmetric operator in DIA by hand
    from arnoldimethod_tpu.models.problems import _grid_2d
    op = _grid_2d(nx, ny, *coeffs, np.float32, "dia")
    rng = np.random.default_rng(ny * nx)
    x = jnp.asarray(rng.standard_normal(ny * nx).astype(np.float32))
    y_ref = np.asarray(op.matvec(x))
    y_pl = np.asarray(
        stencil5_matvec_sliding(
            x, coeffs=coeffs, grid=(ny, nx), interpret=True
        )
    )
    assert np.allclose(y_pl, y_ref, atol=1e-4)
