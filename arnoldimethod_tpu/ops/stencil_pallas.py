"""Pallas TPU kernel for the constant-coefficient 5-point stencil matvec.

The XLA formulation (pad + shifted slices) reaches only a fraction of HBM
bandwidth; this kernel streams the grid through VMEM in row tiles with an
explicit halo DMA, computes all five taps in one fused VPU pass, and
writes each output tile once:

  HBM traffic per matvec ~= read x + write y (+ halo re-reads), the
  speed-of-light bound for a stencil.

Layout: x is the (ny, nx) row-major grid (flattened vectors reshape for
free).  The caller pre-pads HALO (8) zero rows on top and bottom so every
DMA window is sublane-aligned (Mosaic requires 8-row alignment); tile i
copies rows [i*TR, i*TR + TR + 2*HALO) of the padded grid into VMEM
scratch — overlapping windows, which BlockSpecs cannot express, hence the
manual async copy.  North/south taps are sublane rolls of the scratch
block (aligned slices only); west/east taps are lane rolls with an edge
mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["stencil5_matvec", "HALO"]

HALO = 8  # sublane alignment of the DMA windows


def _kernel(xp_hbm, y_ref, scratch, sem, *, coeffs, TR, nx):
    c, w, e, no, so = coeffs
    i = pl.program_id(0)

    rows = TR + 2 * HALO
    cp = pltpu.make_async_copy(xp_hbm.at[pl.ds(i * TR, rows), :], scratch, sem)
    cp.start()
    cp.wait()

    block = scratch[:, :]
    # Sublane rolls keep every slice 8-aligned: rolled-down block j holds
    # original row j-1 (north tap), rolled-up holds j+1 (south tap).
    down = pltpu.roll(block, 1, 0)
    up = pltpu.roll(block, rows - 1, 0)
    center = block[HALO : TR + HALO, :]
    north = down[HALO : TR + HALO, :]
    south = up[HALO : TR + HALO, :]

    lane = jax.lax.broadcasted_iota(jnp.int32, (TR, nx), dimension=1)
    west = jnp.where(lane > 0, pltpu.roll(center, 1, 1), 0.0)
    east = jnp.where(lane < nx - 1, pltpu.roll(center, nx - 1, 1), 0.0)

    y_ref[:, :] = c * center + no * north + so * south + w * west + e * east


def _pick_tile_rows(ny, nx, itemsize):
    # Scratch (TR+16, nx) + rolls + output block must sit well under VMEM
    # (~16 MB); target <= 2 MB scratch, TR a multiple of 8 dividing ny.
    budget = (2 * 1024 * 1024) // (nx * itemsize)
    tr = max(8, min(ny, (budget // 8) * 8))
    while ny % tr:
        tr -= 8
        if tr <= 0:
            return ny
    return tr


@functools.partial(jax.jit, static_argnames=("coeffs", "grid", "interpret"))
def stencil5_matvec(x, *, coeffs, grid, interpret=False):
    """y = A @ x for the 5-point stencil (center, west, east, north, south)
    on an (ny, nx) grid; x, y are flat length-(ny*nx) arrays."""
    ny, nx = grid
    g = x.reshape(ny, nx)
    xp = jnp.pad(g, ((HALO, HALO), (0, 0)))

    TR = _pick_tile_rows(ny, nx, x.dtype.itemsize)

    y = pl.pallas_call(
        functools.partial(_kernel, coeffs=coeffs, TR=TR, nx=nx),
        grid=(ny // TR,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (TR, nx), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ny, nx), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TR + 2 * HALO, nx), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp)
    return y.reshape(ny * nx)
