"""Pallas TPU kernel for the constant-coefficient 5-point stencil matvec.

The XLA formulation (pad + shifted slices) reaches only a fraction of HBM
bandwidth; this kernel streams the grid through VMEM in row tiles with an
explicit halo DMA, computes all five taps in one fused VPU pass, and
writes each output tile once:

  HBM traffic per matvec ~= read x + write y (+ halo re-reads), the
  speed-of-light bound for a stencil.

Layout: x is the (ny, nx) row-major grid (flattened vectors reshape for
free), read *unpadded* straight from HBM — no separate padding pass.  Tile
i wants grid rows [i*TR - HALO, i*TR + TR + HALO); interior tiles DMA that
window into a VMEM scratch slot in one copy (overlapping windows, which
BlockSpecs cannot express, hence the manual async copy), while the first/
last tiles copy the in-range rows into an offset scratch slice and zero
the out-of-range halo rows — that zero halo IS the Dirichlet boundary.
The scratch is double-buffered: grid step i starts the DMA for tile i+1
into the other slot before waiting on its own, so the HBM read of the
next window overlaps this tile's VPU work (the automatic output pipeline
overlaps the y writes the same way).  All window starts and scratch
offsets are multiples of HALO = 8, keeping every DMA sublane-aligned (a
Mosaic requirement).  North/south taps are sublane rolls of the scratch
block (aligned slices only); west/east taps are lane rolls with an edge
mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["stencil5_matvec", "HALO"]

HALO = 8  # sublane alignment of the DMA windows


def _halo_copy(x_hbm, scratch, sem, t, slot, *, TR, G, action):
    """Start (or wait on) the async copy of tile t's halo window
    [t*TR - HALO, t*TR + TR + HALO) ∩ grid into scratch[slot].  The wait
    path reconstructs the identical copy descriptor, so start/wait stay
    matched per boundary branch."""

    def go(cp):
        cp.start() if action == "start" else cp.wait()

    buf = scratch.at[slot]
    if G == 1:
        go(pltpu.make_async_copy(x_hbm, buf.at[pl.ds(HALO, TR), :], sem.at[slot]))
        return

    @pl.when(t == 0)
    def _first():
        go(
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, TR + HALO), :],
                buf.at[pl.ds(HALO, TR + HALO), :],
                sem.at[slot],
            )
        )

    if G > 2:  # with G == 2 there are no interior tiles, and the
        # (TR + 2*HALO)-row slice would not even fit the operand

        @pl.when((t > 0) & (t < G - 1))
        def _interior():
            go(
                pltpu.make_async_copy(
                    x_hbm.at[
                        pl.ds(pl.multiple_of(t * TR - HALO, HALO), TR + 2 * HALO), :
                    ],
                    buf,
                    sem.at[slot],
                )
            )

    @pl.when(t == G - 1)
    def _last():
        go(
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(pl.multiple_of(t * TR - HALO, HALO), TR + HALO), :],
                buf.at[pl.ds(0, TR + HALO), :],
                sem.at[slot],
            )
        )


def _kernel(x_hbm, y_ref, scratch, sem, *, coeffs, TR, nx, G):
    c, w, e, no, so = coeffs
    i = pl.program_id(0)
    slot = lax.rem(i, jnp.int32(2)) if G > 1 else 0
    zero_halo = jnp.zeros((HALO, nx), dtype=y_ref.dtype)

    @pl.when(i == 0)
    def _prologue():
        _halo_copy(x_hbm, scratch, sem, 0, 0, TR=TR, G=G, action="start")

    if G > 1:

        @pl.when(i + 1 < G)
        def _prefetch():
            _halo_copy(
                x_hbm, scratch, sem, i + 1, 1 - slot, TR=TR, G=G, action="start"
            )

    _halo_copy(x_hbm, scratch, sem, i, slot, TR=TR, G=G, action="wait")

    # Dirichlet halo rows: zero-fill the out-of-grid part of the window
    # (disjoint from the DMA'd rows, so ordering vs the copy is free).
    @pl.when(i == 0)
    def _top():
        scratch[0, 0:HALO, :] = zero_halo

    @pl.when(i == G - 1)
    def _bottom():
        scratch[slot, TR + HALO :, :] = zero_halo

    rows = TR + 2 * HALO
    block = scratch[slot, :, :]
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
    # Two scratch slots of (TR+16, nx) + roll temporaries + output block
    # must sit well under VMEM (~16 MB); target <= 1 MB per slot so the
    # double-buffered DMA actually overlaps compute.  TR is a multiple of
    # 8 dividing ny.
    budget = (1024 * 1024) // (nx * itemsize)
    tr = max(8, min(ny, (budget // 8) * 8))
    while ny % tr:
        tr -= 8
        if tr <= 0:
            return ny
    return tr


@functools.partial(
    jax.jit, static_argnames=("coeffs", "grid", "interpret", "tile_rows")
)
def stencil5_matvec(x, *, coeffs, grid, interpret=False, tile_rows=None):
    """y = A @ x for the 5-point stencil (center, west, east, north, south)
    on an (ny, nx) grid; x, y are flat length-(ny*nx) arrays.
    `tile_rows` overrides the VMEM tile height (testing / tuning)."""
    ny, nx = grid
    g = x.reshape(ny, nx)

    TR = tile_rows or _pick_tile_rows(ny, nx, x.dtype.itemsize)
    G = ny // TR

    y = pl.pallas_call(
        functools.partial(_kernel, coeffs=coeffs, TR=TR, nx=nx, G=G),
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (TR, nx), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ny, nx), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, TR + 2 * HALO, nx), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(g)
    return y.reshape(ny * nx)


def _sliding_kernel(x_ref, o_ref, ypart, lastrow, *, coeffs, R, nx, T):
    """One-step software pipeline: grid step i (of T+1) COMPLETES tile
    i-1's y (adding the south-halo term sourced from this step's x block,
    already in VMEM via the automatic pipeline) and emits it, then
    computes tile i's partial into the `ypart` scratch.  Every x row is
    read from HBM exactly once; no overlapping-window DMA at all."""
    c, w, e, no, so = coeffs
    i = pl.program_id(0)

    @pl.when(i > 0)
    def _emit():
        # South neighbor of tile (i-1)'s last row = this tile's first
        # row — except past the grid's last tile, where it is the
        # Dirichlet zero boundary.
        @pl.when(i < T)
        def _south_halo():
            ypart[R - 1:R, :] += so * x_ref[0:1, :]

        o_ref[...] = ypart[...]

    @pl.when(i < T)
    def _compute():
        xb = x_ref[...]
        zc = jnp.zeros((R, 1), xb.dtype)
        zr = jnp.zeros((1, nx), xb.dtype)
        part = (
            c * xb
            + w * jnp.concatenate([zc, xb[:, :-1]], axis=1)
            + e * jnp.concatenate([xb[:, 1:], zc], axis=1)
            + no * jnp.concatenate([zr, xb[:-1, :]], axis=0)
            + so * jnp.concatenate([xb[1:, :], zr], axis=0)
        )
        ypart[...] = part

        # North neighbor of this tile's first row lives in the previous
        # tile's last row (zero boundary at the first tile).
        @pl.when(i > 0)
        def _north_halo():
            ypart[0:1, :] += no * lastrow[...]

        lastrow[...] = xb[R - 1:R, :]


def _pick_sliding_rows(ny, nx, itemsize):
    """Largest divisor of ny that is a multiple of 8 (sublane-aligned)
    and keeps the kernel's ~5 tile-sized VMEM buffers (x and y double
    buffers + the ypart scratch) inside the 16 MB scoped-vmem budget;
    0 if none exists."""
    cap = int(12e6 // (5 * nx * itemsize))  # rows per tile budget
    best = 0
    for r in range(8, min(cap, ny) + 1, 8):
        if ny % r == 0:
            best = r
    return best


def stencil5_matvec_sliding(x, *, coeffs, grid, interpret=False,
                            tile_rows=None):
    """y = A @ x for the 5-point stencil via the sliding-window kernel —
    measured at ~2x the XLA shifted-slice formulation on HBM-resident
    grids (bench.py roofline phase: the XLA form re-reads x for the
    north/south taps; this one streams each row once and runs at the
    blocked-copy rate)."""
    ny, nx = grid
    R = tile_rows or _pick_sliding_rows(ny, nx, x.dtype.itemsize)
    if R == 0:
        return stencil5_matvec(x, coeffs=coeffs, grid=grid,
                               interpret=interpret)
    T = ny // R
    g = x.reshape(ny, nx)
    y = pl.pallas_call(
        functools.partial(_sliding_kernel, coeffs=coeffs, R=R, nx=nx, T=T),
        grid=(T + 1,),
        in_specs=[
            pl.BlockSpec((R, nx), lambda i: (jnp.minimum(i, T - 1), 0)),
        ],
        out_specs=pl.BlockSpec(
            (R, nx), lambda i: (jnp.maximum(i - 1, 0), 0)
        ),
        out_shape=jax.ShapeDtypeStruct((ny, nx), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((R, nx), x.dtype),
            pltpu.VMEM((1, nx), x.dtype),
        ],
        # In-place: out block j's writeback lands strictly after x block
        # j's (single) fetch in the pipeline order, so aliasing is safe,
        # removes the output allocation, and measurably overlaps the
        # writeback of call k with the fetches of call k+1 in iterated
        # use.  XLA inserts a defensive copy when the caller's input is
        # still live, so semantics are unconditional.
        input_output_aliases={0: 0},
        interpret=interpret,
    )(g)
    return y.reshape(ny * nx)
