"""Pallas TPU kernel for BSR (block-sparse row) matvec.

The general-sparse path on TPU: the matrix is stored as dense (B, B)
blocks, each block-row holding up to KB blocks (padded, block-level ELL).
The kernel runs a (block-row-pairs, KB-chunks) grid; the dense block data
is the only streamed operand (it dominates HBM traffic), pipelined
through VMEM by its BlockSpec, while x and y live *entirely in VMEM* as
2-D (nblocks, B) arrays — x rows are fetched with dynamic sublane
indexing driven by the scalar-prefetched block-column indices.

Per block-row the KC fetched x rows are concatenated ALONG LANES into a
(1, KC*B) row vector and contracted against the block slab reshaped
(KC, B, B) -> (KC*B, B) — a single (1, KC*B) x (KC*B, B) MXU op.  Both
of those layout changes are Mosaic-legal (lane concatenation; merging
major dims while the minor dim stays), unlike the one-column
reshape((KC*B, 1)) of an earlier formulation which died in tpu.reshape
on real hardware.  For the contraction to compute y += A x, the blocks
must be stored TRANSPOSED: dataT[r, k, j, i] = A_block[i, j] — use
`pack_bsr` to build the packed operands once at operator construction
(per-call padding of the streamed array would copy hundreds of MB every
matvec).  Two block-rows are processed per grid step (RB=2): measured on
TPU v5-lite this pushes 67M-nnz throughput from 693 to 750 GB/s
effective, at the memcpy roofline and above the XLA einsum fallback
(740 GB/s).

Why x/y are full-VMEM 2-D operands rather than blocked 1-D ones: Mosaic
requires a blocked operand's second-to-minor block dim to be a multiple
of 8 (so (1, B) blocks of a (nbc, B) array are rejected), and XLA gives
1-D f32 arrays tiled layouts (T(512)) that Mosaic's (B,) = T(128) block
assumption fails to match on real hardware — both dead ends are avoided
by keeping the vectors unblocked.  Cost: n is bounded by VMEM (~12 MB of
x + y), i.e. n <= ~1.5M rows; beyond that use the einsum fallback or
shard rows first (BsrOperator auto-selects accordingly).

Padding blocks point at block column 0 with zero data: they contribute
nothing and keep the grid static.

This is the layout for general sparsity with clustered structure; for
banded/stencil matrices DiaOperator / Stencil5Operator are strictly
better (no zero-fill).

Reference spec: the matrix-free `mul!` contract this accelerates is
/root/reference/src/run.jl:21-23 (any A with mul!/eltype/size).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bsr_matvec", "pack_bsr", "vmem_resident_bytes", "VMEM_BUDGET_BYTES"]

# KB is processed in chunks of KC blocks so the streamed data block stays
# bounded per grid step (RB * KC * B * B * 4 bytes at B=128 -> 1 MB).
_KC = 8
# Block-rows per grid step: amortizes per-step overhead; must divide the
# packed nbr (pack_bsr pads nbr to a multiple of 8, a multiple of this).
_RB = 2

# x + y must fit in VMEM alongside the double-buffered streamed block data
# (~2 MB) out of ~16 MB/core: past this, auto-selection falls back to the
# einsum path instead of hitting an opaque Mosaic VMEM-OOM at compile time.
VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def vmem_resident_bytes(nbr, nbc, B, itemsize=4):
    """Bytes of VMEM the kernel keeps resident for x and y (both padded to
    a multiple of 8 sublanes)."""
    nbc_pad = -(-nbc // 8) * 8
    nbr_pad = -(-nbr // 8) * 8
    return (nbc_pad + nbr_pad) * B * itemsize


def pack_bsr(block_cols, block_data):
    """One-time packing of natural-orientation BSR operands for the kernel.

    block_cols: (nbr, KB) int — block column index per slot;
    block_data: (nbr, KB, B, B) — dense blocks, block_data[r, k] is the
      (B, B) block at block-row r, block-col block_cols[r, k].

    Returns (cols, dataT) with nbr padded to a multiple of 8 (so the RB
    grid always divides), KB padded to a multiple of KC, and each block
    transposed: dataT[r, k, j, i] = block_data[r, k, i, j].  Pad slots
    point at block column 0 with zero data.
    """
    import numpy as np

    block_cols = np.asarray(block_cols)
    block_data = np.asarray(block_data)
    nbr, KB, B, _ = block_data.shape
    KC = min(_KC, KB)
    KBp = -(-KB // KC) * KC
    nbrp = -(-nbr // 8) * 8
    if (KBp, nbrp) != (KB, nbr):
        block_cols = np.pad(block_cols, ((0, nbrp - nbr), (0, KBp - KB)))
        block_data = np.pad(
            block_data, ((0, nbrp - nbr), (0, KBp - KB), (0, 0), (0, 0))
        )
    dataT = np.ascontiguousarray(block_data.transpose(0, 1, 3, 2))
    return block_cols.astype(np.int32), dataT


def _kernel(bcols_ref, dataT_ref, x_ref, y_ref):
    i = pl.program_id(0)
    kc = pl.program_id(1)
    RB, KC, B = dataT_ref.shape[0], dataT_ref.shape[1], dataT_ref.shape[3]

    @pl.when(kc == 0)
    def _zero():
        y_ref[pl.ds(i * RB, RB), :] = jnp.zeros((RB, B), y_ref.dtype)

    for r in range(RB):
        # (1, KC*B) row of gathered x segments (lane concatenation);
        # dynamic x-row accesses go through pl.ds — plain `ref[idx, :]`
        # only lowers for offsets inside the first (8, 128) tile.
        xrow = jnp.concatenate(
            [
                x_ref[pl.ds(bcols_ref[i * RB + r, kc * KC + k], 1), :]
                for k in range(KC)
            ],
            axis=1,
        )
        E = dataT_ref[r].reshape(KC * B, B)  # major-dim merge: Mosaic-legal
        y_ref[pl.ds(i * RB + r, 1), :] += jnp.dot(
            xrow,
            E,
            precision=lax.Precision.HIGHEST,  # full-f32 MXU passes, not bf16
            preferred_element_type=y_ref.dtype,
        )


@functools.partial(jax.jit, static_argnames=("interpret",))
def bsr_matvec(block_cols, block_dataT, x, interpret=False):
    """y = A @ x with A in packed block-ELL/BSR form (see pack_bsr).

    block_cols: (nbr, KB) int32, nbr % 8 == 0, KB % KC == 0;
    block_dataT: (nbr, KB, B, B) TRANSPOSED blocks from pack_bsr;
    x: (n,) with n = nbc * B (nbc >= max block col + 1).  Returns (n_out,)
    with n_out = nbr * B rows (callers slice to the logical row count).
    """
    nbr, KB, B, _ = block_dataT.shape
    nbc = x.shape[0] // B
    KC = min(_KC, KB)
    if KB == 0 or KB % KC != 0 or nbr % 8 != 0:
        raise ValueError(
            f"bsr_matvec requires packed operands (KB % {KC} == 0, "
            f"nbr % 8 == 0; got KB={KB}, nbr={nbr}) — build them with "
            "pack_bsr, or use BsrOperator which packs at construction"
        )
    kc_total = KB // KC
    RB = _RB if nbr % _RB == 0 else 1

    x2 = x.reshape(nbc, B)
    nbc_pad = -(-nbc // 8) * 8
    if nbc_pad != nbc:
        x2 = jnp.pad(x2, ((0, nbc_pad - nbc), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbr // RB, kc_total),
        in_specs=[
            pl.BlockSpec(
                (RB, KC, B, B), lambda i, kc, bcols: (i, kc, 0, 0)
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x2, resident
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),  # y2, resident
    )

    y2 = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr, B), x.dtype),
        interpret=interpret,
    )(block_cols, block_dataT, x2)
    return y2.reshape(nbr * B)
