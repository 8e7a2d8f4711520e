"""Pallas TPU kernel for the LZSS exact match search.

The XLA scan version (ops/lzss_jax) re-slices a (window+TILE) view of the
block from HBM every step — O(S/TILE × window) memory traffic dominates.
This kernel keeps everything resident on-chip:

- block bytes in SMEM (via a (B, 1, S//4) layout whose block shape equals
  the trailing array dims — Mosaic allows scalar loads at dynamic indices
  only in SMEM), 4 bytes packed per int32 word;
- a CIRCULAR window buffer w in VMEM: lane j holds the byte at the unique
  position p ≡ j (mod 4096) inside [i-4096, i-1] — exactly one (32, 128)
  int32 tile, updated with one masked select per step as the window slides;
- per-pair run lengths rl in VMEM, position-indexed like w, so the
  recurrence rl(i, p) = eq ? rl(i+1, p+1) + 1 : 0 is a flattened roll by -1
  (row roll + column-127 fix) plus a select.

The longest-match length and its largest distance (== leftmost occurrence,
bytes.Index semantics) come from ONE max-reduction of the packed key
``(min(rl, d) << 13) | d``. Results are staged in an (8, 128) tile and
flushed with one vector store per 1024 positions (Mosaic forbids scalar
stores to VMEM).

Semantics identical to ops.lzss_jax.find_matches_blocks (tests assert
equality and oracle byte-exactness end-to-end).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raisin_tpu.ops import jax_setup  # noqa: F401

WINDOW = 4096
ROWS, COLS = 32, 128  # (32, 128) int32 tile == 4096 lanes
SENTINEL = -2  # plain int: jnp constants would be captured as kernel consts
STAGE_ROWS = 8  # results are staged in an (8, 128) tile, flushed per 1024 pos
STAGE = STAGE_ROWS * COLS
DBITS = 13  # d <= 4096 fits in 13 bits of the packed reduction key


def _kernel(n_ref, xw_ref, w0_ref, L_ref, D_ref, w, rl, Ls, Ds):
    # n_ref: scalar-prefetched (B,) lengths. xw_ref: (1, 1, S//4) int32 in
    # SMEM, 4 little-endian bytes per word. Outputs are (1, S//128, 128).
    S = L_ref.shape[1] * COLS
    w[:] = w0_ref[0]
    rl[:] = jnp.zeros((ROWS, COLS), jnp.int32)
    J = (
        jax.lax.broadcasted_iota(jnp.int32, (ROWS, COLS), 0) * COLS
        + jax.lax.broadcasted_iota(jnp.int32, (ROWS, COLS), 1)
    )
    Js = (
        jax.lax.broadcasted_iota(jnp.int32, (STAGE_ROWS, COLS), 0) * COLS
        + jax.lax.broadcasted_iota(jnp.int32, (STAGE_ROWS, COLS), 1)
    )
    n = n_ref[pl.program_id(0)]
    col = jax.lax.broadcasted_iota(jnp.int32, (ROWS, COLS), 1)

    def read_byte(idx):
        word = xw_ref[0, 0, idx >> 2]
        return (word >> ((idx & 3) * 8)) & 0xFF

    def body(t, _):
        i = S - 1 - t
        xi = read_byte(i)
        d = ((i - 1 - J) & (WINDOW - 1)) + 1
        eq = (w[:] == xi) & (i < n)
        prev = rl[:]
        row_rolled = pltpu.roll(prev, shift=COLS - 1, axis=1)  # roll by -1
        first_col_next_row = pltpu.roll(prev[:, 0:1], shift=ROWS - 1, axis=0)
        shifted = jnp.where(col == COLS - 1, first_col_next_row, row_rolled)
        new_rl = jnp.where(eq, jnp.minimum(shifted + 1, WINDOW + 1), 0)
        rl[:] = new_rl
        # one reduction recovers both L (high bits) and the largest d
        # achieving it (low bits) — largest d == leftmost occurrence
        key = (jnp.minimum(new_rl, d) << DBITS) | d
        m = jnp.max(key)
        L = m >> DBITS
        D = jnp.where(L > 0, m & ((1 << DBITS) - 1), 0)

        # stage the scalar result at lane i % STAGE via a masked select
        smask = Js == (i % STAGE)
        Ls[:] = jnp.where(smask, L, Ls[:])
        Ds[:] = jnp.where(smask, D, Ds[:])

        # processing descends, so lane (i % STAGE) == 0 completes a stage
        @pl.when(i % STAGE == 0)
        def _flush():
            r = (i // COLS) // STAGE_ROWS * STAGE_ROWS
            L_ref[0, pl.ds(r, STAGE_ROWS), :] = Ls[:]
            D_ref[0, pl.ds(r, STAGE_ROWS), :] = Ds[:]

        # slide the window: position i-1 leaves, i-1-WINDOW enters (same lane)
        p = i - 1 - WINDOW
        val = jnp.where(
            (p >= 0) & (p < n), read_byte(jnp.maximum(p, 0)), SENTINEL
        )
        lane = (i - 1) & (WINDOW - 1)
        w[:] = jnp.where(J == lane, val, w[:])
        return 0

    jax.lax.fori_loop(0, S, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def find_matches_blocks_pallas(x: jax.Array, lengths: jax.Array, interpret: bool = False):
    """Exact per-position (L, D) for B blocks; window fixed at 4096.

    x: (B, S) int32 (-1 padded past lengths); S must be a multiple of 1024.
    """
    B, S = x.shape
    if S % STAGE != 0:
        raise ValueError(f"S must be a multiple of {STAGE}")
    rows = S // COLS

    # little-endian 4-byte packing for the SMEM word array
    xb = jnp.where(x >= 0, x, 0).astype(jnp.uint32).reshape(B, S // 4, 4)
    shifts = jnp.array([0, 8, 16, 24], dtype=jnp.uint32)
    xw = jnp.sum(xb << shifts[None, None, :], axis=-1).astype(jnp.int32)
    xw = xw.reshape(B, 1, S // 4)

    # initial circular buffer per block: lane j <- x[p] for the unique
    # p ≡ j (mod 4096) in [S-1-4096, S-2] (sentinel where p < 0 or >= n)
    base = S - 1 - WINDOW
    j = jnp.arange(WINDOW, dtype=jnp.int32)
    p = base + ((j - base) % WINDOW)
    w0 = jnp.where(
        ((p >= 0)[None, :]) & (p[None, :] < lengths[:, None]),
        x[:, jnp.clip(p, 0, S - 1)],
        SENTINEL,
    ).astype(jnp.int32)
    w03 = w0.reshape(B, ROWS, COLS)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, S // 4), lambda b, n: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ROWS, COLS), lambda b, n: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, COLS), lambda b, n: (b, 0, 0)),
            pl.BlockSpec((1, rows, COLS), lambda b, n: (b, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((ROWS, COLS), jnp.int32),
            pltpu.VMEM((ROWS, COLS), jnp.int32),
            pltpu.VMEM((STAGE_ROWS, COLS), jnp.int32),
            pltpu.VMEM((STAGE_ROWS, COLS), jnp.int32),
        ],
    )
    L, D = pl.pallas_call(
        _kernel,
        out_shape=[
            jax.ShapeDtypeStruct((B, rows, COLS), jnp.int32),
            jax.ShapeDtypeStruct((B, rows, COLS), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(lengths.astype(jnp.int32), xw, w03)
    return L.reshape(B, S), D.reshape(B, S)
