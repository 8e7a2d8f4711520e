"""Fused device pipelines: everything on device, compact bytes out.

Device->host readback is the expensive resource (on tunneled TPU hosts it is
orders of magnitude slower than compute), so the container paths fuse all
stages of a pipeline into one jitted call whose only outputs are the
concatenated compressed bytes plus tiny per-block length vectors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from raisin_tpu.ops import arithmetic_scan, lzss_jax
from raisin_tpu.ops import jax_setup  # noqa: F401


def concat_blocks(packed: jax.Array, lens: jax.Array, cap: int) -> jax.Array:
    """flat[o] = packed[b, o - start_b] for the block b owning offset o."""
    B, M = packed.shape
    ends = jnp.cumsum(lens)
    o = jnp.arange(cap, dtype=jnp.int32)
    b = jnp.clip(jnp.searchsorted(ends, o, side="right"), 0, B - 1)
    within = o - (ends[b] - lens[b])
    flat = packed[b, jnp.clip(within, 0, M - 1)]
    return jnp.where(o < ends[-1], flat, 0).astype(jnp.uint8)


def _matches(x, lengths, window: int, use_pallas: bool):
    if use_pallas:
        from raisin_tpu.ops import lzss_pallas

        return lzss_pallas.find_matches_blocks_pallas(x, lengths)
    return lzss_jax.find_matches_blocks(x, lengths, window, x.shape[1] // lzss_jax.TILE)


@functools.partial(
    jax.jit, static_argnames=("window", "cap_bytes", "use_pallas", "with_arith")
)
def lzss_encode_packed(
    x: jax.Array,
    lengths: jax.Array,
    window: int,
    cap_bytes: int,
    use_pallas: bool,
    with_arith: bool,
):
    """LZSS match+commit (optionally + arithmetic layer), compact bytes out.

    x: (B, S) int32 pre-escaped block bytes (-1 padded); lengths: (B,).
    Returns (flat (cap_bytes,) uint8, out_lens (B,), tok_lens (B,)).
    """
    B, S = x.shape
    L, D = _matches(x, lengths, window, use_pallas)
    tok, tok_len = lzss_jax.commit_blocks(x, L, D, lengths)
    if not with_arith:
        return concat_blocks(tok, tok_len, cap_bytes), tok_len, tok_len
    steps = S + 8
    payload = jnp.pad(tok, ((0, 0), (0, 8)))
    flat, byte_lens = arithmetic_scan.encode_blocks_packed(
        payload, tok_len, steps, cap_bytes
    )
    return flat, byte_lens, tok_len
