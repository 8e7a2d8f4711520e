"""Pallas TPU kernel for LZSS token-stream decode (container fast path).

One block per grid step: a sequential walk of the ASCII token stream
(lzss.go:323's state machine, restricted to well-formed streams — the RSNB
container only ever feeds it our own encoder's output). The decoded
(still-escaped) stream is kept in an SMEM scratch so back-references read
already-decoded bytes with plain scalar loads; every byte is simultaneously
staged into an (8, 128) vector tile for the VMEM output rows. The final
escape-decode layer (lzss.go:391) is vectorized host-side
(formats.lzss_ref.decode_opening_symbols_np).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raisin_tpu.ops import jax_setup  # noqa: F401

LANES = 128
OPENING = 60  # '<'
CLOSING = 62  # '>'
SEP = 44  # ','


def _decode_kernel(n_ref, tw_ref, out_ref, olen_ref, tile, sout):
    b = pl.program_id(0)
    n = n_ref[b]
    capw = out_ref.shape[1] * LANES  # output capacity in 32-bit words
    cap_bytes = capw * 4

    Js = (
        jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    )
    tile[:] = jnp.zeros((8, LANES), jnp.int32)

    def read_tok(idx):
        word = tw_ref[0, 0, idx >> 2]
        return (word >> ((idx & 3) * 8)) & 0xFF

    def read_out(idx):
        word = sout[idx >> 2]
        return (word >> ((idx & 3) * 8)) & 0xFF

    def emit(st, byte):
        ip, opos, acc = st
        acc = acc | (byte << ((opos & 3) * 8))
        complete = (opos & 3) == 3
        widx = opos >> 2
        safe = jnp.minimum(widx, cap_bytes // 4 - 1)
        sout[safe] = acc  # harmless rewrite until the word completes

        @pl.when(complete)
        def _store():
            tile[:] = jnp.where(Js == (widx % 1024), acc, tile[:])

            @pl.when((widx + 1) % 1024 == 0)
            def _flush():
                row = jnp.minimum((widx + 1) // 1024 - 1, capw // 1024 - 1) * 8
                out_ref[0, pl.ds(row, 8), :] = tile[:]
                tile[:] = jnp.zeros((8, LANES), jnp.int32)

        return (ip, opos + 1, jnp.where(complete, 0, acc))

    def parse_num(st, stop_byte):
        def cond(c):
            ip = c[0][0]
            return (ip < n) & (read_tok(ip) != stop_byte)

        def body(c):
            st_in, v = c
            ip = st_in[0]
            d = read_tok(ip)
            return (ip + 1, st_in[1], st_in[2]), v * 10 + (d - 48)

        (st2, v) = jax.lax.while_loop(cond, body, (st, jnp.int32(0)))
        return (st2[0] + 1, st2[1], st2[2]), v  # skip the stop byte

    def body(st):
        ip, opos, acc = st
        byte = read_tok(ip)

        def ref_path(st_in):
            st1 = (st_in[0] + 1, st_in[1], st_in[2])  # skip '<'
            st2, dist = parse_num(st1, jnp.int32(SEP))
            st3, ln = parse_num(st2, jnp.int32(CLOSING))
            src0 = jnp.maximum(st3[1] - dist, 0)

            def cp(k, s):
                return emit(s, read_out(src0 + k))

            return jax.lax.fori_loop(0, ln, cp, st3)

        def lit_path(st_in):
            st1 = emit(st_in, byte)
            return (st1[0] + 1, st1[1], st1[2])

        return jax.lax.cond(byte == OPENING, ref_path, lit_path, st)

    def cond(st):
        return (st[0] < n) & (st[1] < cap_bytes)

    ip, opos, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    )

    widx = opos >> 2

    @pl.when((opos & 3) != 0)
    def _partial():
        tile[:] = jnp.where(Js == (widx % 1024), acc, tile[:])

    row = jnp.minimum(widx // 1024, capw // 1024 - 1) * 8
    out_ref[0, pl.ds(row, 8), :] = tile[:]
    olen_ref[0, 0, 0] = opos


@functools.partial(jax.jit, static_argnames=("cap_out", "interpret"))
def lzss_decode_blocks(
    tok: jax.Array, tok_len: jax.Array, cap_out: int, interpret: bool = False
):
    """Decode B LZSS token streams to their (escaped) plaintexts on device.

    Args:
      tok: (B, S) token-stream bytes (any integer dtype, zero-fill tail).
      tok_len: (B,) int32.
      cap_out: static per-block output capacity in bytes (multiple of 4096;
        2 x block_size is always enough — escaping at most doubles).

    Returns (rows (B, cap_out // 4) int32 little-endian bytes, out_len (B,)).
    """
    B, S = tok.shape
    if cap_out % 4096 != 0:
        raise ValueError("cap_out must be a multiple of 4096")
    Sp = (S + 3) // 4 * 4
    tokp = jnp.pad(tok.astype(jnp.uint32), ((0, 0), (0, Sp - S)))
    sh = jnp.array([0, 8, 16, 24], dtype=jnp.uint32)
    tw = jnp.sum(tokp.reshape(B, Sp // 4, 4) << sh[None, None, :], axis=-1)
    tw = tw.astype(jnp.int32).reshape(B, 1, Sp // 4)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, Sp // 4), lambda b, n: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, cap_out // 4 // LANES, LANES), lambda b, n: (b, 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda b, n: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, LANES), jnp.int32),
            pltpu.SMEM((cap_out // 4,), jnp.int32),
        ],
    )
    rows, olen = pl.pallas_call(
        _decode_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, cap_out // 4 // LANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(tok_len.astype(jnp.int32), tw)
    return rows.reshape(B, cap_out // 4), olen.reshape(B)
