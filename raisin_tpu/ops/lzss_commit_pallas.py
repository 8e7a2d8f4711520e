"""Pallas TPU kernel for the LZSS commit + token-emission pass.

The XLA commit (ops/lzss_jax.commit_blocks) finds committed positions by
binary-lifted jump tables and emits bytes through a per-byte searchsorted —
both gather-bound on TPU (~27 ns/element, 2.3 MB/s measured). This kernel
replaces it with the commit pass the format actually specifies
(lzss.go:134-151): a sequential greedy walk per block, engineered so the
scalar core does almost nothing per committed position:

- everything data-parallel is hoisted OUT of the walk into vectorized XLA
  precomputes: each position's (L, D) with digit counts packed into one LD
  word, and literal RUN lengths to the next match position (a reverse
  cummin, overloaded into the D field where L <= 1, so a run of k literals
  costs one iteration instead of k);
- the walk itself is one two-way branch per commit: token commits extract
  decimal digits with constant-divisor scalar arithmetic (strength-reduced
  by the compiler; the digit side-table this replaces cost 256 KiB/block of
  SMEM at 64 KiB blocks) and append <= 11 bytes as three word-pieces;
  literal/raw commits copy input words;
- output goes straight to an SMEM word stream (plain scalar stores — no
  vector tile staging, no scatter/gather anywhere).

Byte-exactness vs formats.lzss_ref.commit_tokens is asserted in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raisin_tpu.ops import jax_setup  # noqa: F401

LANES = 128
LBITS = 13  # LD word: (ndl-1)<<28 | (ndd-1)<<26 | L<<13 | D


def _commit_kernel(n_ref, ld_ref, xw_ref, tok_ref, len_ref):
    b = pl.program_id(0)
    n = n_ref[b]
    capw = tok_ref.shape[2]

    def shl(v, k):
        r = v << jnp.clip(k, 0, 31)
        return jnp.where((k >= 32) | (k < 0), 0, r)

    def shr(v, k):
        u = v.astype(jnp.uint32) >> jnp.clip(k, 0, 31).astype(jnp.uint32)
        return jnp.where((k >= 32) | (k < 0), 0, u.astype(jnp.int32))

    def read_word(idx):
        # 4 little-endian input bytes starting at byte offset idx
        w0 = xw_ref[0, 0, idx >> 2]
        w1 = xw_ref[0, 0, jnp.minimum((idx >> 2) + 1, xw_ref.shape[2] - 1)]
        sh = (idx & 3) * 8
        return shr(w0, sh) | shl(w1, 32 - sh)

    def emit_word(st, w, nb):
        """Append nb (0..4) little-endian bytes of w (upper bytes of w MUST
        be zero). st = (opos, acc)."""
        opos, acc = st
        k = opos & 3
        acc = acc | shl(w, k * 8)
        newpos = opos + nb
        crossed = (newpos >> 2) != (opos >> 2)

        @pl.when(crossed)
        def _store():
            tok_ref[0, 0, jnp.minimum(opos >> 2, capw - 1)] = acc

        acc = jnp.where(crossed, shr(w, (4 - k) * 8), acc)
        return (newpos, acc)

    def copy_bytes(st, src, count):
        """Append count input bytes starting at byte offset src.

        Two 4-byte appends per loop iteration: literal runs dominate the
        walk and the while-loop's per-iteration overhead is the cost, so
        moving 8 bytes per trip buys most of a 2x on long runs (the second
        append is a no-op when the remainder fits one word)."""

        def step(c):
            st_in, s, rem = c
            nb1 = jnp.minimum(rem, 4)
            w1 = read_word(s) & _bmask(nb1)
            st1 = emit_word(st_in, w1, nb1)
            rem2 = rem - nb1
            nb2 = jnp.minimum(rem2, 4)
            w2 = read_word(s + nb1) & _bmask(nb2)
            return (emit_word(st1, w2, nb2), s + nb1 + nb2, rem2 - nb2)

        def cond(c):
            return c[2] > 0

        out, _, _ = jax.lax.while_loop(cond, step, (st, src, count))
        return out

    def digword(v, nd):
        # decimal v (<= 8191) as nd little-endian ASCII bytes, MSB digit
        # first, upper bytes ZERO (emit_word contract). Constant divisions
        # strength-reduce on the scalar core; computing digits here keeps
        # the 256 KiB/block digit side-table out of SMEM (64 KiB blocks
        # blew the 1 MiB budget with it).
        r1 = v // 10
        r2 = r1 // 10
        r3 = r2 // 10
        full = (
            ((v - r1 * 10) << 24)
            | ((r1 - r2 * 10) << 16)
            | ((r2 - r3 * 10) << 8)
            | r3
        )
        return shr(full, (4 - nd) * 8) | shr(jnp.int32(0x30303030), (4 - nd) * 8)

    def body(st):
        i, opos, acc = st
        ld = ld_ref[0, 0, i]
        L = (ld >> LBITS) & 0x1FFF
        D = ld & 0x1FFF  # literal-run length when L <= 1
        nd_d = ((ld >> 26) & 3) + 1
        nd_l = ((ld >> 28) & 3) + 1
        toklen = 3 + nd_d + nd_l
        use_tok = (L > 0) & (toklen < L)

        def tok_path(es):
            wd = digword(D, nd_d)  # D digits
            wl = digword(L, nd_l)  # L digits
            # token = '<' D-digits ',' (part A, nd_d+2 bytes) then
            # L-digits '>' (part B, nd_l+1 bytes) at byte offset nd_d+2.
            a_lo = 60 | shl(wd, 8) | shl(jnp.int32(44), (nd_d + 1) * 8)
            a_hi = shr(wd, 24) | shl(jnp.int32(44), (nd_d - 3) * 8)  # bytes 4..5
            b_lo = wl | shl(jnp.int32(62), nd_l * 8)
            b_hi = shl(jnp.int32(62), (nd_l - 4) * 8)  # byte 4 ('>' when nd_l=4)
            off = nd_d + 2
            w0 = a_lo | shl(b_lo, off * 8)
            w1 = (
                a_hi
                | shr(b_lo, (4 - off) * 8)
                | shl(b_lo, (off - 4) * 8)
                | shl(b_hi, off * 8)
            )
            w2 = shr(b_lo, (8 - off) * 8) | shl(b_hi, (off - 4) * 8)
            es = emit_word(es, w0 & _bmask(jnp.minimum(toklen, 4)), jnp.minimum(toklen, 4))
            nb2 = jnp.clip(toklen - 4, 0, 4)
            es = emit_word(es, w1 & _bmask(nb2), nb2)
            nb3 = jnp.clip(toklen - 8, 0, 3)
            es = emit_word(es, w2 & _bmask(nb3), nb3)
            return es

        def raw_path(es):
            # literal run (L <= 1: D holds the run length) or the L matched
            # bytes when the token is not strictly shorter (then L <= 11)
            c = jnp.where(L <= 1, jnp.minimum(jnp.maximum(D, 1), n - i), L)
            return copy_bytes(es, i, c)

        es = jax.lax.cond(use_tok, tok_path, raw_path, (opos, acc))
        consumed = jnp.where(
            use_tok, L, jnp.where(L <= 1, jnp.minimum(jnp.maximum(D, 1), n - i), L)
        )
        return (i + consumed, es[0], es[1])

    def cond(st):
        return st[0] < n

    i, opos, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    )

    @pl.when((opos & 3) != 0)
    def _partial():
        tok_ref[0, 0, jnp.minimum(opos >> 2, capw - 1)] = acc

    len_ref[0, 0, 0] = opos


def _bmask(nb):
    return jnp.where(nb >= 4, jnp.int32(-1), (jnp.int32(1) << (8 * nb)) - 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def commit_emit_words(
    x: jax.Array, L: jax.Array, D: jax.Array, lengths: jax.Array, interpret: bool = False
):
    """Sequential commit + ASCII token emission for B blocks on device.

    Args:
      x: (B, S) int32 escaped block bytes (values past ``lengths`` ignored).
      L, D: (B, S) int32 per-position match results (ops/lzss_jax semantics).
      lengths: (B,) int32.

    Returns (tokw (B, S // 4) int32 — 4 little-endian token bytes per word,
    content past ``tok_len`` bytes undefined — and tok_len (B,) int32).
    S must be a multiple of 1024.
    """
    B, S = x.shape
    if S % 1024 != 0:
        raise ValueError("S must be a multiple of 1024")
    capw = S // 4  # references are only emitted when strictly shorter

    # literal-run lengths: distance to the next position with L > 1
    # (committing any position in between emits exactly one literal byte);
    # clamped to the 13-bit D field — the walk re-reads the run at the
    # landing position, so a clamped run just commits in several hops.
    pos = jnp.arange(S, dtype=jnp.int32)[None, :]
    nz = jnp.where(L > 1, pos, S)
    next_nz = jax.lax.cummin(nz[:, ::-1], axis=1)[:, ::-1]
    run = jnp.minimum(next_nz - pos, 4095)  # >= 1 on literal positions
    Dp = jnp.where(L <= 1, run, D)

    def _nd(v):
        return (
            (v >= 10).astype(jnp.int32)
            + (v >= 100).astype(jnp.int32)
            + (v >= 1000).astype(jnp.int32)
        )

    ld = (_nd(L) << 28) | (_nd(D) << 26) | (L << LBITS) | Dp

    xb = jnp.where(x >= 0, x, 0).astype(jnp.uint32).reshape(B, S // 4, 4)
    shifts = jnp.array([0, 8, 16, 24], dtype=jnp.uint32)
    xw = jnp.sum(xb << shifts[None, None, :], axis=-1).astype(jnp.int32)
    xw = xw.reshape(B, 1, S // 4)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, S), lambda b, n: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, S // 4), lambda b, n: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, capw), lambda b, n: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda b, n: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[],
    )
    tokw, tok_len = pl.pallas_call(
        _commit_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, capw), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), ld.reshape(B, 1, S), xw)
    return tokw.reshape(B, capw), tok_len.reshape(B)


@functools.partial(jax.jit, static_argnames=("interpret",))
def commit_emit_blocks(
    x: jax.Array, L: jax.Array, D: jax.Array, lengths: jax.Array, interpret: bool = False
):
    """commit_emit_words with the words unpacked to a (B, S) byte stream
    (zero-filled past ``tok_len``)."""
    B, S = x.shape
    tokw, tok_len = commit_emit_words(x, L, D, lengths, interpret=interpret)
    sh = jnp.arange(4, dtype=jnp.int32) * 8
    tok = ((tokw[:, :, None] >> sh[None, None, :]) & 0xFF).reshape(B, S)
    pos = jnp.arange(S, dtype=jnp.int32)[None, :]
    tok = jnp.where(pos < tok_len[:, None], tok, 0)
    return tok, tok_len
