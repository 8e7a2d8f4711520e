"""Bridge the fast bisect scaffold (~0ms net) to the slow real kernel (~60ms
net) by adding one structural element at a time."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raisin_tpu.ops import arithmetic_pallas as ap

ROWS, LANES, CHUNK, NSYM2, STC = 8, 128, 128, ap.NSYM2, ap.STC
_shl, _shr, _mask, _append32 = ap._shl, ap._shr, ap._mask, ap._append32


def sync(r):
    for leaf in jax.tree_util.tree_leaves(r):
        x = leaf
        while hasattr(x, "ndim") and x.ndim:
            x = x[0]
        np.asarray(x)


def t(name, fn, *args, iters=3):
    sync(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best * 1e3:8.2f} ms", flush=True)


def build(level, S=4608):
    """level: 0=empty, 1=+append32x2, 2=+guarded w1/v1, 3=+stage out block,
    4=+stage masked write, 5=+big scratch allocated, 6=+model reduce."""
    G = S // CHUNK
    big_out = level >= 3

    def kern(*refs):
        if level >= 5:
            sym_ref, len_ref, chunk_ref, ccnt_ref, low, high, acc, nb, cum, stage = refs
        elif big_out:
            sym_ref, len_ref, chunk_ref, ccnt_ref, low, high, acc, nb, stage = refs
        else:
            sym_ref, len_ref, ccnt_ref, low, high, acc, nb = refs
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _init():
            low[:] = jnp.zeros((ROWS, LANES), jnp.int32)
            high[:] = jnp.full((ROWS, LANES), 0xFFFF, jnp.int32)
            acc[:] = jnp.zeros((ROWS, LANES), jnp.int32)
            nb[:] = jnp.zeros((ROWS, LANES), jnp.int32)
            if level >= 5:
                w2 = jax.lax.broadcasted_iota(jnp.int32, (NSYM2, ROWS, LANES), 0) * 2
                cum[:] = w2 | ((w2 + 1) << 15)

        if big_out:
            stage[:] = jnp.zeros((STC, ROWS, LANES), jnp.int32)
            siota = jax.lax.broadcasted_iota(jnp.int32, (STC, ROWS, LANES), 0)
        if level >= 6:
            iota2 = jax.lax.broadcasted_iota(jnp.int32, (NSYM2, ROWS, LANES), 0)
        n = len_ref[:]

        def body(s, carry):
            lowv, highv, accv, nbv, sidx = carry
            sym = sym_ref[s]
            active = (pid * CHUNK + s) <= n
            if level >= 6:
                cumv = cum[:]
                ws = (sym >> 1)[None]
                red0 = jnp.sum(jnp.where(iota2 == ws, cumv, 0), axis=0)
                lower = red0 & 0x7FFF
                upper = red0 >> 15
                cum[:] = cumv + jnp.where(active[None] & (iota2 > ws), 32769, 0)
            else:
                lower, upper = sym, sym + 1
            diff = highv - lowv + 1
            nh = jnp.where(active, lowv + (diff * upper) // (sym + 257) - 1, highv)
            nl = jnp.where(active, lowv + (diff * lower) // (sym + 257), lowv)
            if level >= 2:
                w1 = jnp.where(active, 1 + (sym & 15), 0)
                w1 = jnp.minimum(w1, 32)
                v1 = jnp.where((sym & 1) == 1, _shl(jnp.int32(1), w1 - 1), _mask(w1 - 1))
            else:
                w1 = sym & 15
                v1 = sym
            if level >= 1:
                accv, nbv, word_a, ca = _append32(accv, nbv, v1, w1)
                accv, nbv, word_b, cb = _append32(accv, nbv, nl, sym & 7)
            else:
                accv = accv + v1
                nbv = nbv + w1
                word_a, ca = accv, (sym & 1) == 0
                word_b, cb = nbv, (sym & 1) == 1
            ca32 = ca.astype(jnp.int32)
            if level >= 4:
                sa = sidx[None]
                stage[:] = jnp.where(
                    (siota == sa) & ca[None], word_a[None],
                    jnp.where((siota == sa + ca32[None]) & cb[None], word_b[None], stage[:]),
                )
            sidx = sidx + ca32 + cb.astype(jnp.int32)
            return (nl, nh, accv, nbv, sidx)

        zero = jnp.zeros((ROWS, LANES), jnp.int32)
        carry = (low[:], high[:], acc[:], nb[:], zero)
        lowv, highv, accv, nbv, sidx = jax.lax.fori_loop(0, CHUNK, body, carry)
        low[:] = lowv
        high[:] = highv
        acc[:] = accv
        nb[:] = nbv
        if big_out:
            chunk_ref[0] = stage[:]
        ccnt_ref[0] = sidx

    in_specs = [
        pl.BlockSpec((CHUNK, ROWS, LANES), lambda g: (g, 0, 0)),
        pl.BlockSpec((ROWS, LANES), lambda g: (0, 0)),
    ]
    out_specs = []
    out_shape = []
    if big_out:
        out_specs.append(pl.BlockSpec((1, STC, ROWS, LANES), lambda g: (g, 0, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((G, STC, ROWS, LANES), jnp.int32))
    out_specs.append(pl.BlockSpec((1, ROWS, LANES), lambda g: (g, 0, 0)))
    out_shape.append(jax.ShapeDtypeStruct((G, ROWS, LANES), jnp.int32))
    scratch = [pltpu.VMEM((ROWS, LANES), jnp.int32)] * 4
    if level >= 5:
        scratch.append(pltpu.VMEM((NSYM2, ROWS, LANES), jnp.int32))
    if big_out:
        scratch.append(pltpu.VMEM((STC, ROWS, LANES), jnp.int32))

    return jax.jit(lambda sy, ln: pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(sy, ln))


def main():
    print("backend:", jax.default_backend(), flush=True)
    S = 4608
    rng = np.random.default_rng(0)
    sy = jnp.asarray(rng.integers(0, 256, (S, ROWS, LANES)), dtype=jnp.int32)
    ln = jnp.full((ROWS, LANES), S - 10, jnp.int32)
    for lvl, name in [
        (0, "base (div+state carry)"),
        (1, "+append32 x2"),
        (2, "+guarded w1/v1"),
        (3, "+big chunk output"),
        (4, "+stage masked write"),
        (5, "+cum scratch allocated"),
        (6, "+model reduce+update"),
    ]:
        t(f"lvl{lvl} {name}", build(lvl), sy, ln)


if __name__ == "__main__":
    main()
