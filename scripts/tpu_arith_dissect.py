"""Dissect the Pallas arithmetic encoder: time stripped variants to find
where the 80ms/4MiB goes (model, renorm, append, loop scaffolding)."""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raisin_tpu.ops import arithmetic_pallas as ap

ROWS, LANES, NSYM2, STC, CHUNK = ap.ROWS, ap.LANES, ap.NSYM2, ap.STC, ap.CHUNK
MAX_CODE, ONE_FOURTH, ONE_HALF, THREE_FOURTHS = (
    ap.MAX_CODE, ap.ONE_FOURTH, ap.ONE_HALF, ap.THREE_FOURTHS,
)
MAX_FREQ, RENORM_ITERS = ap.MAX_FREQ, ap.RENORM_ITERS
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
    print(f"{name:42s} {best * 1e3:8.2f} ms", flush=True)


def make_kernel(do_model, do_renorm, do_append, renorm_iters=RENORM_ITERS):
    def kern(sym_ref, len_ref, chunk_ref, ccnt_ref, fin_ref,
             low, high, pend, cnt, frozen, acc, nb, flag, cum, stage, swid):
        rows = len_ref.shape[0]
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _init():
            low[:] = jnp.zeros((rows, LANES), jnp.int32)
            high[:] = jnp.full((rows, LANES), MAX_CODE, jnp.int32)
            pend[:] = jnp.zeros((rows, LANES), jnp.int32)
            cnt[:] = jnp.full((rows, LANES), 257, jnp.int32)
            frozen[:] = jnp.zeros((rows, LANES), jnp.int32)
            acc[:] = jnp.zeros((rows, LANES), jnp.int32)
            nb[:] = jnp.zeros((rows, LANES), jnp.int32)
            flag[:] = jnp.zeros((rows, LANES), jnp.int32)
            w2 = jax.lax.broadcasted_iota(jnp.int32, (NSYM2, rows, LANES), 0) * 2
            cum[:] = w2 | ((w2 + 1) << 15)

        stage[:] = jnp.zeros((STC, rows, LANES), jnp.int32)
        swid[:] = jnp.zeros((rows, LANES), jnp.int32)
        n = len_ref[:]
        iota2 = jax.lax.broadcasted_iota(jnp.int32, (NSYM2, rows, LANES), 0)
        siota = jax.lax.broadcasted_iota(jnp.int32, (STC, rows, LANES), 0)

        def body(s, _):
            g = pid * CHUNK + s
            sym = sym_ref[s]
            active = g <= n
            lowv, highv, pendv = low[:], high[:], pend[:]
            cntv, frz = cnt[:], frozen[:]

            if do_model:
                cumv = cum[:]
                ws = (sym >> 1)[None, :, :]
                even = (sym & 1) == 0
                red0 = jnp.sum(jnp.where(iota2 == ws, cumv, 0), axis=0)
                red1 = jnp.sum(jnp.where(iota2 == ws + 1, cumv, 0), axis=0)
                lower = jnp.where(even, red0 & 0x7FFF, red0 >> 15)
                upper = jnp.where(even, red0 >> 15, red1 & 0x7FFF)
                upd = active & (frz == 0)
                incr = jnp.where(
                    iota2 > ws, 32769,
                    jnp.where(iota2 == ws, jnp.where(even, 32768, 0)[None], 0),
                )
                cum[:] = cumv + jnp.where(upd[None], incr, 0)
            else:
                lower = sym
                upper = sym + 1
                upd = active & (frz == 0)
            count = cntv
            newcnt = jnp.where(upd, cntv + 1, cntv)
            cnt[:] = newcnt
            frozen[:] = jnp.where(newcnt >= MAX_FREQ, 1, frz)

            diff = highv - lowv + 1
            nh = jnp.where(active, lowv + (diff * upper) // count - 1, highv)
            nl = jnp.where(active, lowv + (diff * lower) // count, lowv)

            done = ~active
            has_emitted = jnp.zeros((rows, LANES), jnp.bool_)
            b0 = jnp.zeros((rows, LANES), jnp.int32)
            carried = jnp.zeros((rows, LANES), jnp.int32)
            rest_pat = jnp.zeros((rows, LANES), jnp.int32)
            rest_len = jnp.zeros((rows, LANES), jnp.int32)
            if do_renorm:
                for _ in range(renorm_iters):
                    e1 = nh < ONE_HALF
                    e2 = nl >= ONE_HALF
                    e3 = (nl >= ONE_FOURTH) & (nh < THREE_FOURTHS)
                    cont = (e1 | e2 | e3) & ~done
                    emit = (e1 | e2) & cont
                    straddle = cont & ~emit
                    bit = jnp.where(e2, 1, 0)
                    is_first = emit & ~has_emitted
                    b0 = jnp.where(is_first, bit, b0)
                    carried = jnp.where(is_first, pendv, carried)
                    later = emit & has_emitted
                    width = 1 + pendv
                    piece = jnp.where(bit == 1, _shl(jnp.int32(1), pendv), _mask(pendv))
                    rest_pat = jnp.where(later, _shl(rest_pat, width) | piece, rest_pat)
                    rest_len = jnp.where(later, rest_len + width, rest_len)
                    has_emitted = has_emitted | emit
                    pendv = jnp.where(emit, 0, jnp.where(straddle, pendv + 1, pendv))
                    sub = jnp.where(straddle, ONE_FOURTH, jnp.where(e2, ONE_HALF, 0))
                    nl = jnp.where(cont, (nl - sub) << 1, nl)
                    nh = jnp.where(cont, ((nh - sub) << 1) + 1, nh)
                    done = done | ~cont

            w1 = jnp.where(has_emitted, 1 + carried, 0)
            flag[:] = jnp.where(w1 > 32, 1, flag[:])
            w1 = jnp.minimum(w1, 32)
            v1 = jnp.where(b0 == 1, _shl(jnp.int32(1), w1 - 1), _mask(w1 - 1))
            accv, nbv = acc[:], nb[:]
            accv, nbv, word_a, ca = _append32(accv, nbv, v1, w1)
            accv, nbv, word_b, cb = _append32(accv, nbv, rest_pat, rest_len)
            acc[:] = accv
            nb[:] = nbv
            low[:] = nl
            high[:] = nh
            pend[:] = pendv

            if do_append:
                sidx = swid[:]
                ca32 = ca.astype(jnp.int32)
                sa = sidx[None]
                stage[:] = jnp.where(
                    (siota == sa) & ca[None], word_a[None],
                    jnp.where((siota == sa + ca32[None]) & cb[None], word_b[None], stage[:]),
                )
                swid[:] = sidx + ca32 + cb.astype(jnp.int32)
            else:
                swid[:] = swid[:] + ca.astype(jnp.int32) + cb.astype(jnp.int32)
            return 0

        jax.lax.fori_loop(0, CHUNK, body, 0)
        chunk_ref[0] = stage[:]
        ccnt_ref[0] = swid[:]
        flag[:] = jnp.where(swid[:] > STC, 1, flag[:])
        fin_ref[0] = acc[:]
        fin_ref[1] = nb[:]
        fin_ref[2] = flag[:]

    return kern


def build(kern, S, rows):
    G = S // CHUNK
    return jax.jit(lambda sy, ln: pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((CHUNK, rows, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((rows, LANES), lambda g: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, STC, rows, LANES), lambda g: (g, 0, 0, 0)),
            pl.BlockSpec((1, rows, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((3, rows, LANES), lambda g: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, STC, rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((G, rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((3, rows, LANES), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((rows, LANES), jnp.int32)] * 8
        + [
            pltpu.VMEM((NSYM2, rows, LANES), jnp.int32),
            pltpu.VMEM((STC, rows, LANES), jnp.int32),
            pltpu.VMEM((rows, LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(sy, ln))


def main():
    print("backend:", jax.default_backend(), flush=True)
    S, rows = 4608, 8
    rng = np.random.default_rng(0)
    sy = jnp.asarray(rng.integers(0, 256, (S, rows, LANES)), dtype=jnp.int32)
    ln = jnp.full((rows, LANES), S - 10, jnp.int32)
    variants = [
        ("full", (True, True, True)),
        ("no append", (True, True, False)),
        ("no model", (False, True, True)),
        ("no renorm", (True, False, True)),
        ("scaffold only", (False, False, False)),
    ]
    for name, (m, r, a) in variants:
        t(f"pack[{name}]", build(make_kernel(m, r, a), S, rows), sy, ln)
    t("pack[renorm=8]", build(make_kernel(True, True, True, renorm_iters=8), S, rows), sy, ln)


if __name__ == "__main__":
    main()
