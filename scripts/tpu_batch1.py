"""TPU batch 1: validate + time the Pallas arithmetic encoder; micro-bench
scalar-loop and staged-select costs to size the expansion kernel design."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(r):
    for leaf in jax.tree_util.tree_leaves(r):
        x = leaf
        while hasattr(x, "ndim") and x.ndim:
            x = x[0]
        np.asarray(x)


def t(fn, *args, iters=3, warm=1):
    for _ in range(warm):
        sync(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    from bench import make_corpus
    from raisin_tpu.ops import arithmetic_scan, arithmetic_pallas as ap

    # ---- correctness: pallas events vs XLA events on TPU (small S)
    rng = np.random.default_rng(0)
    B, S = 1024, 1024
    symbols = np.full((B, S), ap.EOF, dtype=np.int32)
    lengths = np.zeros(B, dtype=np.int32)
    data = make_corpus(B * 700)
    for i in range(B):
        p = data[i * 700 : (i + 1) * 700]
        symbols[i, : len(p)] = np.frombuffer(p, np.uint8)
        lengths[i] = len(p)
    sp, s0p = ap.encode_blocks_events(symbols, lengths)
    sx, s0x = arithmetic_scan._events_xla(jnp.asarray(symbols), jnp.asarray(lengths), S)
    eq1 = bool(jnp.all(sp == sx.astype(jnp.uint8)))
    eq2 = bool(jnp.all(s0p == s0x))
    print("pallas-vs-xla slots equal:", eq1, "slot0 equal:", eq2, flush=True)

    # renorm-iteration distribution (to size expansion fast paths)
    nvalid = np.asarray((np.asarray(sp) & 0x80) != 0).sum(axis=2)
    act = np.arange(S)[None, :] <= lengths[:, None]
    iters_hist = np.bincount(nvalid[act].ravel(), minlength=17)
    print("renorm iters hist (symbols):", iters_hist.tolist(), flush=True)

    # ---- speed: pallas encoder at production shape
    B2, S2 = 1024, 4224
    sym2 = np.full((B2, S2), ap.EOF, dtype=np.int32)
    len2 = np.zeros(B2, dtype=np.int32)
    data2 = make_corpus(B2 * 4096)
    for i in range(B2):
        p = data2[i * 4096 : (i + 1) * 4096]
        sym2[i, : len(p)] = np.frombuffer(p, np.uint8)
        len2[i] = len(p)
    d_sym = jax.device_put(sym2)
    d_len = jax.device_put(len2)
    sec = t(ap.encode_blocks_events, d_sym, d_len)
    mb = B2 * 4096 / 1e6
    print(f"arith pallas events: {sec:.4f}s  ({mb/sec:.1f} MB/s, {mb:.1f} MB)", flush=True)

    # transposed entry (excludes the (B,S)->(S,R,128) transpose)
    sy = jnp.asarray(sym2.reshape(8, 128, S2).transpose(2, 0, 1))
    ln = jnp.asarray(len2.reshape(8, 128))
    sec = t(ap.encode_events, sy, ln)
    print(f"arith pallas events (pre-transposed): {sec:.4f}s ({mb/sec:.1f} MB/s)", flush=True)

    # ---- micro: scalar loop + staged select cost (expansion feasibility)
    OUT_R = 8

    def mk_kernel(scalar_ops: int):
        def k(w_ref, o_ref, acc_ref):
            Js = (
                jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 128
                + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            )

            def body(s, carry):
                acc, nb = carry
                w = w_ref[0, s]
                for _ in range(scalar_ops):
                    acc = (acc ^ w) + (acc >> 3)
                    nb = nb + (w & 1)
                # one staged select per step
                acc_ref[:] = jnp.where(Js == (s % 1024), acc, acc_ref[:])
                return acc, nb

            acc, nb = jax.lax.fori_loop(0, w_ref.shape[1], body, (jnp.int32(0), jnp.int32(0)))
            o_ref[0, 0, 0] = acc + nb

        return k

    words = np.asarray(rng.integers(0, 2**20, size=(256, 4224)), dtype=np.int32)
    dw = jax.device_put(words)
    for ops in (2, 8, 24):
        fn = jax.jit(
            lambda w, ops=ops: pl.pallas_call(
                mk_kernel(ops),
                grid=(w.shape[0],),
                in_specs=[pl.BlockSpec((1, w.shape[1]), lambda b: (b, 0), memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
                out_shape=jax.ShapeDtypeStruct((w.shape[0], 1, 1), jnp.int32),
                scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
                compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
            )(w)
        )
        sec = t(fn, dw)
        steps = words.size
        print(f"scalar loop ({ops} ops + 1 select): {sec:.4f}s  = {sec*940e6/steps:.1f} cyc/step", flush=True)

    # ---- match kernels at 4 KiB blocks
    from raisin_tpu.ops import lzss_pallas, lzss_jax
    x = np.full((1024, 4096), -1, dtype=np.int32)
    xl = np.zeros(1024, dtype=np.int32)
    for i in range(1024):
        p = data2[i * 4096 : (i + 1) * 4096]
        x[i, : len(p)] = np.frombuffer(p, np.uint8)
        xl[i] = len(p)
    dx = jax.device_put(x)
    dxl = jax.device_put(xl)
    sec = t(lzss_pallas.find_matches_blocks_pallas, dx, dxl)
    print(f"match pallas 4k: {sec:.4f}s  ({mb/sec:.1f} MB/s)", flush=True)

    import functools
    fm = functools.partial(lzss_jax.find_matches_blocks, window=4096, num_steps=4096 // lzss_jax.TILE)
    sec = t(fm, dx, dxl)
    print(f"match xla 4k: {sec:.4f}s  ({mb/sec:.1f} MB/s)", flush=True)

    L, D = fm(dx, dxl)
    sec = t(lzss_jax.commit_blocks, dx, L, D, dxl)
    print(f"commit xla 4k: {sec:.4f}s  ({mb/sec:.1f} MB/s)", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
