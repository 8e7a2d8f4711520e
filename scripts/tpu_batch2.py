"""TPU batch 2: fused encode_rows correctness+speed; match/commit timings;
scalar-loop micro-bench with the fixed SMEM layout."""
from __future__ import annotations

import functools
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
    from raisin_tpu.ops import arithmetic_pallas as ap
    from raisin_tpu.formats import arithmetic_ref

    # ---- encode_rows correctness on TPU (small)
    rng = np.random.default_rng(1)
    B, S = 128, 512
    payloads = [rng.integers(0, 256, size=int(rng.integers(0, S - 1)), dtype=np.uint8).tobytes() for _ in range(12)]
    payloads += [b"", b"a", b"hello world, hello world, hello", b"\xff" * 400, (b"ab" * 250)[:499]]
    symbols = np.full((B, S), ap.EOF, dtype=np.int32)
    lengths = np.zeros(B, dtype=np.int32)
    for i, p in enumerate(payloads):
        symbols[i, : len(p)] = np.frombuffer(p, np.uint8)
        lengths[i] = len(p)
    rows, blens, oflow = ap.encode_rows(symbols, lengths, capw=1024)
    rows = np.asarray(rows)
    blens = np.asarray(blens)
    ok = all(
        rows[i].tobytes()[: blens[i]] == arithmetic_ref.compress(p)
        for i, p in enumerate(payloads)
    )
    print("encode_rows TPU byte-exact:", ok, "oflow:", bool(np.asarray(oflow)[: len(payloads)].any()), flush=True)

    # ---- encode_rows speed at production shape
    B2, S2 = 1024, 4608
    sym2 = np.full((B2, S2), ap.EOF, dtype=np.int32)
    len2 = np.zeros(B2, dtype=np.int32)
    data2 = make_corpus(B2 * 4096)
    for i in range(B2):
        p = data2[i * 4096 : (i + 1) * 4096]
        sym2[i, : len(p)] = np.frombuffer(p, np.uint8)
        len2[i] = len(p)
    d_sym = jax.device_put(sym2)
    d_len = jax.device_put(len2)
    mb = B2 * 4096 / 1e6
    enc = functools.partial(ap.encode_rows, capw=2048)
    sec = t(enc, d_sym, d_len)
    print(f"encode_rows: {sec:.4f}s  ({mb/sec:.1f} MB/s of {mb:.1f} MB)", flush=True)

    # split: pass A alone
    sy = jnp.asarray(sym2.reshape(8, 128, S2).transpose(2, 0, 1))
    ln = jnp.asarray(len2.reshape(8, 128))
    sec = t(ap.encode_packed_words, sy, ln)
    print(f"  pass A (packed words): {sec:.4f}s ({mb/sec:.1f} MB/s)", flush=True)

    # ---- scalar loop micro (fixed layout)
    def mk_kernel(scalar_ops: int):
        def k(w_ref, o_ref, acc_ref):
            Js = (
                jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 128
                + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            )

            def body(s, carry):
                acc, nb = carry
                w = w_ref[0, 0, s]
                for _ in range(scalar_ops):
                    acc = (acc ^ w) + (acc >> 3)
                    nb = nb + (w & 1)
                acc_ref[:] = jnp.where(Js == (s % 1024), acc, acc_ref[:])
                return acc, nb

            acc, nb = jax.lax.fori_loop(0, w_ref.shape[2], body, (jnp.int32(0), jnp.int32(0)))
            o_ref[0, 0, 0] = acc + nb

        return k

    words = np.asarray(rng.integers(0, 2**20, size=(256, 1, 4224)), dtype=np.int32)
    dw = jax.device_put(words)
    for ops in (2, 8):
        fn = jax.jit(
            lambda w, ops=ops: pl.pallas_call(
                mk_kernel(ops),
                grid=(w.shape[0],),
                in_specs=[pl.BlockSpec((1, 1, w.shape[2]), lambda b: (b, 0, 0), memory_space=pltpu.SMEM)],
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

    fm = functools.partial(lzss_jax.find_matches_blocks, window=4096, num_steps=4096 // lzss_jax.TILE)
    sec = t(fm, dx, dxl)
    print(f"match xla 4k: {sec:.4f}s  ({mb/sec:.1f} MB/s)", flush=True)

    L, D = fm(dx, dxl)
    sec = t(lzss_jax.commit_blocks, dx, L, D, dxl)
    print(f"commit xla 4k: {sec:.4f}s  ({mb/sec:.1f} MB/s)", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
