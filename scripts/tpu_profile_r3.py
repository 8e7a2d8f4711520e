"""Round-3 micro-profile: per-kernel timings at the bench shapes (TPU).

Separates each kernel inside the three encode stages (match, commit+emit,
arith+pack) and the decode kernels, so optimization effort goes where the
time actually is.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(r):
    for leaf in jax.tree_util.tree_leaves(r):
        x = leaf
        while hasattr(x, "ndim") and x.ndim:
            x = x[0]
        np.asarray(x)


def t(name, fn, *args, iters=3, warm=1, mb=None):
    for _ in range(warm):
        r = fn(*args)
        sync(r)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        sync(r)
        best = min(best, time.perf_counter() - t0)
    rate = f"  {mb / best:8.1f} MB/s" if mb else ""
    print(f"{name:34s} {best * 1e3:9.2f} ms{rate}", flush=True)
    return r, best


def main():
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    from bench import make_corpus
    from raisin_tpu.formats.lzss_ref import encode_opening_symbols
    from raisin_tpu.ops import arithmetic_pallas as ap
    from raisin_tpu.ops import arithmetic_scan, lzss_commit_pallas, lzss_jax

    BS = 4096
    B = 1024
    data = make_corpus(B * BS)
    mb = len(data) / 1e6
    blocks = [data[i : i + BS] for i in range(0, len(data), BS)]
    encs = [encode_opening_symbols(b) for b in blocks]
    S = 4096
    x = np.zeros((B, S), dtype=np.uint8)
    lengths = np.zeros(B, dtype=np.int32)
    for i, e in enumerate(encs):
        x[i, : len(e)] = np.frombuffer(e, dtype=np.uint8)
        lengths[i] = len(e)
    dx = jax.device_put(x)
    dl = jax.device_put(lengths)
    sync((dx, dl))

    pos = jnp.arange(S, dtype=jnp.int32)[None, :]

    @jax.jit
    def to_i32(xx, ll):
        return jnp.where(pos < ll[:, None], xx.astype(jnp.int32), -1)

    xi, _ = t("sentinelize", to_i32, dx, dl, mb=mb)

    # --- stage 1: match
    fm = jax.jit(
        functools.partial(
            lzss_jax.find_matches_blocks, window=4096, num_steps=S // lzss_jax.TILE
        )
    )
    (L, D), _ = t("match XLA tiled-scan", fm, xi, dl, mb=mb)
    try:
        from raisin_tpu.ops import lzss_pallas

        fmp = jax.jit(lzss_pallas.find_matches_blocks_pallas)
        t("match Pallas v2", fmp, xi, dl, mb=mb)
    except Exception as e:
        print("match pallas failed:", repr(e)[:120])

    # --- stage 2: commit + emit
    (tok, tok_len), _ = t(
        "commit_emit Pallas", lzss_commit_pallas.commit_emit_blocks, xi, L, D, dl, mb=mb
    )

    # --- stage 3: arithmetic encode + pack
    steps = (S + 8 + 511) // 512 * 512
    posn = jnp.arange(steps, dtype=jnp.int32)[None, :]

    @jax.jit
    def symbols_of(tk, tl):
        tokp = jnp.pad(tk, ((0, 0), (0, steps - S)))
        return jnp.where(posn < tl[:, None], tokp, 256)

    syms, _ = t("symbols_of", symbols_of, tok, tok_len, mb=mb)
    rows = B // 128
    sy = jnp.asarray(syms).reshape(rows, 128, steps).transpose(2, 0, 1)
    ln = jnp.asarray(tok_len).reshape(rows, 128)
    sy = jax.device_put(sy)
    sync(sy)

    (chunks, ccnts, fin), _ = t(
        "arith encode_chunked_words", ap.encode_chunked_words, sy, ln, mb=mb
    )
    G = steps // ap.CHUNK
    chunks_b = jnp.asarray(chunks).transpose(2, 3, 0, 1).reshape(B, G, ap.STC)
    cnts_b = jnp.asarray(ccnts).transpose(1, 2, 0).reshape(B, G)
    cb = jax.device_put(chunks_b)
    nb = jax.device_put(cnts_b)
    sync((cb, nb))
    capw = ((9 * steps + 64) // 32 + 2 + 1023) // 1024 * 1024
    t(
        f"arith stitch_words capw={capw}",
        functools.partial(ap.stitch_words, capw=capw),
        cb,
        nb,
        mb=mb,
    )
    enc = functools.partial(ap.encode_rows, capw=capw)
    (rows_out, byte_lens, oflow), _ = t("arith encode_rows (fused)", enc, syms, tok_len, mb=mb)

    # --- decode side
    from raisin_tpu.ops import lzss_decode_pallas as dp

    byte_lens_np = np.asarray(byte_lens)
    capb = (int(byte_lens_np.max()) + 511) // 512 * 512
    rows_np = np.asarray(rows_out[:, : capb // 4])
    prows = rows_np.view(np.uint8).reshape(B, capb).copy()
    dprows = jax.device_put(prows)
    dtl = jax.device_put(jnp.asarray(tok_len))
    sync((dprows, dtl))
    nsteps = max(128, (int(np.asarray(tok_len).max()) + 1 + 127) // 128 * 128)
    (toks_dec, eof), _ = t(
        f"arith decode_rows steps={nsteps}",
        functools.partial(ap.decode_rows, num_steps=nsteps),
        dprows,
        jnp.asarray(byte_lens_np),
        dtl,
        mb=mb,
    )
    cap_out = (2 * BS + 4095) // 4096 * 4096
    t(
        "lzss_decode_blocks Pallas",
        functools.partial(dp.lzss_decode_blocks, cap_out=cap_out),
        toks_dec,
        dtl,
        mb=mb,
    )


if __name__ == "__main__":
    main()
