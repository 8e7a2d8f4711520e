"""Stage-level config sweep on the real TPU (round 3 perf work).

Times each encode stage at candidate configs:
  - arithmetic encode_rows at B=1024 (rows=8) vs B=2048 (rows=16)
  - match find_matches_blocks at TILE=8 vs TILE=16
  - commit_emit_blocks baseline
Prints one line per (stage, config) with ns/byte.
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import make_corpus  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from raisin_tpu.formats.lzss_ref import encode_opening_symbols  # noqa: E402
from raisin_tpu.ops import arithmetic_pallas, lzss_commit_pallas, lzss_jax  # noqa: E402


def sync(r):
    for leaf in jax.tree_util.tree_leaves(r):
        x = leaf
        while hasattr(x, "ndim") and x.ndim:
            x = x[0]
        np.asarray(x)


def best(fn, iters=3):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    block = 4096
    nbytes = 8 << 20
    data = make_corpus(nbytes)
    blocks = [data[i : i + block] for i in range(0, len(data), block)]
    encs = [encode_opening_symbols(b) for b in blocks]
    S = 4096
    B_all = len(encs)
    x_all = np.zeros((B_all, S), dtype=np.uint8)
    lens_all = np.zeros(B_all, dtype=np.int32)
    for i, e in enumerate(encs):
        x_all[i, : len(e)] = np.frombuffer(e, dtype=np.uint8)
        lens_all[i] = len(e)

    results = {}

    for B in (1024, 2048):
        nb = B * block
        x = jax.device_put(x_all[:B])
        ln = jax.device_put(lens_all[:B])
        pos = jnp.arange(S, dtype=jnp.int32)[None, :]

        @jax.jit
        def to_i32(xx, ll):
            return jnp.where(pos < ll[:, None], xx.astype(jnp.int32), -1)

        xi = to_i32(x, ln)
        sync(xi)

        # --- match at TILE variants
        for tile in (8, 16):
            lzss_jax.TILE = tile
            fm = jax.jit(
                functools.partial(
                    lzss_jax.find_matches_blocks, window=4096, num_steps=S // tile
                )
            )
            sync(fm(xi, ln))
            t = best(lambda: fm(xi, ln))
            results[f"match_B{B}_T{tile}"] = t / nb * 1e9
            print(f"match  B={B} TILE={tile}: {t*1e3:8.2f} ms  {t/nb*1e9:6.2f} ns/B", flush=True)
        lzss_jax.TILE = 8
        fm = jax.jit(functools.partial(lzss_jax.find_matches_blocks, window=4096, num_steps=S // 8))
        L, D = fm(xi, ln)
        sync((L, D))

        # --- commit
        ce = lzss_commit_pallas.commit_emit_blocks
        sync(ce(xi, L, D, ln))
        t = best(lambda: ce(xi, L, D, ln))
        results[f"commit_B{B}"] = t / nb * 1e9
        print(f"commit B={B}: {t*1e3:8.2f} ms  {t/nb*1e9:6.2f} ns/B", flush=True)

        tok, tok_len = ce(xi, L, D, ln)
        steps = (S + 8 + 511) // 512 * 512
        posn = jnp.arange(steps, dtype=jnp.int32)[None, :]

        @jax.jit
        def symbols_of(tk, tl):
            tokp = jnp.pad(tk, ((0, 0), (0, steps - S)))
            return jnp.where(posn < tl[:, None], tokp, 256)

        syms = symbols_of(tok, tok_len)
        sync(syms)
        capw = ((9 * steps + 64) // 32 + 2 + 1023) // 1024 * 1024
        enc = functools.partial(arithmetic_pallas.encode_rows, capw=capw)
        sync(enc(syms, tok_len))
        t = best(lambda: enc(syms, tok_len))
        results[f"arith_B{B}"] = t / nb * 1e9
        print(f"arith  B={B}: {t*1e3:8.2f} ms  {t/nb*1e9:6.2f} ns/B", flush=True)

    print(results)


if __name__ == "__main__":
    main()
