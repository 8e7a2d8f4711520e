"""End-to-end container decode stage profile (host + device costs)."""
from __future__ import annotations

import time

import jax
import numpy as np


def main():
    print("backend:", jax.default_backend(), flush=True)
    from bench import make_corpus
    from raisin_tpu.parallel import blocks as pb

    MB = 4
    BS = 4096
    data = make_corpus(MB << 20)
    t0 = time.perf_counter()
    container = pb.compress_container(data, ("lzss", "arithmetic"), block_size=BS)
    print(f"encode warm: {time.perf_counter() - t0:.2f}s", flush=True)
    # warm decode
    assert pb.decompress_container(container) == data
    t0 = time.perf_counter()
    pb.decompress_container(container)
    print(f"decode warm total: {time.perf_counter() - t0:.3f}s", flush=True)

    # manual stage timing of _decode_lzss_arith_rows internals
    import functools

    from raisin_tpu.formats.lzss_ref import decode_opening_symbols_np
    from raisin_tpu.ops import arithmetic_pallas as ap
    from raisin_tpu.ops import lzss_decode_pallas as dp

    algorithms, block_size, orig_size, payloads, aux = pb.parse_container(container)
    tok_lens = aux[0]
    out_lens = [min(block_size, orig_size - i * block_size) for i in range(len(payloads))]

    def sync(r):
        for leaf in jax.tree_util.tree_leaves(r):
            x = leaf
            while hasattr(x, "ndim") and x.ndim:
                x = x[0]
            np.asarray(x)

    def stage(name, fn, iters=2):
        r = fn()
        sync(r)
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            r = fn()
            sync(r)
            best = min(best, time.perf_counter() - t0)
        print(f"  {name:30s} {best * 1e3:8.2f} ms", flush=True)
        return r

    t0 = time.perf_counter()
    B = pb._pad_block_count(len(payloads), None, align=128)
    capb = (max(len(p) for p in payloads) + 511) // 512 * 512
    steps = max(128, (max(tok_lens) + 1 + 127) // 128 * 128)
    cap_out = (2 * max(out_lens) + 4095) // 4096 * 4096
    prows = np.zeros((B, capb), dtype=np.uint8)
    blens = np.zeros(B, dtype=np.int32)
    tlens = np.zeros(B, dtype=np.int32)
    for i, p in enumerate(payloads):
        prows[i, : len(p)] = np.frombuffer(p, dtype=np.uint8)
        blens[i] = len(p)
        tlens[i] = tok_lens[i]
    print(f"  host fill: {(time.perf_counter() - t0) * 1e3:.2f} ms", flush=True)

    dprows = stage("h2d prows", lambda: jax.device_put(prows))
    dblens = jax.device_put(blens)
    dtlens = jax.device_put(tlens)
    sync((dblens, dtlens))

    toks, eof = stage(
        f"arith decode_rows steps={steps}",
        lambda: ap.decode_rows(dprows, dblens, dtlens, num_steps=steps),
    )
    rows, olens = stage(
        f"lzss_decode cap={cap_out}",
        lambda: dp.lzss_decode_blocks(toks, dtlens, cap_out=cap_out),
    )
    olens_np = np.asarray(olens)
    need_w = min(((int(olens_np[: len(payloads)].max()) + 3) // 4 + 128) // 128 * 128, rows.shape[1])
    rows_np = stage("d2h rows", lambda: np.asarray(rows[:, :need_w]))

    t0 = time.perf_counter()
    out = []
    for i in range(len(payloads)):
        esc = rows_np[i].tobytes()[: olens_np[i]]
        dec = decode_opening_symbols_np(esc)
        out.append(dec)
    joined = b"".join(out)
    print(f"  host escape+assemble: {(time.perf_counter() - t0) * 1e3:.2f} ms", flush=True)
    assert joined == data


if __name__ == "__main__":
    main()
