"""Benchmark entry point: prints ONE JSON line for the driver.

Metric: end-to-end encode throughput (MB/s) of the default lzss,arithmetic
pipeline in RSNB block-parallel container mode on the available accelerator
(bytes in -> container bytes out, including host assembly).

Baseline: the reference publishes no GB/s figures (BASELINE.md). The only
measured datapoint is raisin-Go's arithmetic coder at 40155 B / 20.89 ms
= 1.92 MB/s (reference ai/data.json:1-30) — and its LZSS (goroutine per
byte) is far slower, so using 1.92 MB/s for the full lzss+arithmetic
pipeline is conservative in Go's favor.

Env knobs:
  RAISIN_BENCH_MB       input size in MiB (default 4)
  RAISIN_BENCH_BLOCK    block size in bytes (default 16384)
  RAISIN_BENCH_ITERS    timed iterations (default 3)
  RAISIN_TPU_PLATFORM   force a jax platform (e.g. cpu)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

GO_BASELINE_MBPS = 40155 / 20.89e-3 / 1e6  # ai/data.json: arithmetic, 40155 B in 20.89 ms


def make_corpus(n_bytes: int, seed: int = 0) -> bytes:
    """Deterministic text-like corpus (word soup with repetition structure)."""
    rng = np.random.default_rng(seed)
    words = [
        b"the", b"quick", b"brown", b"fox", b"jumps", b"over", b"lazy", b"dog",
        b"compression", b"entropy", b"arithmetic", b"huffman", b"lzss", b"window",
        b"token", b"block", b"stream", b"model", b"frequency", b"symbol",
    ]
    idx = rng.integers(0, len(words), size=n_bytes // 5 + 16)
    out = b" ".join(words[i] for i in idx)
    return out[:n_bytes]


def main() -> None:
    mb = float(os.environ.get("RAISIN_BENCH_MB", "4"))
    block = int(os.environ.get("RAISIN_BENCH_BLOCK", "16384"))
    iters = int(os.environ.get("RAISIN_BENCH_ITERS", "3"))

    import jax

    from raisin_tpu.parallel.blocks import compress_container, decompress_container

    data = make_corpus(int(mb * (1 << 20)))

    # warm-up: compile + one full pass, and verify losslessness
    t0 = time.perf_counter()
    container = compress_container(data, ("lzss", "arithmetic"), block_size=block)
    warm = time.perf_counter() - t0
    assert decompress_container(container) == data, "bench round-trip failed"

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        container = compress_container(data, ("lzss", "arithmetic"), block_size=block)
        times.append(time.perf_counter() - t0)
    best = min(times)
    mbps = len(data) / best / 1e6
    ratio = len(container) / len(data) * 100

    result = {
        "metric": "encode_throughput_lzss_arithmetic_blocks",
        "value": round(mbps, 3),
        "unit": "MB/s",
        "vs_baseline": round(mbps / GO_BASELINE_MBPS, 2),
        "detail": {
            "input_mb": round(len(data) / 1e6, 2),
            "block_size": block,
            "compression_ratio_pct": round(ratio, 2),
            "warmup_s": round(warm, 2),
            "best_s": round(best, 4),
            "device": str(jax.devices()[0]),
            "go_baseline_mbps": round(GO_BASELINE_MBPS, 2),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
