"""Scaling-efficiency measurement over a virtual device mesh.

BASELINE.json's metric set includes "scaling efficiency at 1/8/N" — real
multi-chip hardware is not available in this environment, so this measures
the container encode/decode path over an N-device *virtual CPU mesh*
(XLA_FLAGS=--xla_force_host_platform_device_count). The point is to prove
the sharded program (shard_map over the 'data' axis, parallel/blocks.py)
scales, with real data dependencies and real collectives, not to report
absolute CPU MB/s.

Writes SCALING.md (human table) and scaling.json (machine row per N).

Usage: python scripts/scaling_bench.py [--mb 2] [--block 4096] [--devices 1,2,4,8]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(n: int, mb: float, block: int, iters: int) -> None:
    import numpy as np  # noqa: F401

    sys.path.insert(0, REPO)
    from bench import make_corpus
    from raisin_tpu.parallel.blocks import compress_container, decompress_container
    from raisin_tpu.parallel.mesh import data_mesh

    data = make_corpus(int(mb * (1 << 20)))
    # n=1 runs the SAME shard_map program on a 1-device mesh, so speedups
    # are measured against an identical code path (not the unsharded
    # single-call variant, whose CPU performance pathology made earlier
    # baselines meaningless)
    mesh = data_mesh(n)
    container = compress_container(data, ("lzss", "arithmetic"), block_size=block, mesh=mesh)
    assert decompress_container(container, mesh=mesh) == data, "scaling bench round-trip failed"

    def best(fn):
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return min(times)

    enc = best(lambda: compress_container(data, ("lzss", "arithmetic"), block_size=block, mesh=mesh))
    dec = best(lambda: decompress_container(container, mesh=mesh))
    print(json.dumps({
        "devices": n,
        "encode_s": round(enc, 4),
        "decode_s": round(dec, 4),
        "encode_mbps": round(len(data) / enc / 1e6, 3),
        "decode_mbps": round(len(data) / dec / 1e6, 3),
        "blocks": (len(data) + block - 1) // block,
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=0.5)
    ap.add_argument("--block", type=int, default=4096)
    ap.add_argument("--devices", default="1,2,8")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--worker", type=int, default=0, help="internal")
    args = ap.parse_args()

    if args.worker:
        worker(args.worker, args.mb, args.block, args.iters)
        return

    rows = []
    for n in [int(x) for x in args.devices.split(",")]:
        env = dict(os.environ)
        env["RAISIN_TPU_PLATFORM"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "") + f" --xla_force_host_platform_device_count={max(n, 1)}"
        ).strip()
        # pin the process to n cores: one host core per virtual device, so
        # wall-clock speedup reflects the sharded program, not host thread
        # oversubscription (virtual devices share one machine)
        cmd = [sys.executable, os.path.abspath(__file__), "--worker", str(n),
               "--mb", str(args.mb), "--block", str(args.block), "--iters", str(args.iters)]
        ncores = os.cpu_count() or 1
        if n <= ncores:
            cmd = ["taskset", "-c", f"0-{n - 1}" if n > 1 else "0"] + cmd
        out = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd=REPO)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"devices={n} FAILED:\n{out.stdout}\n{out.stderr}", file=sys.stderr)
            continue
        row = json.loads(line[-1])
        rows.append(row)
        print(line[-1], flush=True)

    if not rows:
        sys.exit(1)
    base = rows[0]
    ncores = os.cpu_count() or 1
    md = [
        "# Scaling efficiency (virtual CPU mesh)",
        "",
        f"Container `lzss,arithmetic` encode/decode of {args.mb} MiB "
        f"({rows[0]['blocks']} x {args.block} B blocks), sharded over an N-device",
        "`data` mesh via `shard_map` (parallel/blocks.py). EVERY row —",
        "including N=1 — runs the identical shard_map program, so ratios",
        "compare like with like. Virtual devices",
        "(`--xla_force_host_platform_device_count`) run the same partitioned",
        "HLO and collectives as real chips; absolute MB/s is CPU-bound and",
        "NOT the per-chip TPU number (see BENCH_r*.json for that).",
        "",
        f"This host has {ncores} physical cores. Rows with devices <= cores are",
        "pinned one-core-per-device (taskset) and measure real parallel",
        "speedup; rows beyond the core count CANNOT speed up on this host —",
        "for them the meaningful claim is that wall time stays ~flat vs the",
        "fully-pinned row, i.e. the sharded program adds no superlinear",
        "collective/assembly overhead as the device count grows.",
        "",
        "| devices | encode MB/s | decode MB/s | enc speedup | dec speedup | efficiency | pinned |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        sp = r["encode_mbps"] / base["encode_mbps"]
        spd = r["decode_mbps"] / base["decode_mbps"]
        pinned = r["devices"] <= ncores
        eff = sp / (r["devices"] / base["devices"]) * 100
        eff_s = f"{eff:.0f}%" if pinned else "n/a (no cores)"
        md.append(
            f"| {r['devices']} | {r['encode_mbps']:.2f} | {r['decode_mbps']:.2f} "
            f"| {sp:.2f}x | {spd:.2f}x | {eff_s} | {'yes' if pinned else 'no (oversubscribed)'} |"
        )
    md.append("")
    md.append("Generated by scripts/scaling_bench.py; rows in scaling.json.")
    with open(os.path.join(REPO, "SCALING.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    with open(os.path.join(REPO, "scaling.json"), "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote SCALING.md + scaling.json")


if __name__ == "__main__":
    main()
