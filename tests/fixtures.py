"""Shared test fixtures: deterministic sample payloads (no external corpora)."""

import random

HELLO = b"Hello world!"
ABC = b"abcabcabcabcabcabcabcabca"  # 25 bytes, reference README's test2.txt shape

VERSE = (
    b"the quick brown fox jumps over the lazy dog\n"
    b"the quick brown fox jumps over the lazy dog again\n"
    b"pack my box with five dozen liquor jugs\n"
    b"how vexingly quick daft zebras jump!\n"
) * 8

UNICODE_TEXT = (
    "naïve résumé — 日本語 русский emoji \U0001f600\n" * 5
).encode("utf-8")


def random_bytes(n: int, seed: int = 0) -> bytes:
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(n))


def random_text(n: int, seed: int = 0) -> bytes:
    rng = random.Random(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    out = []
    size = 0
    while size < n:
        w = rng.choice(words)
        out.append(w)
        size += len(w) + 1
    return " ".join(out).encode("ascii")[:n]
