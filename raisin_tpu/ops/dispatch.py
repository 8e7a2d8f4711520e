"""Registration of device-backed codecs into the engine registry."""

from __future__ import annotations


def register_all() -> None:
    # Populated as device kernels land (arithmetic scan, LZSS, Huffman).
    return None
