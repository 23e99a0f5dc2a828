"""Size-bucket covering logic shared by sampling, eval, serving, data
loading and the bench.

One policy, one place: a configured bucket list is trimmed to the
molecules that can actually occur (max_n) and topped with a single
covering bucket, so every call site compiles the identical set of padded
shapes.
"""

from __future__ import annotations

from typing import Iterable, Tuple


def covering_buckets(buckets: Iterable[int], max_n: int) -> Tuple[int, ...]:
    """Trim/extend ``buckets`` to cover molecule sizes up to ``max_n``.

    Keeps the configured buckets below ``max_n`` and appends one top
    bucket: the smallest configured bucket that covers ``max_n``, else
    ``max_n`` rounded up to the TPU sublane multiple of 8 (unaligned N
    forces layout relayouts on device; masks carry the real sizes, so
    padding past the dataset max is harmless).
    """
    bs = sorted({int(b) for b in buckets})
    max_n = int(max_n)
    top = min((b for b in bs if b >= max_n), default=-(-max_n // 8) * 8)
    return tuple(b for b in bs if b < max_n) + (top,)
