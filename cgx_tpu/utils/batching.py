"""Bucketed batch padding.

Every device stage is a vmap over a flat work-item axis whose length is
data-dependent; without padding each distinct length compiles a fresh XLA program
(expensive, especially via the remote-compile tunnel).  ``pad_items`` rounds the
item axis up to the next power of two by repeating the first item (a valid work
item whose duplicated results are sliced off), so programs are reused across
batches and runs."""

from __future__ import annotations

import numpy as np

MIN_BUCKET = 64


def bucket_size(n: int) -> int:
    if n <= MIN_BUCKET:
        return MIN_BUCKET
    return 1 << (n - 1).bit_length()


def pad_items(*arrays):
    """Pad each array's leading axis to the common bucket size by repeating row 0.
    Returns (n_real, padded_arrays...)."""
    n = len(arrays[0])
    m = bucket_size(n)
    if m == n:
        return (n,) + tuple(np.ascontiguousarray(a) for a in arrays)
    out = []
    for a in arrays:
        a = np.ascontiguousarray(a)
        pad = np.repeat(a[:1], m - n, axis=0)
        out.append(np.concatenate([a, pad], axis=0))
    return (n,) + tuple(out)


def pad_tokens(tokens: np.ndarray, fill) -> np.ndarray:
    """Bucket-pad a token array with a fill value (for query streams)."""
    n = len(tokens)
    m = bucket_size(n)
    if m == n:
        return tokens
    return np.concatenate([tokens, np.full(m - n, fill, tokens.dtype)])
