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


CHUNK = 16384  # max device items per dispatch: bounds HBM temps + compile size


def chunked_batch(call, arrays, chunk: int = CHUNK):
    """Run ``call(*padded_arrays) -> tuple/list of outputs with leading item axis``
    over fixed-size chunks of the item axis; returns concatenated outputs sliced
    to the real length.  Full chunks share one compiled program; the tail chunk is
    bucket-padded."""
    import jax

    n = len(arrays[0])
    pending = []
    for s in range(0, max(n, 1), chunk):
        piece = [a[s:s + chunk] for a in arrays]
        ni = len(piece[0])
        if ni == 0:
            break
        _, *padded = pad_items(*piece)
        pending.append((call(*padded), ni))   # async dispatch; fetch later
    if not pending:
        return None
    parts = [[np.asarray(x)[:ni] for x in jax.device_get(res)]
             for res, ni in pending]
    return [np.concatenate(cols) for cols in zip(*parts)]
