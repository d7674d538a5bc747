"""Direct equality tests for the rewritten lexicon dedup primitives.

The optimized implementations (`_dedup`: column lexsort + boundary scan
replacing np.unique(axis=0)'s void-record sort; `_target_key_rows`: chunked
preallocated out= buffers replacing whole-array temporaries; `_dedup_spans`:
single packed-key stable argsort) must match straightforward reference
expressions on randomized and degenerate inputs.  End-to-end byte-identity is
separately enforced by tests/test_conformance.py — these pin the primitives
themselves so a regression localizes."""

import numpy as np
import pytest

from cgx_tpu.features import lexicon as lx


def _ref_dedup(cid, key_rows):
    """The previous np.unique(axis=0)-based implementation (reference)."""
    full = np.concatenate([cid[:, None].astype(np.int32),
                           key_rows.astype(np.int32)], axis=1)
    if full.shape[1] % 2:
        full = np.concatenate(
            [full, np.zeros((len(full), 1), np.int32)], axis=1)
    packed = np.ascontiguousarray(full).view(np.int64)
    _, first, inv, counts = np.unique(packed, axis=0, return_index=True,
                                      return_inverse=True, return_counts=True)
    order = np.argsort(first, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    return first[order], rank[inv.ravel()], counts[order]


def _ref_target_key_rows(tgt_str, ts, te, g1s=None, g1e=None,
                         g2s=None, g2e=None):
    """The straightforward whole-array expression (reference)."""
    KEYW = lx.KEYW
    i32 = np.int32
    ts = ts.astype(i32)
    te = te.astype(i32)
    pos = ts[:, None] + np.arange(KEYW, dtype=i32)[None, :]
    emit = pos <= te[:, None]
    tok = tgt_str.astype(i32)[np.clip(pos, 0, len(tgt_str) - 1)]
    out_idx = pos - ts[:, None]
    for gs, ge, marker in ((g1s, g1e, -1), (g2s, g2e, -3)):
        if gs is None:
            continue
        gs = gs.astype(i32)[:, None]
        ge = ge.astype(i32)[:, None]
        ing = (pos >= gs) & (pos <= ge)
        np.copyto(tok, i32(marker), where=ing)
        emit &= ~ing | (pos == gs)
        out_idx -= np.where(pos > ge, ge - gs, i32(0))
    key = np.full((len(ts), KEYW + 1), -2, dtype=i32)
    oi = np.where(emit, np.minimum(out_idx, KEYW - 1), KEYW).astype(np.int64)
    np.put_along_axis(key, oi, np.where(emit, tok, i32(-2)), axis=1)
    return key[:, :KEYW]


@pytest.mark.parametrize("n,k,seed", [(0, 5, 0), (1, 3, 1), (1000, 4, 2),
                                      (5000, 40, 3)])
def test_dedup_matches_unique(n, k, seed):
    rng = np.random.default_rng(seed)
    cid = rng.integers(0, max(k, 1), size=n).astype(np.int64)
    key_rows = rng.integers(-3, 6, size=(n, lx.KEYW)).astype(np.int32)
    f_new, inv_new, c_new = lx._dedup(cid, key_rows)
    f_ref, inv_ref, c_ref = _ref_dedup(cid, key_rows)
    np.testing.assert_array_equal(f_new, f_ref)
    np.testing.assert_array_equal(inv_new, inv_ref)
    np.testing.assert_array_equal(c_new, c_ref)


def test_dedup_all_equal_rows():
    n = 257
    cid = np.zeros(n, np.int64)
    key_rows = np.full((n, lx.KEYW), 7, np.int32)
    first, inv, counts = lx._dedup(cid, key_rows)
    assert list(first) == [0]
    assert (inv == 0).all()
    assert list(counts) == [n]


@pytest.mark.parametrize("gaps,seed", [(0, 10), (1, 11), (2, 12)])
def test_target_key_rows_matches_reference(gaps, seed):
    rng = np.random.default_rng(seed)
    n = 4000
    L = 10000
    tgt = rng.integers(0, 900, size=L).astype(np.int32)
    ts = rng.integers(0, L - 40, size=n).astype(np.int64)
    te = ts + rng.integers(0, 15, size=n)
    args = [tgt, ts, te]
    if gaps >= 1:
        g1s = ts + rng.integers(1, 5, size=n)
        g1e = g1s + rng.integers(0, 3, size=n)
        args += [g1s, g1e]
    if gaps == 2:
        g2s = args[4] + rng.integers(1, 4, size=n)
        g2e = g2s + rng.integers(0, 3, size=n)
        args += [g2s, g2e]
    np.testing.assert_array_equal(lx._target_key_rows(*args),
                                  _ref_target_key_rows(*args))


def test_target_key_rows_empty_and_partial_chunks():
    tgt = np.arange(100, dtype=np.int32)
    empty = np.empty(0, np.int64)
    assert lx._target_key_rows(tgt, empty, empty).shape == (0, lx.KEYW)
    # per-row independence: slicing the batch arbitrarily (exercising partial
    # buffer views) must agree with one full-batch call
    rng = np.random.default_rng(4)
    n = 300
    ts = rng.integers(0, 60, size=n).astype(np.int64)
    te = ts + rng.integers(0, 15, size=n)
    ref = _ref_target_key_rows(tgt, ts, te)
    parts = [lx._target_key_rows(tgt, ts[i:i + 64], te[i:i + 64])
             for i in range(0, n, 64)]
    np.testing.assert_array_equal(np.concatenate(parts), ref)
    np.testing.assert_array_equal(lx._target_key_rows(tgt, ts, te), ref)


def test_native_format_lines_matches_python():
    """cgx_format_features (C snprintf) must produce byte-identical lines to
    the Python %-formatter for random feature values."""
    from cgx_tpu.grammar import writer as gw
    from cgx_tpu.preproc.native_build import load_native
    if load_native() is None:
        pytest.skip("native library unavailable")

    class T:
        pass

    rng = np.random.default_rng(7)
    n = 5000
    t = T()
    t.lexical = [f"f{i} ||| e{i}" for i in range(n)]
    t.aa = (rng.standard_normal(n) * 3).astype(np.float32)
    t.fsample_score = rng.random(n).astype(np.float32) * 6
    t.bb = rng.random(n).astype(np.float32) * 6
    t.max_lex_fge = (rng.random(n) * 20 - 1).astype(np.float32)
    t.max_lex_egf = np.zeros(n, np.float32)
    t.f = rng.integers(1, 4, size=n).astype(np.int64)
    t.paircount = rng.integers(1, 3, size=n).astype(np.int64)
    assert gw.format_lines(t) == gw._format_lines_py(t)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("gaps", [0, 1, 2])
def test_native_dedup_rules_matches_numpy(gaps, seed):
    """cgx_dedup_rules (one-pass C hash grouping with fused key rendering)
    must return exactly the numpy two-stage path's (first_idx, counts,
    keys_d) on randomized inputs, including degenerate gap spans."""
    from cgx_tpu.preproc.native_build import load_native
    if load_native() is None:
        pytest.skip("native library unavailable")
    import os
    rng = np.random.default_rng(seed)
    n = 5000
    tgt = rng.integers(2, 30, size=800).astype(np.int32)
    cid = rng.integers(0, 40, size=n).astype(np.int64)
    ts = rng.integers(0, 780, size=n).astype(np.int64)
    end = rng.integers(0, 15, size=n).astype(np.int64)
    g1 = g11 = g2 = g21 = None
    if gaps >= 1:
        g1 = rng.integers(-1, 16, size=n).astype(np.int64)
        g11 = g1 + rng.integers(0, 5, size=n)
    if gaps >= 2:
        g2 = g11 + rng.integers(1, 5, size=n)
        g21 = g2 + rng.integers(0, 4, size=n)
    args = (cid, tgt, ts, end, g1, g11, g2, g21)
    os.environ["CGX_NUMPY_DEDUP"] = "1"
    try:
        f0, c0, k0 = lx._dedup_spans(*args)
    finally:
        del os.environ["CGX_NUMPY_DEDUP"]
    f1, c1, k1 = lx._dedup_spans(*args)
    np.testing.assert_array_equal(f0, f1)
    np.testing.assert_array_equal(c0, c1)
    np.testing.assert_array_equal(k0, k1)
