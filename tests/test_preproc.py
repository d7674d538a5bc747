"""Preprocessing tests: interning, alignment/RLP packing, suffix-array construction.

Oracle checks are against brute-force definitions (sorted suffixes, naive LCP) — the
verification layer the reference never had (SURVEY.md section 4)."""

import numpy as np
import pytest

from cgx_tpu.preproc import corpus as cp
from cgx_tpu.preproc import suffix_array as sab


def test_source_interning_matches_reference_layout():
    src = cp.load_source_corpus(["a b a", "c a"])
    # ids start at 2 in first-appearance order; separator 1 per line; extra 1 + sentinel
    assert src.str_.tolist() == [2, 3, 2, 1, 4, 2, 1, 1, 5]
    assert src.P.tolist() == [0, 1, 2, 0, 0, 1, 0, 0, 0]
    assert src.sentenceind.tolist() == [0, 4, 7]
    assert src.vocab.lookup("a") == 2 and src.vocab.lookup("c") == 4
    assert src.vocab.lookup("zzz") == -1
    assert src.vocab.distinct_token_count == 5


def test_query_oov_and_offsets():
    src = cp.load_source_corpus(["a b a", "c a"])
    qs = cp.load_queries(["a zzz c", "b"], src.vocab)
    assert qs.tokens.tolist() == [2, -1, 4, 3]
    assert qs.offsets.tolist() == [0, 3]
    assert qs.tok_to_qry.tolist() == [0, 0, 0, 1]
    assert qs.query_end(0) == 3 and qs.query_end(1) == 4


def test_alignment_and_rlp():
    src = cp.load_source_corpus(["a b", "c"])
    tgt = cp.load_target_corpus(["x y z", "w"])
    al = cp.load_alignment(["0-0 0-2 1-1", "0-0"], src, tgt)
    # source token 0 aligned to targets {0,2} -> L=0 R=2
    rlp0 = int(al.RLP[0])
    assert (rlp0 >> 24) & 0xFF == 0 and (rlp0 >> 16) & 0xFF == 2
    assert (rlp0 >> 8) & 0xFF == 0
    # source token 1 -> target 1
    rlp1 = int(al.RLP[1])
    assert (rlp1 >> 24) & 0xFF == 1 and (rlp1 >> 16) & 0xFF == 1
    # separator slot of sentence 0 is src index 2; holds target sentence 1 start (=4)
    assert int(al.RLP[2]) == int(tgt.sentenceind[1])
    # target side: token 2 (z) aligned to source 0
    assert al.L_tar[2] == 0 and al.R_tar[2] == 0
    # unaligned target token stays 255
    assert al.L_tar[1] == 1  # y aligned to b(1)


def _brute_sa(s):
    n = len(s)
    return np.array(sorted(range(n), key=lambda i: list(s[i:])), dtype=np.int32)


@pytest.mark.parametrize("use_native", [False, True])
def test_suffix_array_against_bruteforce(use_native):
    rng = np.random.default_rng(0)
    for trial in range(5):
        n = int(rng.integers(5, 200))
        s = rng.integers(1, 8, size=n).astype(np.int32)
        s[-1] = 100  # unique sentinel like the corpus layout
        idx = sab.build_index(s, use_native=use_native)
        np.testing.assert_array_equal(idx.sa, _brute_sa(s))
        # naive LCP check
        for i in range(1, n):
            a, b = s[idx.sa[i - 1]:], s[idx.sa[i]:]
            h = 0
            while h < min(len(a), len(b)) and a[h] == b[h]:
                h += 1
            assert idx.lcp[i] == h
        # interval tree check vs definition
        lcp = idx.lcp

        def rec(L, R):
            if L == R - 1:
                return int(lcp[R])
            M = (L + R) // 2
            a_, b_ = rec(L, M), rec(M, R)
            assert idx.lcpleft[M] == a_
            assert idx.lcpright[M] == b_
            return min(a_, b_)

        if n >= 2:
            rec(0, n - 1)


def test_native_matches_numpy_on_corpus():
    src = cp.load_source_corpus(["a b a b c", "b c a", "a b"] * 10)
    i1 = sab.build_index(src.str_, use_native=False)
    i2 = sab.build_index(src.str_, use_native=True)
    np.testing.assert_array_equal(i1.sa, i2.sa)
    np.testing.assert_array_equal(i1.lcp, i2.lcp)
    np.testing.assert_array_equal(i1.lcpleft, i2.lcpleft)
    np.testing.assert_array_equal(i1.lcpright, i2.lcpright)


def test_lex_table_sorted_and_null():
    src = cp.load_source_corpus(["a b"])
    tgt = cp.load_target_corpus(["x y"])
    toks = "b y 0.5 0.25 a x 0.125 1.0 NULL y 0.1 0.2 a NULL 0.3 0.4 zz x 0.9 0.9".split()
    lex = cp.load_lex_table(toks, src.vocab, tgt.vocab)
    assert lex.count == 4  # zz skipped
    assert lex.keys_src.tolist() == [-1, 2, 2, 3]
    assert lex.keys_tgt.tolist() == [3, -1, 2, 3]
    assert lex.val1.dtype == np.float32


def test_native_tokenizer_matches_python(toy_fixture):
    text_f = (toy_fixture / "corpus.f").read_text()
    text_e = (toy_fixture / "corpus.e").read_text()
    s1 = cp.load_source_corpus(text_f.splitlines())
    s2 = cp.load_source_corpus_text(text_f)
    np.testing.assert_array_equal(s1.str_, s2.str_)
    np.testing.assert_array_equal(s1.P, s2.P)
    np.testing.assert_array_equal(s1.sentenceind, s2.sentenceind)
    assert s1.vocab.word_to_id == s2.vocab.word_to_id
    t1 = cp.load_target_corpus(text_e.splitlines())
    t2 = cp.load_target_corpus_text(text_e)
    np.testing.assert_array_equal(t1.str_, t2.str_)
    np.testing.assert_array_equal(t1.sentenceind, t2.sentenceind)
    assert t1.vocab.id_to_word == t2.vocab.id_to_word


def test_fast_alignment_matches_slow(toy_fixture):
    src = cp.load_source_corpus(cp.read_lines(str(toy_fixture / "corpus.f")))
    tgt = cp.load_target_corpus(cp.read_lines(str(toy_fixture / "corpus.e")))
    lines = cp.read_lines(str(toy_fixture / "corpus.a"))
    a1 = cp.load_alignment(lines, src, tgt)
    a2 = cp.load_alignment_fast(lines, src, tgt)
    np.testing.assert_array_equal(a1.L_tar, a2.L_tar)
    np.testing.assert_array_equal(a1.R_tar, a2.R_tar)
    np.testing.assert_array_equal(a1.RLP, a2.RLP)
