"""TPU pass-1/pass-2 must be bit-identical to the sequential oracle."""

import numpy as np
import pytest

from cgx_tpu.config import ExtractorConfig
from cgx_tpu.index import container as ic
from cgx_tpu.preproc import corpus as cp
from cgx_tpu.preproc import suffix_array as sab
from cgx_tpu.oracle import search as se
from cgx_tpu.search import passes


def _world(toy_fixture):
    cfg = ExtractorConfig(precompute_count=30)
    src = cp.load_source_corpus(cp.read_lines(str(toy_fixture / "corpus.f")))
    tgt = cp.load_target_corpus(cp.read_lines(str(toy_fixture / "corpus.e")))
    al = cp.load_alignment(cp.read_lines(str(toy_fixture / "corpus.a")), src, tgt)
    lex = cp.load_lex_table(cp.read_tokens(str(toy_fixture / "lex.txt")),
                            src.vocab, tgt.vocab)
    qs = cp.load_queries(cp.read_lines(str(toy_fixture / "query.f")), src.vocab)
    sa = sab.build_index(src.str_)
    idx = ic.build_index(src, tgt, sa, al, lex, cfg)
    return cfg, src, tgt, al, lex, qs, sa, idx


def test_pass1_pass2_match_oracle(toy_fixture):
    cfg, src, tgt, al, lex, qs, sa, idx = _world(toy_fixture)
    o1 = se.pass1(src, sa, qs)
    t1 = passes.pass1_tpu(idx, qs)
    np.testing.assert_array_equal(t1.longestmatch, o1.longestmatch)
    np.testing.assert_array_equal(t1.up, o1.up)
    np.testing.assert_array_equal(t1.down, o1.down)
    np.testing.assert_array_equal(t1.firstfindhit, o1.firstfindhit)
    np.testing.assert_array_equal(t1.firstfindhitL, o1.firstfindhitL)
    np.testing.assert_array_equal(t1.firstfindhitR, o1.firstfindhitR)

    o2 = se.pass2(src, sa, qs, o1)
    t2 = passes.pass2_tpu(idx, qs, t1)
    np.testing.assert_array_equal(t2.connectoffset, o2.connectoffset)
    np.testing.assert_array_equal(t2.up, o2.up)
    np.testing.assert_array_equal(t2.down, o2.down)
