"""Vectorized host stages must equal the sequential oracle spec exactly."""

import numpy as np
import pytest

from cgx_tpu.config import ExtractorConfig
from cgx_tpu.preproc import corpus as cp
from cgx_tpu.preproc import suffix_array as sab
from cgx_tpu.oracle import search as se
from cgx_tpu.search import enumerate_fast as ef


@pytest.fixture(scope="module")
def world(toy_fixture):
    cfg = ExtractorConfig(precompute_count=30)
    src = cp.load_source_corpus(cp.read_lines(str(toy_fixture / "corpus.f")))
    tgt = cp.load_target_corpus(cp.read_lines(str(toy_fixture / "corpus.e")))
    al = cp.load_alignment(cp.read_lines(str(toy_fixture / "corpus.a")), src, tgt)
    qs = cp.load_queries(cp.read_lines(str(toy_fixture / "query.f")), src.vocab)
    sa = sab.build_index(src.str_)
    p1 = se.pass1(src, sa, qs)
    p2 = se.pass2(src, sa, qs, p1)
    return cfg, src, tgt, al, qs, sa, p1, p2


def _eq_enum(a, b, fields):
    for f in fields:
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f), err_msg=f)


def test_fast_onegap_enumeration(world):
    cfg, src, tgt, al, qs, sa, p1, p2 = world
    slow = se.one_gap_enumeration(qs, p1, cfg)
    fast = ef.fast_one_gap_enumeration(qs, p1, cfg)
    _eq_enum(slow, fast,
             ["qrystart", "qrystart_len", "qryend_len", "gap", "pattern",
              "number"])
    assert len(slow.qrystart) > 0


def test_fast_dedup_and_twogap(world):
    cfg, src, tgt, al, qs, sa, p1, p2 = world
    raw = se.one_gap_enumeration(qs, p1, cfg)
    e_s, s_s = se.sort_and_dedup_onegap(raw, qs)
    e_f, s_f = ef.fast_sort_and_dedup_onegap(raw, qs)
    _eq_enum(e_s, e_f, ["qrystart", "qrystart_len", "qryend_len", "gap",
                        "pattern", "number"])
    _eq_enum(s_s, s_f, ["qrystart", "qrystart_len", "qryend_len", "gap",
                        "position", "start_on_salist", "end_on_salist"])
    assert s_s.query_with_id == s_f.query_with_id

    pc = se.precompute(src, sa, al, cfg)
    og = se.one_gap_lookup(src, sa, al, qs, p1, p2, s_s, pc, cfg)
    s_f.start_on_salist[:] = s_s.start_on_salist
    s_f.end_on_salist[:] = s_s.end_on_salist

    raw2_s = se.two_gap_enumeration(qs, p1, e_s, s_s, cfg)
    raw2_f = ef.fast_two_gap_enumeration(qs, p1, e_f, s_f, cfg)
    _eq_enum(raw2_s, raw2_f, ["blockid", "gap2", "qryend_len", "pattern",
                              "number"])
    e2_s, s2_s = se.sort_and_dedup_twogap(raw2_s, qs)
    e2_f, s2_f = ef.fast_sort_and_dedup_twogap(raw2_f, qs)
    _eq_enum(e2_s, e2_f, ["blockid", "gap2", "qryend_len", "pattern", "number"])
    _eq_enum(s2_s, s2_f, ["blockid", "position", "qryend_len", "gap2"])
    assert s2_s.query_with_id == s2_f.query_with_id
    assert len(raw2_s.blockid) > 0
