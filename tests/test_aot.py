"""Serialized-executable warm-open cache (utils/aot): disabled = passthrough,
enabled = persist + reload path, any backend failure = silent fallback.

The chip evidence lives in tools/aot_probe.py (deserialize+load 0.05-0.17s vs
0.76-2.4s per program through the persistent compile cache); these tests pin
the wrapper's correctness on the CPU backend."""

import numpy as np
import jax.numpy as jnp
import pytest

from cgx_tpu.utils import aot


@pytest.fixture(autouse=True)
def _reset():
    old = aot._DIR[0]
    yield
    aot._DIR[0] = old


def test_disabled_is_passthrough():
    aot._DIR[0] = None
    f = aot.jit(lambda x: x * 2 + 1)
    np.testing.assert_array_equal(np.asarray(f(jnp.arange(8))),
                                  np.arange(8) * 2 + 1)


def test_enabled_persists_and_reloads(tmp_path):
    aot.enable(str(tmp_path))
    f = aot.jit(lambda x: x * 3)
    x = jnp.arange(16, dtype=jnp.int32)
    np.testing.assert_array_equal(np.asarray(f(x)), np.arange(16) * 3)
    # same shape again: fast-key hit
    np.testing.assert_array_equal(np.asarray(f(x)), np.arange(16) * 3)
    files = list(tmp_path.glob("*.pjrt"))
    if files:
        # force the deserialize path (fresh-process simulation)
        f._compiled.clear()
        np.testing.assert_array_equal(np.asarray(f(x)), np.arange(16) * 3)
    # if serialization is unsupported on this backend the fallback already
    # produced correct results above — that IS the contract


def test_static_argnames(tmp_path):
    aot.enable(str(tmp_path))

    @aot.jit(static_argnames=("k",))
    def f(x, k):
        return x + k

    x = jnp.arange(4, dtype=jnp.int32)
    np.testing.assert_array_equal(np.asarray(f(x, k=5)), np.arange(4) + 5)
    np.testing.assert_array_equal(np.asarray(f(x, k=9)), np.arange(4) + 9)
    np.testing.assert_array_equal(np.asarray(f(x, k=5)), np.arange(4) + 5)


def test_pipeline_byte_identical_with_aot(toy_fixture, tmp_path, monkeypatch):
    """Whole-pipeline equality with the executable cache enabled (CPU)."""
    from cgx_tpu.config import ExtractorConfig
    from cgx_tpu.preproc import corpus as cp
    from cgx_tpu import pipeline as tpl
    cfg = ExtractorConfig(precompute_count=30)
    args = (cp.read_lines(str(toy_fixture / "corpus.f")),
            cp.read_lines(str(toy_fixture / "corpus.e")),
            cp.read_lines(str(toy_fixture / "corpus.a")),
            cp.read_tokens(str(toy_fixture / "lex.txt")),
            cp.read_lines(str(toy_fixture / "query.f")))
    base = tpl.run_pipeline(*args, cfg)
    aot.enable(str(tmp_path))
    cached = tpl.run_pipeline(*args, cfg)
    aot._DIR[0] = None
    again = tpl.run_pipeline(*args, cfg)
    assert base.per_query_lines == cached.per_query_lines
    assert base.per_query_lines == again.per_query_lines
