"""CLI contract tests (in-process, CPU backend)."""

import pathlib

import pytest

from cgx_tpu import cli


def _args(toy_fixture, out, extra=()):
    F = pathlib.Path(toy_fixture)
    return list(extra) + [str(F / "corpus.f"), str(F / "query.f"),
                          str(F / "corpus.e"), str(F / "corpus.a"),
                          str(F / "lex.txt"), str(out)]


def test_cli_tpu_engine_writes_grammars(toy_fixture, tmp_path):
    rc = cli.main(_args(toy_fixture, tmp_path / "g", ["--engine", "tpu"]))
    assert rc == 0
    files = sorted((tmp_path / "g").glob("grammar.*.s"))
    assert len(files) == 8
    first = files[0].read_text().splitlines()
    assert first and first[0].startswith("[X] ||| ")


def test_cli_rejects_bad_fingerlen(toy_fixture, tmp_path, capsys):
    rc = cli.main(_args(toy_fixture, tmp_path / "g", ["-t", "0"]))
    assert rc == 1


def test_cli_rejects_missing_file(tmp_path):
    rc = cli.main(["/nonexistent.f", "/nonexistent.q", "/nonexistent.e",
                   "/nonexistent.a", "/nonexistent.l", str(tmp_path / "g")])
    assert rc == 1
