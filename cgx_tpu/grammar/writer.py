"""Grammar-file writer: cdec rule format, per-query files.

Mirrors print_query_GPU_Gappy / printGapMode (PrintResults.c:339-577): for every query
the blocks print abX, Xab, XabX, ab per contiguous block id; then aXb, XaXb, aXbX per
distinct 1-gap pattern id; then aXbXc per distinct 2-gap pattern id.  Line format and
feature order are PrintResults.c:355-364 (printf "%f" = 6-decimal fixed)."""

from __future__ import annotations

import os

import numpy as np


def format_rule(r) -> str:
    return (
        "[X] ||| %s ||| EgivenFCoherent=%f SampleCountF=%f CountEF=%f "
        "MaxLexFgivenE=%f MaxLexEgivenF=%f IsSingletonF=%d IsSingletonFE=%d"
        % (r.lexical, float(r.aa), float(r.fsample_score), float(r.bb),
           float(r.max_lex_fge), float(r.max_lex_egf),
           int(r.f == 1), int(r.paircount == 1)))


def _emit(lines, updown, rules, rid: int):
    d, u = updown[rid]
    if d == -1 or u == -1:
        return
    for i in range(d, u + 1):
        lines.append(format_rule(rules[i]))


def grammar_lines_for_query(q: int, qry_global, one_q_ids, two_q_ids,
                            ud_contig, ud_one, ud_two,
                            rules_contig, rules_one, rules_two,
                            G: int, D1: int, D2: int):
    lines: list = []
    for p in qry_global[q]:
        _emit(lines, ud_one, rules_one, p + G)        # abX
        _emit(lines, ud_one, rules_one, p)            # Xab
        _emit(lines, ud_two, rules_two, p)            # XabX
        _emit(lines, ud_contig, rules_contig, p)      # ab
    for s in one_q_ids[q]:
        _emit(lines, ud_one, rules_one, 2 * G + s)            # aXb
        _emit(lines, ud_two, rules_two, G + D2 + s)           # XaXb
        _emit(lines, ud_two, rules_two, G + D2 + D1 + s)      # aXbX
    for s in two_q_ids[q]:
        _emit(lines, ud_two, rules_two, G + s)                # aXbXc
    return lines


def write_grammars(dest_dir: str, qryscount: int, is_sample: bool, per_query_lines):
    os.makedirs(dest_dir, exist_ok=True)
    suffix = "s" if is_sample else "n"
    paths = []
    for q in range(qryscount):
        path = os.path.join(dest_dir, f"grammar.{q}.{suffix}")
        with open(path, "w", encoding="utf-8") as fh:
            for line in per_query_lines[q]:
                fh.write(line + "\n")
        paths.append(path)
    return paths
