"""Persisted corpus-index artifact (build once, query many).

The reference only had a compile-time-gated suffix-array dump (``sa_precomp.txt``,
SuffixArray.c:208-230) acknowledging one-time costs (README.md:92).  This is the
real version: a versioned on-disk artifact holding everything derived from the
parallel corpus — token arrays, vocabularies, suffix array + LCP interval tree,
alignment spans/RLP, lexical table and the frequent-pair precomputation — so
repeated query batches skip all preprocessing."""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from cgx_tpu.config import ExtractorConfig
from cgx_tpu.preproc import corpus as cp
from cgx_tpu.preproc.suffix_array import SAIndex
from cgx_tpu.types import Precomp

FORMAT_VERSION = 1


@dataclasses.dataclass
class CorpusIndexArtifact:
    source: cp.SourceCorpus
    target: cp.TargetCorpus
    align: cp.Alignment
    lex: cp.LexTable
    sa: SAIndex
    precomp: Precomp


def _vocab_to_list(v: cp.Vocab) -> list:
    return ["" if w is None else w for w in v.id_to_word]


def _vocab_from_list(words) -> cp.Vocab:
    id_to_word = [None if i < 2 else w for i, w in enumerate(words)]
    word_to_id = {w: i for i, w in enumerate(id_to_word) if w is not None}
    return cp.Vocab(word_to_id=word_to_id, id_to_word=id_to_word)


def save(path: str, art: CorpusIndexArtifact, cfg: ExtractorConfig) -> None:
    os.makedirs(path, exist_ok=True)
    np.savez_compressed(
        os.path.join(path, "arrays.npz"),
        src_str=art.source.str_, src_P=art.source.P,
        src_sent=art.source.sentenceind,
        tgt_str=art.target.str_, tgt_sent=art.target.sentenceind,
        l_tar=art.align.L_tar, r_tar=art.align.R_tar, rlp=art.align.RLP,
        lex_src=art.lex.keys_src, lex_tgt=art.lex.keys_tgt,
        lex_v1=art.lex.val1, lex_v2=art.lex.val2,
        sa=art.sa.sa, rank=art.sa.rank, lcp=art.sa.lcp,
        lcpleft=art.sa.lcpleft, lcpright=art.sa.lcpright,
        pc_freq=art.precomp.frequent_list, pc_tok_start=art.precomp.tok_start,
        pc_tok_len=art.precomp.tok_len, pc_idx_start=art.precomp.index_start,
        pc_idx_end=art.precomp.index_end, pc_start=art.precomp.onegap_start,
        pc_len=art.precomp.onegap_length, pc_miss=art.precomp.feature_missing)
    meta = {
        "format_version": FORMAT_VERSION,
        "config": dataclasses.asdict(cfg),
        "src_vocab": _vocab_to_list(art.source.vocab),
        "tgt_vocab": _vocab_to_list(art.target.vocab),
        "precomp_count": art.precomp.count,
    }
    with open(os.path.join(path, "meta.json"), "w", encoding="utf-8") as fh:
        json.dump(meta, fh)


def load(path: str) -> tuple:
    """Returns (CorpusIndexArtifact, ExtractorConfig-it-was-built-with)."""
    with open(os.path.join(path, "meta.json"), "r", encoding="utf-8") as fh:
        meta = json.load(fh)
    if meta["format_version"] != FORMAT_VERSION:
        raise ValueError(
            f"index format {meta['format_version']} != {FORMAT_VERSION}")
    z = np.load(os.path.join(path, "arrays.npz"))
    source = cp.SourceCorpus(str_=z["src_str"], P=z["src_P"],
                             sentenceind=z["src_sent"],
                             vocab=_vocab_from_list(meta["src_vocab"]))
    target = cp.TargetCorpus(str_=z["tgt_str"], sentenceind=z["tgt_sent"],
                             vocab=_vocab_from_list(meta["tgt_vocab"]))
    align = cp.Alignment(L_tar=z["l_tar"], R_tar=z["r_tar"], RLP=z["rlp"])
    lex = cp.LexTable(keys_src=z["lex_src"], keys_tgt=z["lex_tgt"],
                      val1=z["lex_v1"], val2=z["lex_v2"])
    sa = SAIndex(sa=z["sa"], rank=z["rank"], lcp=z["lcp"],
                 lcpleft=z["lcpleft"], lcpright=z["lcpright"])
    pc = Precomp(frequent_list=z["pc_freq"], tok_start=z["pc_tok_start"],
                 tok_len=z["pc_tok_len"], index_start=z["pc_idx_start"],
                 index_end=z["pc_idx_end"], onegap_start=z["pc_start"],
                 onegap_length=z["pc_len"], feature_missing=z["pc_miss"],
                 count=int(meta["precomp_count"]))
    cfg = ExtractorConfig(**meta["config"])
    return CorpusIndexArtifact(source=source, target=target, align=align,
                               lex=lex, sa=sa, precomp=pc), cfg
