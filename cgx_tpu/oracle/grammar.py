"""Back-compat shim: the writer is shared host code (cgx_tpu.grammar.writer)."""
from cgx_tpu.grammar.writer import *  # noqa: F401,F403
from cgx_tpu.grammar.writer import format_rule, grammar_lines_for_query, write_grammars  # noqa: F401
