"""Relational operator surface: each module exposes ``QUERIES`` (name →
``callable(spark, sf_dir) → DataFrame``) and ``ORACLES`` (name → ANSI SQL for
DuckDB over the same tables).  Keys without an oracle get the driver's
weaker rows-only check.

These queries mirror the operator shapes of SURVEY.md §2 at *table* scale
(filters/predicates §2.2, joins §2.3, aggregations §2.4, windows §2.5,
sort/top-k §2.6, set ops §2.7, string/math functions §2.8) plus the
training-data-pipeline operators the task brief requires (dedup, similarity
search, text analysis, multimodal stubs).

Numeric-compare discipline: sums/averages that feed the driver's value-hash
are computed in exact DECIMAL arithmetic and rounded to 4dp on both engines,
so Spark↔DuckDB float summation order can never flip a hash.
"""

from . import dedup, extraction, relational, simsearch, textstats, validation

# Order matters for the driver's CORRECTNESS report, which checks the FIRST
# 50 registry entries only.  Round 2 shipped with relational-first ordering and
# the entire extraction/validation tail (the flagship byte-parity gauntlets and
# all v_* metrics) fell past the cap with no driver row.  The standing policy
# (mechanized by tests/test_registry_cap_window.py since r5): every query
# whose implementing module was touched since the last round tag must sit
# inside the first-50 window — the queries that fall out the back carry green
# driver rows from prior rounds on code untouched since.  Round 5 touched
# textstats (t_ngram_topk oracle bound), so textstats moves ahead of the
# untouched dedup/simsearch/relational suites.
ALL_MODULES = (extraction, textstats, validation, dedup, simsearch, relational)


def all_queries():
    out = {}
    for m in ALL_MODULES:
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in ALL_MODULES:
        out.update(m.ORACLES)
    return out
