"""Shared per-document expansion bounds for the DuckDB oracles.

Several oracles expand per-position rows with ``range(0, N)`` because DuckDB
has no per-row ``sequence`` explode as cheap as Spark's.  A hardcoded bound
silently truncates documents longer than it — a latent parity trap if a
longer-document fixture is ever added (ADVICE r3 item 4), since the Spark
side has no such cap.  Every oracle derives its bound from these constants,
and ``tests/test_entry_contract.py::test_corpus_respects_oracle_bounds``
asserts the driver corpora stay inside them at every SF — so a longer
fixture fails loudly instead of producing a quietly-wrong oracle.
"""

#: upper bound (exclusive) on whitespace tokens / shingle positions per doc
MAX_DOC_TOKENS = 10_000

#: upper bound (exclusive) on characters (== bytes; all-ASCII corpus) per doc
MAX_DOC_CHARS = 100_000
