"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction over sf0.001: synthesize the
Common-Crawl-shaped ``pages`` table from ``documents.parquet`` with the
deterministic layout generator, then run the Arrow-batched layout-analysis
extraction pipeline (parse → analyze → categorize → boilerplate strip →
reading order → articles → text).  The invariant: extracted ``text`` per url
is byte-identical to the whitespace-normalized source document text.

``queries()`` / ``oracle_sql()`` expose the full operator surface
(SURVEY.md §2 relational analogs + dedup / similarity-search /
text-analysis / extraction suites).  Every query — including
``extract_blocks`` — carries an exact DuckDB oracle; reading order, spans
and blocks are oracled by a recursive CTE that re-derives the generator's
line-wrap arithmetic (``ops/extraction.py``).  The registry iterates
extraction → validation first (``ops/__init__.py:ALL_MODULES``) so the
driver's capped CORRECTNESS report always covers the flagship family.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from osdocr_spark.ops import all_oracles, all_queries
from osdocr_spark.ops.extraction import extract_text

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return extract_text(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    training-data-pipeline suites).  Each callable takes (spark, sf_dir)."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (tables pre-registered as views:
    region nation customer supplier part orders lineitem events documents
    embeddings).  Keys absent here → driver records rows-only checks."""
    return all_oracles()
