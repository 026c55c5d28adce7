"""Extraction-pipeline queries (the engine's flagship surface).

Each query synthesizes the Common-Crawl-shaped ``pages`` table from the
driver's ``documents`` parquet (deterministic arithmetic layout, see
:mod:`osdocr_spark.kernels.corpus`) and runs the Arrow-batched extraction
stages.  The headline oracle: **extracted text per url is byte-identical to
the whitespace-normalized source document text** — expressible in ANSI SQL
because the generator is its own inverse.

Geometry-derived outputs (reading order, spans, block features) depend on
line-wrapping arithmetic no SQL can replicate; those queries carry no
oracle and get the driver's rows-only check (noted per query).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark.sql import functions as _F

from ..spark.jobs import load_pages
from ..spark.stages import (URL_DOMAINS, articles_from_pages, blocks_from_pages,
                            extract_pages)

__all__ = ["QUERIES", "ORACLES"]

_URL_SQL = f"'https://news-' || CAST(doc_id % {URL_DOMAINS} AS VARCHAR) || '.example.com/a/' || CAST(doc_id AS VARCHAR)"


def extract_text(spark, sf_dir):
    """Flagship: per-url byte-identical extracted main text, on the
    production plan shape — scan-fused single Python stage (synthesis and
    extraction in one Arrow hop; ``extract_pages`` over a materialized pages
    table is exercised by the noisy/multi-article gauntlets below)."""
    import os as _os
    from ..spark.stages import extract_documents_fused, salted_repartition
    docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
    docs = salted_repartition(
        docs, spark.sparkContext.defaultParallelism * 4, key="doc_id")
    return extract_documents_fused(docs).select("url", "text")


_O_TEXT = f"""
SELECT {_URL_SQL} AS url,
       trim(regexp_replace(text, '\\s+', ' ', 'g')) AS text
FROM documents
"""


def extract_text_noisy(spark, sf_dir):
    """Fix-suite gauntlet: pages carry injected OCR-like defects (low-conf
    garbage, oversized/nested empty boxes, inflated bboxes, a fake rule
    through a text block — ``kernels.corpus.generate_page(noisy=True)``);
    the §2.9 cleaning pipeline (``kernels.fix.clean_doc``) must repair them
    so extraction still returns the byte-identical normalized text."""
    return (extract_pages(load_pages(spark, sf_dir, noisy=True), clean=True)
            .select("url", "text"))


def extract_multi_articles(spark, sf_dir):
    """Article-isolation gauntlet: the multi-article layout plants a second
    headline at the top of column 2; ``graph_isolate_articles`` must cut
    exactly there and concatenated article emission must still reproduce the
    source text byte-for-byte."""
    return (extract_pages(load_pages(spark, sf_dir, multi_article=True))
            .select("url", "text"))


def extract_article_titles(spark, sf_dir):
    """First-article titles over the multi-article corpus: the first
    article's headline is always the leading ``title_n`` source words — an
    arithmetic oracle over the articles output table."""
    arts = articles_from_pages(load_pages(spark, sf_dir, multi_article=True))
    return (arts.where(F.col("article_idx") == 0)
            .select("url", F.regexp_replace(F.trim("title"), r"\s+", " ").alias("title")))


def order_paths_agree(spark, sf_dir):
    """Cross-validation of the three reading-order implementations: the
    attraction-graph path (``order.py``, production), the position-only
    naive path and the context naive path (``order_naive.py``, legacy) must
    produce identical orders on the corpus — three independent algorithms
    corroborating the reading order the byte-parity oracle depends on."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    pages = load_pages(spark, sf_dir)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.classify import boilerplate_mask, categorize_blocks
        from ..kernels.hocr import parse_hocr
        from ..kernels.order import sort_topologic_order, topologic_order_context
        from ..kernels.order_naive import (reading_order_naive,
                                           reading_order_naive_context)
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                doc = parse_hocr(bytes(html), url=url)
                categorize_blocks(doc)
                bp = boilerplate_mask(doc)
                main = [i for i in range(doc.n_blocks()) if not bp[i]]
                graph = topologic_order_context(doc, main)
                go = sort_topologic_order(doc, graph, sort_weight=True) if graph else []
                rows.append((url,
                             reading_order_naive(doc, main) == go,
                             reading_order_naive_context(doc, main) == go))
            yield pd.DataFrame(rows, columns=["url", "naive_matches", "context_matches"])

    schema = T.StructType([T.StructField("url", T.StringType()),
                           T.StructField("naive_matches", T.BooleanType()),
                           T.StructField("context_matches", T.BooleanType())])
    return pages.select("url", "html").mapInPandas(run, schema)


_O_ORDER_AGREE = f"""
SELECT {_URL_SQL} AS url, TRUE AS naive_matches, TRUE AS context_matches
FROM documents
"""


def extract_stats(spark, sf_dir):
    """Layout stats with arithmetic oracles: detected normal text size must
    equal the generator's size class; article isolation must yield exactly
    one article per page."""
    return (extract_pages(load_pages(spark, sf_dir))
            .select("url", "normal_text_size", "n_articles"))


_O_STATS = f"""
SELECT {_URL_SQL} AS url,
       CAST(CASE CAST(doc_id % 4 AS INT)
            WHEN 0 THEN 20 WHEN 1 THEN 24 WHEN 2 THEN 28 ELSE 32 END AS INT)
         AS normal_text_size,
       1 AS n_articles
FROM documents
"""


def extract_reading_order(spark, sf_dir):
    """Reading order as (url, order_idx, block_id) rows.  Rows-only check:
    order depends on line-wrap geometry (validated against the byte-parity
    text oracle instead — wrong order ⇒ wrong bytes in extract_text)."""
    ex = extract_pages(load_pages(spark, sf_dir))
    return ex.select("url", F.posexplode("reading_order").alias("order_idx", "block_id"))


def extract_spans(spark, sf_dir):
    """Per-block character spans over the normalized text (rows-only)."""
    ex = extract_pages(load_pages(spark, sf_dir))
    return (ex.select("url", F.explode("spans").alias("s"))
            .select("url", F.col("s.block_id").alias("block_id"),
                    F.col("s.start").alias("start"), F.col("s.end").alias("end")))


def extract_blocks(spark, sf_dir):
    """The parsed+typed ``blocks`` intermediate table (rows-only): geometry,
    link density, and the reference type taxonomy per block."""
    return blocks_from_pages(load_pages(spark, sf_dir))


def extract_boilerplate_stats(spark, sf_dir):
    """Boilerplate accounting per page: generated pages carry exactly two
    pure-link blocks (masthead + footer) — an arithmetic oracle over the
    blocks table's link densities."""
    b = blocks_from_pages(load_pages(spark, sf_dir))
    return (b.groupBy("url").agg(
        F.sum(F.when(F.col("link_density") > 0.5, 1).otherwise(0)).cast("int")
        .alias("n_boilerplate"),
        F.sum(F.when(F.col("type") == "delimiter", 1).otherwise(0)).cast("int")
        .alias("n_delimiters"),
    ))


_O_BOILER = f"""
SELECT {_URL_SQL} AS url,
       2 AS n_boilerplate,
       CAST(CASE WHEN len(string_split(text, ' ')) < 40 THEN 0
                 ELSE 1 + CAST(doc_id % 2 AS INT) END AS INT) AS n_delimiters
FROM documents
"""


_O_TITLES = f"""
SELECT {_URL_SQL} AS url,
       array_to_string(
         string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')[
           1 : CASE WHEN len(string_split(text, ' ')) < 24 THEN 2 ELSE 4 END],
         ' ') AS title
FROM documents
"""


QUERIES = {
    "extract_text": extract_text,
    "extract_text_noisy": extract_text_noisy,
    "extract_multi_articles": extract_multi_articles,
    "extract_article_titles": extract_article_titles,
    "order_paths_agree": order_paths_agree,
    "extract_stats": extract_stats,
    "extract_reading_order": extract_reading_order,
    "extract_spans": extract_spans,
    "extract_blocks": extract_blocks,
    "extract_boilerplate_stats": extract_boilerplate_stats,
}

ORACLES = {
    "extract_text": _O_TEXT,
    "extract_text_noisy": _O_TEXT,
    "extract_multi_articles": _O_TEXT,
    "extract_article_titles": _O_TITLES,
    "order_paths_agree": _O_ORDER_AGREE,
    "extract_stats": _O_STATS,
    "extract_boilerplate_stats": _O_BOILER,
}
