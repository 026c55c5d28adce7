"""Arrow-batched DataFrame stages of the extraction pipeline.

Every stage is a ``mapInPandas`` transformation: one Python invocation per
Arrow batch (never per row), numpy kernels inside — the execution layout the
driver's input_hint mandates and the reference itself converges to at its
hot spots (SURVEY.md §1.3).  Stages are *narrow* (no shuffle); the only
shuffles in the end-to-end job are the optional salted repartition up front
and the metrics aggregation at the end.

Plan hygiene at scale (checked in tests via ``explain``): the pages scan
prunes to exactly the columns a stage needs — the extraction stage reads
``url, html`` only, so the (dominant) ``text`` column is never moved for it;
filters on ``url``/``lang`` push down into the parquet scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels.corpus import generate_page
from ..kernels.hocr import parse_hocr
from ..kernels.pipeline import extract_document, extract_html

__all__ = [
    "PAGES_SCHEMA", "EXTRACTED_SCHEMA", "BLOCKS_SCHEMA", "PARSED_SCHEMA",
    "pages_from_documents", "extract_pages", "blocks_from_pages",
    "parse_pages", "extract_parsed",
    "salted_repartition", "url_for_doc",
]

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])

EXTRACTED_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("raw_text", T.StringType()),
    T.StructField("n_blocks", T.IntegerType()),
    T.StructField("n_main_blocks", T.IntegerType()),
    T.StructField("n_articles", T.IntegerType()),
    T.StructField("n_words", T.IntegerType()),
    T.StructField("normal_text_size", T.IntegerType()),
    T.StructField("detected_columns", T.IntegerType()),
    T.StructField("reading_order", T.ArrayType(T.IntegerType())),
    T.StructField("spans", T.ArrayType(T.StructType([
        T.StructField("block_id", T.IntegerType()),
        T.StructField("start", T.LongType()),
        T.StructField("end", T.LongType()),
    ]))),
    T.StructField("partition_id", T.IntegerType()),
])

BLOCKS_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("block_id", T.IntegerType()),
    T.StructField("type", T.StringType()),
    T.StructField("left", T.IntegerType()),
    T.StructField("right", T.IntegerType()),
    T.StructField("top", T.IntegerType()),
    T.StructField("bottom", T.IntegerType()),
    T.StructField("n_words", T.IntegerType()),
    T.StructField("n_lines", T.IntegerType()),
    T.StructField("link_density", T.DoubleType()),
    T.StructField("mean_word_height", T.DoubleType()),
])

#: url scheme — pure arithmetic on doc_id so the DuckDB oracle can rebuild it
URL_FMT = "https://news-{dom}.example.com/a/{doc_id}"
URL_DOMAINS = 23  # Zipf-ish domain-key skew lever for salting demos


def url_for_doc(doc_id: int) -> str:
    return URL_FMT.format(dom=doc_id % URL_DOMAINS, doc_id=doc_id)


def pages_from_documents(documents: DataFrame, noisy: bool = False,
                         multi_article: bool = False,
                         adversarial: bool = False) -> DataFrame:
    """``documents(doc_id, text, lang)`` → Common-Crawl-shaped ``pages``
    table (BASELINE.json input_hint schema).  Deterministic: html rendered by
    the seedless arithmetic layout generator; ``warc_ts`` = epoch 2024-01-01
    + doc_id seconds.  ``noisy=True`` injects the OCR-like defects the fix
    suite must repair; ``adversarial=True`` renders the irregular-layout
    gauntlet (see ``kernels.corpus.generate_page``)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "url": [url_for_doc(int(d)) for d in pdf["doc_id"]],
                "warc_ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(pdf["doc_id"], unit="s"),
                "html": [generate_page(int(d), t, noisy=noisy, multi_article=multi_article,
                                       adversarial=adversarial)
                         for d, t in zip(pdf["doc_id"], pdf["text"])],
                "text": pdf["text"],
                "lang": pdf["lang"],
            })

    return documents.select("doc_id", "text", "lang").mapInPandas(gen, PAGES_SCHEMA)


def extract_pages(pages: DataFrame, clean: bool = False) -> DataFrame:
    """The flagship stage: ``pages`` → ``extracted`` (normalized text +
    byte-parity raw text + spans + layout stats + partition lineage id).
    ``clean=True`` runs the §2.9 fix suite (``kernels.fix.clean_doc``)
    between parse and analysis.

    Column pruning: selects only ``url, html`` from the input, so Catalyst
    prunes the scan to those columns regardless of the pages schema width.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                r = extract_html(url, bytes(html), clean=clean)
                rows.append((
                    r["url"], r["text"], r["raw_text"], r["n_blocks"],
                    r["n_main_blocks"], r["n_articles"], r["n_words"],
                    r["normal_text_size"], r["detected_columns"],
                    r["reading_order"],
                    [{"block_id": b, "start": s, "end": e} for b, s, e in r["spans"]],
                    pid,
                ))
            yield pd.DataFrame(rows, columns=[f.name for f in EXTRACTED_SCHEMA.fields])

    return pages.select("url", "html").mapInPandas(run, EXTRACTED_SCHEMA)


def extract_documents_fused(documents: DataFrame) -> DataFrame:
    """Scan-fused extraction: synthesize the page and extract it inside ONE
    Python stage (single Arrow hop).

    In production the html bytes come straight off the Iceberg/parquet scan
    and extraction is the only Python stage in the job; in this sandbox the
    deterministic generator plays the role of that scan, so fusing it into
    the extraction stage reproduces the production plan shape (and is what
    the scaling benchmark measures).  ``extract_pages`` remains the
    general-purpose stage for pre-materialized pages tables.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                url = url_for_doc(int(doc_id))
                r = extract_html(url, generate_page(int(doc_id), text))
                rows.append((
                    r["url"], r["text"], r["raw_text"], r["n_blocks"],
                    r["n_main_blocks"], r["n_articles"], r["n_words"],
                    r["normal_text_size"], r["detected_columns"],
                    r["reading_order"],
                    [{"block_id": b, "start": s, "end": e} for b, s, e in r["spans"]],
                    pid,
                ))
            yield pd.DataFrame(rows, columns=[f.name for f in EXTRACTED_SCHEMA.fields])

    return documents.select("doc_id", "text").mapInPandas(run, EXTRACTED_SCHEMA)


ARTICLES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("article_idx", T.IntegerType()),
    T.StructField("title", T.StringType()),
    T.StructField("body", T.StringType()),
])


def articles_from_pages(pages: DataFrame, clean: bool = False) -> DataFrame:
    """UDTF-shaped article table: one page row -> N article rows (title +
    joined text body), the ``articles`` output table of SURVEY.md §1.5
    (``Article`` assembly, ``article.py:45-139``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                r = extract_html(url, bytes(html), clean=clean)
                for idx, title, body in r["article_rows"]:
                    rows.append((url, idx, title, body))
            yield pd.DataFrame(rows, columns=[f.name for f in ARTICLES_SCHEMA.fields])

    return pages.select("url", "html").mapInPandas(run, ARTICLES_SCHEMA)


PARSED_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("doc_json", T.StringType()),
    T.StructField("partition_id", T.IntegerType()),
])


def parse_pages(pages: DataFrame) -> DataFrame:
    """Stage 1 alone: parse each page into the reference's flat JSON wire
    format (``OCR_Tree.to_json``, ``ocr_tree.py:270-290``) — the per-stage
    checkpoint artifact.  The reference checkpoints every pipeline stage as
    result JSON (``O/pipeline.py:803-817``); this is its table-shaped analog:
    a resumable ``parsed`` table so a failed downstream stage never re-pays
    the parse."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        from ..kernels.serialize import to_json
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        for pdf in batches:
            yield pd.DataFrame({
                "url": pdf["url"],
                "doc_json": [to_json(parse_hocr(bytes(h), url=u))
                             for u, h in zip(pdf["url"], pdf["html"])],
                "partition_id": pid,
            })

    return pages.select("url", "html").mapInPandas(run, PARSED_SCHEMA)


def extract_parsed(parsed: DataFrame, clean: bool = False) -> DataFrame:
    """Stages 2–6 over a checkpointed ``parsed`` table: deserialize the JSON
    wire format and run analysis → categorize → boilerplate → order →
    articles → emit.  Same output contract as :func:`extract_pages`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        from ..kernels.serialize import from_json
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        for pdf in batches:
            rows = []
            for url, dj in zip(pdf["url"], pdf["doc_json"]):
                doc = from_json(dj, url=url)
                if clean:
                    from ..kernels.fix import clean_doc
                    doc = clean_doc(doc)
                r = extract_document(doc)
                rows.append((
                    r["url"], r["text"], r["raw_text"], r["n_blocks"],
                    r["n_main_blocks"], r["n_articles"], r["n_words"],
                    r["normal_text_size"], r["detected_columns"],
                    r["reading_order"],
                    [{"block_id": b, "start": s, "end": e} for b, s, e in r["spans"]],
                    pid,
                ))
            yield pd.DataFrame(rows, columns=[f.name for f in EXTRACTED_SCHEMA.fields])

    return parsed.select("url", "doc_json").mapInPandas(run, EXTRACTED_SCHEMA)


def blocks_from_pages(pages: DataFrame, categorize: bool = True) -> DataFrame:
    """UDTF-shaped parse stage: one page row → N block rows with geometry +
    density features (the ``blocks`` intermediate table of SURVEY.md §1.5)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.classify import categorize_blocks
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                doc = parse_hocr(bytes(html), url=url)
                if categorize and doc.n_blocks():
                    categorize_blocks(doc)
                for bi in range(doc.n_blocks()):
                    wi = doc.words_of(bi)
                    keys, _, _ = doc.line_table(bi)
                    l, r, t, b = (int(v) for v in doc.b_box[bi])
                    rows.append((
                        url, int(doc.b_id[bi]),
                        str(doc.b_type[bi]) if doc.b_type[bi] is not None else None,
                        l, r, t, b, int(len(wi)), int(len(keys)),
                        float(doc.w_link[wi].mean()) if len(wi) else 0.0,
                        doc.block_mean_word_height(bi),
                    ))
            yield pd.DataFrame(rows, columns=[f.name for f in BLOCKS_SCHEMA.fields])

    return pages.select("url", "html").mapInPandas(run, BLOCKS_SCHEMA)


def salted_repartition(df: DataFrame, num_partitions: int, salt: int = 0,
                       key: str = "url") -> DataFrame:
    """Spread skewed domain keys uniformly before the per-document kernels
    (SURVEY.md §4.2): partition on a salted 64-bit hash of the row key, so a
    hot domain's pages scatter across all partitions instead of hot-spotting
    one executor."""
    return df.repartition(num_partitions, F.xxhash64(F.col(key), F.lit(salt)))
