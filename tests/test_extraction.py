"""End-to-end kernel extraction: byte parity, determinism, spans,
boilerplate stripping — no Spark session needed (pure kernels)."""

import re

import duckdb
import pytest

from osdocr_spark.kernels.corpus import generate_page, layout_params
from osdocr_spark.kernels.pipeline import extract_html

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return duckdb.sql(
        f"select doc_id, text from '{SF}/documents.parquet' order by doc_id"
    ).fetchall()


def test_byte_identical_inversion_full_corpus(docs):
    """The north-rule invariant: normalized extracted text per url equals the
    whitespace-normalized source text, byte for byte, for every document."""
    for doc_id, text in docs:
        got = extract_html(str(doc_id), generate_page(doc_id, text))["text"]
        assert got == re.sub(r"\s+", " ", text).strip(), f"doc {doc_id}"


def test_deterministic_and_raw_text_stable(docs):
    for doc_id, text in docs[:25]:
        h = generate_page(doc_id, text)
        r1 = extract_html(str(doc_id), h)
        r2 = extract_html(str(doc_id), h)
        assert r1 == r2
        # raw byte-parity artifact: title + '\n' + hyphen-fixed body + '\n';
        # its whitespace-normalization IS the oracle-facing text
        assert r1["raw_text"].endswith("\n")
        assert re.sub(r"\s+", " ", r1["raw_text"]).strip() == r1["text"]


def test_spans_tile_normalized_text(docs):
    for doc_id, text in docs[:50]:
        r = extract_html(str(doc_id), generate_page(doc_id, text))
        spans = r["spans"]
        assert spans, f"doc {doc_id} has no spans"
        assert spans[0][1] == 0
        assert spans[-1][2] == len(r["text"])
        for (b1, s1, e1), (b2, s2, e2) in zip(spans, spans[1:]):
            assert s2 == e1 + 1  # single joining space between blocks
        # each span slices to that block's words
        for bid, s, e in spans:
            assert r["text"][s:e].strip() == r["text"][s:e]


def test_boilerplate_stripped(docs):
    """Nav/footer link blocks never leak into the extracted text."""
    from osdocr_spark.kernels.corpus import _NAV
    for doc_id, text in docs[:50]:
        r = extract_html(str(doc_id), generate_page(doc_id, text))
        toks = set(r["text"].split(" "))
        body_toks = set(text.split(" "))
        leaked = (toks - body_toks) & set(_NAV)
        assert not leaked, f"doc {doc_id} leaked {leaked}"


def test_layout_stats(docs):
    for doc_id, text in docs[:100]:
        p = layout_params(doc_id, len(text.split(" ")))
        r = extract_html(str(doc_id), generate_page(doc_id, text))
        assert r["normal_text_size"] == p["size"]
        assert r["n_articles"] == 1
        # reading order covers the main (non-boilerplate) blocks minus the
        # column-rule delimiters (excluded from the graph)
        n_words = len(text.split(" "))
        n_delims = p["n_cols"] - 1 if (n_words > p["title_n"] and p["n_cols"] >= 2) else 0
        assert len(r["reading_order"]) == r["n_main_blocks"] - n_delims


def test_multi_article_headline_span_collision_regression():
    """Pins the round-3 generator fix: on 3-column multi-article pages the
    article-2 headline spans into column 2, and column 2's body must start
    BELOW it — these seven sf0.1 docs produced overlapping geometry (and
    byte-parity failures) before the fix.  sf0.001/sf0.01 never hit the
    combination, which is why only a full sf0.1 sweep caught it."""
    ids = (1911, 2687, 3135, 3275, 3931, 4125, 4429)
    rows = duckdb.sql(
        "select doc_id, text from '/root/testdata/sf0.1/documents.parquet' "
        f"where doc_id in {ids}").fetchall()
    assert len(rows) == len(ids)
    for doc_id, text in rows:
        r = extract_html(str(doc_id), generate_page(doc_id, text, multi_article=True))
        assert r["text"] == re.sub(r"\s+", " ", text).strip(), f"doc {doc_id}"


def test_multi_article_isolation(docs):
    """graph_isolate_articles cuts at the planted column-2 headline; the
    concatenated article emission still reproduces the source text."""
    two = 0
    for doc_id, text in docs[:150]:
        r = extract_html(str(doc_id), generate_page(doc_id, text, multi_article=True))
        assert r["text"] == re.sub(r"\s+", " ", text).strip(), f"doc {doc_id}"
        p = layout_params(doc_id, len(text.split(" ")))
        if r["n_articles"] == 2:
            two += 1
            assert p["n_cols"] >= 2
    assert two > 30  # the variant genuinely produces multi-article pages


def test_adversarial_byte_parity(docs):
    """Round-4 gauntlet: all five irregular-layout families (ragged columns,
    image+caption, vertical text, >127 blocks, and the composed
    all-at-once family) still invert byte-exactly."""
    for doc_id, text in docs:
        got = extract_html(str(doc_id),
                           generate_page(doc_id, text, adversarial=True))["text"]
        assert got == re.sub(r"\s+", " ", text).strip(), f"doc {doc_id}"


def _order_and_types(doc_id, text):
    from osdocr_spark.kernels.classify import boilerplate_mask, categorize_blocks
    from osdocr_spark.kernels.hocr import parse_hocr
    from osdocr_spark.kernels.order import (sort_topologic_order,
                                            topologic_order_context)
    doc = parse_hocr(generate_page(doc_id, text, adversarial=True),
                     url=str(doc_id))
    categorize_blocks(doc)
    bp = boilerplate_mask(doc)
    main = [i for i in range(doc.n_blocks()) if not bp[i]]
    graph = topologic_order_context(doc, main)
    order = sort_topologic_order(doc, graph, sort_weight=True)
    return doc, order


def test_adversarial_reading_order_goldens(docs):
    """Reading-order goldens in the reference's acceptable-order-set style
    (``OSDOCR/tests/reading_order/test_reading_order.py:57-92``: orders are
    validated by pairwise precedence constraints, not one rigid sequence).
    Asserted pairwise precedences per variant:

    - figure (v1): the image block precedes its caption (the +50
      image→caption attraction edge), and the caption is the LAST text-ish
      main block in the order;
    - vertical (v2): the vertical-text block precedes every body text block;
    - dense (v3): the page really exceeds 127 blocks (int32 dominance path)
      and the order still starts title-first;
    - composed (v4): the adversities hold SIMULTANEOUSLY — vertical block
      first among body text, caption last, >127 blocks, title-first.
    """
    import numpy as np
    checked = {1: 0, 2: 0, 3: 0, 4: 0}
    for doc_id, text in docs[:100]:
        v = doc_id % 5
        if v not in checked:
            continue
        doc, order = _order_and_types(doc_id, text)
        pos = {b: i for i, b in enumerate(order)}
        types = [doc.b_type[i] for i in range(doc.n_blocks())]
        if v == 1 and "caption" in types:
            cap = types.index("caption")
            imgs = [i for i in order
                    if doc.block_is_image(i) and types[i] != "delimiter"]
            assert imgs, f"doc {doc_id}: image lost from order"
            assert pos[imgs[0]] < pos[cap], f"doc {doc_id}: caption before image"
            texty = [b for b in order if types[b] in ("text", "title", "caption")]
            assert texty[-1] == cap, f"doc {doc_id}: caption not last"
            checked[1] += 1
        elif v == 2:
            vert = [i for i in range(doc.n_blocks())
                    if doc.block_is_vertical_text(i)]
            if vert:
                body = [b for b in order
                        if types[b] == "text" and b not in vert
                        and doc.b_box[b][0] < 1100]  # exclude rail analogs
                assert all(pos[vert[0]] < pos[b] for b in body), \
                    f"doc {doc_id}: vertical block not first body block"
                checked[2] += 1
        elif v == 3:
            assert doc.n_blocks() > 127, f"doc {doc_id}: {doc.n_blocks()} blocks"
            assert types[order[0]] == "title", f"doc {doc_id}"
            checked[3] += 1
        elif v == 4:
            # composed also pins past 255 (beyond any uint8 wrap boundary)
            assert doc.n_blocks() > 255, f"doc {doc_id}: {doc.n_blocks()} blocks"
            assert types[order[0]] == "title", f"doc {doc_id}"
            vert = [i for i in range(doc.n_blocks())
                    if doc.block_is_vertical_text(i)]
            if vert:
                body = [b for b in order
                        if types[b] == "text" and b not in vert
                        and doc.b_box[b][0] < 1100]
                assert all(pos[vert[0]] < pos[b] for b in body), \
                    f"doc {doc_id}: vertical block not first body block"
            if "caption" in types:
                cap = types.index("caption")
                texty = [b for b in order
                         if types[b] in ("text", "title", "caption")
                         and doc.b_box[b][0] < 1100]
                assert texty[-1] == cap, f"doc {doc_id}: caption not last"
            # composed = at least one of the two hard adversities landed
            # (both can degrade on short docs per the generator fallbacks)
            if vert or "caption" in types:
                checked[4] += 1
    assert all(n > 0 for n in checked.values()), checked
