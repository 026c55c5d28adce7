"""Per-document end-to-end extraction kernel.

Mirrors the reference's target lifecycle (``O/pipeline.py:971-1093`` →
``run_target``; SURVEY.md §3.1) re-ordered for an HTML payload:

1. parse    — hOCR bytes → columnar :class:`Document` (ingest stage analog,
              ``engine_utils.py:88-109``)
2. analyze  — ``analyze_text`` stats (text sizes / columns / word gaps)
3. categorize — block type taxonomy + start/end-text flags
4. boilerplate strip — link-density mask (north_star component; replaces the
              image-space header/footer segmentation the reference delegates
              to the absent ``document_image_utils``; its box-space analog
              ``get_journal_areas`` is available as a standalone operator)
5. order    — attraction-weighted topological reading order over main blocks
              (``extract_articles`` path, ``ocr_tree_analyser.py:1919-1944``)
6. articles + emit — article isolation, assembly, ``to_txt`` with
              ``fix_hifenization``; raw bytes (parity artifact) + normalized
              text + per-block character spans.

The function is pure and deterministic — one Python call per document, all
inner loops numpy or O(blocks²) with tens of blocks.  The Spark layer feeds
it whole Arrow batches (:mod:`osdocr_spark.spark.stages`).
"""

from __future__ import annotations

from .analyzer import analyze_text
from .classify import boilerplate_mask, categorize_blocks
from .doc import Document
from .emit import article_to_txt, assemble_article, document_text
from .hocr import parse_hocr
from .order import graph_isolate_articles, sort_topologic_order, topologic_order_context

__all__ = ["extract_document", "extract_html"]


def extract_document(doc: Document, conf: int = 10) -> dict:
    """Run stages 2–6 over a parsed document.  Returns a plain dict (arrow
    friendly): url, text (normalized), raw_text (byte-parity artifact),
    reading order, spans, per-article rows, and layout stats."""
    analysis = categorize_blocks(doc, conf=conf)
    bp = boilerplate_mask(doc)
    main_idx = [i for i in range(doc.n_blocks()) if not bp[i]]

    order: list[int] = []
    articles: list[list[int]] = []
    graph = topologic_order_context(doc, main_idx)
    if graph is not None:
        order = sort_topologic_order(doc, graph, sort_weight=True)
        articles = graph_isolate_articles(doc, order)

    assembled = [assemble_article(doc, art) for art in articles]
    raw = "".join(article_to_txt(a) for a in assembled)
    norm = document_text(doc, articles, normalize=True)
    article_rows = [
        (idx,
         (a["title"] or "").strip(),
         "".join(payload for kind, payload in a["body"] if kind == "text").strip())
        for idx, a in enumerate(assembled)
    ]

    # per-block character spans over the normalized text: the normalized
    # text is the ' '-joined confident word stream in emission order with
    # hyphen-split words re-joined, so offsets are exact cumulative sums
    # (hyphen merges replicate fix_hifenization's join, attributed to the
    # block holding the first fragment)
    emitted: list[int] = []
    for art, a in zip(articles, assembled):  # reuse: assemble is pure
        title_block = None
        if a["title"] is not None:
            cands = [b for b in art if doc.b_type[b] == "title"]
            if cands:
                title_block = max(cands, key=lambda b: doc.block_mean_word_height(b))
                emitted.append(title_block)
        emitted.extend(b for b in art if b != title_block and doc.b_type[b] != "image")
    tokens: list[tuple[int, str]] = []
    for bi in emitted:
        tokens.extend(
            (int(doc.b_id[bi]), doc.w_text[i])
            for i in doc.words_of(bi) if doc.w_conf[i] >= 0 and doc.w_text[i]
        )
    merged: list[tuple[int, str]] = []
    i = 0
    n_merges = 0
    while i < len(tokens):
        bid, w = tokens[i]
        nxt = tokens[i + 1][1] if i + 1 < len(tokens) else ""
        joinable_next = nxt[:1].islower() or nxt[:1].isdigit() or nxt[:1] == "_"
        if (n_merges < 8 and len(w) >= 2 and w.endswith("-")
                and (w[-2].isalnum() or w[-2] == "_") and joinable_next):
            merged.append((bid, w[:-1] + nxt))
            i += 2
            n_merges += 1
        else:
            merged.append((bid, w))
            i += 1
    spans: list[tuple[int, int, int]] = []
    pos = 0
    cur_bid = None
    cur_start = 0
    for bid, w in merged:
        if bid != cur_bid:
            if cur_bid is not None:
                spans.append((cur_bid, cur_start, pos - 1))
            cur_bid = bid
            cur_start = pos
        pos += len(w) + 1
    if cur_bid is not None:
        spans.append((cur_bid, cur_start, pos - 1))

    n_cols = len(analysis.get("columns", []))
    return {
        "url": doc.url,
        "text": norm,
        "raw_text": raw,
        "n_blocks": doc.n_blocks(),
        "n_main_blocks": len(main_idx),
        "n_articles": len(articles),
        "n_words": int(len(doc.w_text)),
        "normal_text_size": int(analysis.get("normal_text_size", 0)),
        "detected_columns": n_cols,
        "reading_order": [int(doc.b_id[i]) for i in order],
        "spans": spans,
        "block_types": [str(t) for t in doc.b_type],
        "article_rows": article_rows,
    }


def extract_html(url: str, html: bytes, conf: int = 10, clean: bool = False) -> dict:
    """Stage 1 + 2–6: parse, optionally run the §2.9 fix suite
    (``kernels.fix.clean_doc`` — the reference's ``clean_ocr`` order), then
    extract."""
    doc = parse_hocr(html, url=url)
    if clean:
        from .fix import clean_doc
        doc = clean_doc(doc, conf=conf)
    return extract_document(doc, conf=conf)
