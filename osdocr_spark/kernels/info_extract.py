"""Template-driven journal text dump (``journal_template_to_text``,
``O/ocr_tree_module/information_extraction.py:6-100``) — the last non-GUI
reference callable (r3 VERDICT item 2).

The reference converts OCR results to text through a *journal template*: a
dict of page areas (``header``, ``columns`` list, ``footer``); each area's
boxes are dumped in section order, columns additionally split into articles
at horizontal delimiters.  Re-derivations here:

- :func:`derive_journal_template` builds the template from the document's
  OWN analysis (the reference flow expects the user to supply it from known
  journal geometry; deriving it from classified-block geometry + the
  column-projection peaks keeps the operator purely OCR-driven).  The
  projection-only header/body split (``get_journal_areas``,
  ``ocr_tree_analyser.py:248-392``) collapses on sparse pages (few line
  tops ⇒ one smoothed run), so the y-bands come from classified blocks:
  header = above the topmost main non-title text block, footer = below the
  bottom-most one; the x-strips come from the left-margin projection peaks
  (``get_columns``) padded half a gutter.
- :func:`journal_template_to_text` reproduces the reference's formatted
  string: ``HEADER:`` banner + per-box text, per-column banners with
  article pretty-prints, ``FOOTER:`` banner.  Article isolation inside a
  column follows the reference's *actual* behavior: split at horizontal
  delimiters when present; otherwise ONE article per column — the
  reference's text-analysis fallback never populates ``article_areas``
  (its second ``while`` loop reuses the exhausted index ``i`` from the
  first, ``information_extraction.py:79-96``), so the whole column falls
  through to the single-area default.  Replicated with this note rather
  than "fixed", since the emitted bytes are the parity contract.
- :func:`journal_template_sections` is the table-shaped operator surface:
  (section, normalized_text) rows whose per-section text follows the SAME
  word→block attribution contract as the pipeline's ``spans`` (hyphen-split
  words belong to the block of their first fragment), so the driver oracle
  can re-derive every section from the wrap simulation.
"""

from __future__ import annotations

import numpy as np

from . import geometry as g
from .analyzer import analyze_text
from .classify import boilerplate_mask, categorize_blocks
from .doc import Document
from .emit import article_pretty_print, assemble_article

__all__ = ["derive_journal_template", "journal_template_to_text",
           "journal_template_sections"]

_COLUMN_PAD = 10  # half a typical gutter: absorbs ±px jitter in peak positions


def derive_journal_template(doc: Document, analysis: dict | None = None) -> dict:
    """Journal template (``{'header': box, 'columns': [box...], 'footer':
    box}``) from the parsed document itself (see module docstring).

    Blocks must already be categorized; pass ``analysis`` to reuse stats.
    """
    if analysis is None:
        analysis = categorize_blocks(doc)
    bp = boilerplate_mask(doc)
    page_r = int(doc.b_box[:, g.R].max()) + 1 if doc.n_blocks() else 1
    page_b = int(doc.b_box[:, g.B].max()) + 1 if doc.n_blocks() else 1

    body_idx = [i for i in range(doc.n_blocks())
                if not bp[i] and len(doc.words_of(i))
                and doc.b_type[i] not in ("title", "delimiter", "other")]
    if body_idx:
        body_top = int(min(doc.b_box[i][g.T] for i in body_idx)) - 1
        body_bottom = int(max(doc.b_box[i][g.B] for i in body_idx)) + 1
    else:
        body_top, body_bottom = page_b, page_b

    cols = analysis.get("columns") or []
    col_boxes = []
    for c in cols:
        col_boxes.append(g.box(int(c[g.L]) - _COLUMN_PAD,
                               int(c[g.R]) - _COLUMN_PAD,
                               body_top, body_bottom))
    if not col_boxes:
        col_boxes = [g.box(0, page_r, body_top, body_bottom)]
    # header spans the full page width (mastheads/titles can out-span the
    # columns); the footer band is x-bounded to the columns' span so side
    # marginalia below the body never reads as footer content
    span_l = int(col_boxes[0][g.L])
    span_r = int(col_boxes[-1][g.R])
    return {
        "header": g.box(0, page_r, 0, body_top),
        "columns": col_boxes,
        "footer": g.box(span_l, span_r, body_bottom, page_b),
    }


def _column_articles(doc: Document, col_idx: list[int], column) -> list[list[int]]:
    """Split a column's blocks into articles at horizontal delimiters
    (``information_extraction.py:36-63``); without any, the whole column is
    one article (the reference's actual fallback behavior — see module
    docstring)."""
    delims = [i for i in col_idx if doc.b_type[i] == "delimiter"
              and g.width(doc.b_box[i]) >= g.height(doc.b_box[i]) * 4]
    texty = [i for i in col_idx if len(doc.words_of(i))]
    texty.sort(key=lambda i: int(doc.b_box[i][g.T]))
    if not delims:
        return [texty] if texty else []
    delims.sort(key=lambda i: int(doc.b_box[i][g.T]))
    # areas between consecutive delimiters.  Divergence, documented: the
    # reference's slicing loop (``information_extraction.py:44-55``) runs
    # ``range(len(article_delimiters)-1)`` — k delimiters yield k-1 areas,
    # silently DROPPING every block below the last delimiter, and a single
    # delimiter yields no articles at all (the whole column vanishes from
    # the dump).  Sliced here as k+1 segments (above-first .. below-last)
    # so no content is lost; same fixed-with-rationale policy as the
    # reachability bugs in ``order.py:10-21``.
    arts: list[list[int]] = []
    uppers = [int(column[g.T])] + [int(doc.b_box[d][g.B]) for d in delims]
    lowers = [int(doc.b_box[d][g.T]) for d in delims] + [int(column[g.B])]
    for up, lo in zip(uppers, lowers):
        blocks = [i for i in texty
                  if up <= int(doc.b_box[i][g.T]) and int(doc.b_box[i][g.B]) <= lo]
        if blocks:
            arts.append(blocks)
    return arts


def journal_template_to_text(doc: Document, template: dict | None = None) -> str:
    """The reference's formatted dump (``journal_template_to_text``,
    ``information_extraction.py:6-100``): HEADER banner + per-box text,
    per-column banners + article pretty-prints, FOOTER banner."""
    if template is None:
        template = derive_journal_template(doc)
    text = "HEADER:\n\n"
    for bi in doc.blocks_in_area(template["header"]):
        if len(doc.words_of(bi)):
            text += doc.block_to_text(bi) + "\n"
    for i, column in enumerate(template["columns"]):
        text += ("\n" + "#" * 100 + f"\n        COLUMN {i}:\n\n")
        col_idx = list(doc.blocks_in_area(column))
        for art_blocks in _column_articles(doc, col_idx, column):
            art = assemble_article(doc, art_blocks)
            text += article_pretty_print(art) + "\n"
    text += "\n" + "^" * 49 + "\n        FOOTER:\n\n"
    for bi in doc.blocks_in_area(template["footer"]):
        if len(doc.words_of(bi)):
            text += doc.block_to_text(bi) + "\n"
    return text


def journal_template_sections(doc: Document, extracted: dict,
                              template: dict | None = None) -> list[tuple[str, str]]:
    """Table-shaped surface: ``(section, text)`` rows — ``header``,
    ``column_0`` … ``column_{k-1}``, ``footer``.

    Per-section text is assembled from the pipeline's normalized text +
    spans (``extracted`` = :func:`~osdocr_spark.kernels.pipeline.
    extract_document` output): each block's normalized substring is its
    span slice, so hyphen-split words land in the section of their FIRST
    fragment — the same attribution contract the ``extract_spans`` oracle
    pins.  Header/footer blocks are boilerplate (outside ``spans``), so
    their text comes from the word table directly."""
    if template is None:
        template = derive_journal_template(doc)
    norm = extracted["text"]
    by_block = {int(b): norm[int(s):int(e)] for b, s, e in extracted["spans"]}
    id2idx = {int(doc.b_id[i]): i for i in range(doc.n_blocks())}

    def _raw(bi: int) -> str:
        return " ".join(doc.w_text[w] for w in doc.words_of(bi)
                        if doc.w_conf[w] >= 0 and doc.w_text[w])

    out: list[tuple[str, str]] = []
    hdr = [bi for bi in doc.blocks_in_area(template["header"])
           if len(doc.words_of(bi))]
    out.append(("header", " ".join(
        by_block.get(int(doc.b_id[bi]), _raw(bi)) for bi in hdr)))
    for i, column in enumerate(template["columns"]):
        ids = sorted(int(doc.b_id[bi]) for bi in doc.blocks_in_area(column)
                     if int(doc.b_id[bi]) in by_block)
        if ids:  # a column whose lines hold only continuation fragments
            out.append((f"column_{i}", " ".join(by_block[b] for b in ids)))
    fot = [bi for bi in doc.blocks_in_area(template["footer"])
           if len(doc.words_of(bi))]
    out.append(("footer", " ".join(
        by_block.get(int(doc.b_id[bi]), _raw(bi)) for bi in fot)))
    return out
