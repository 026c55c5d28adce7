"""Block classification: type taxonomy + start/end-text flags + boilerplate.

- :func:`categorize_blocks` re-implements the reference decision tree
  (``O/ocr_tree_module/ocr_tree_analyser.py:1087-1231``): empty →
  delimiter/other; normal-size ∧ ¬title-range → text (caption if an image is
  directly above); vertical → text; bigger ∧ title-range → title (<10 words)
  / highlight; smaller ∧ image/caption above → caption; fallback text/other.
  Start/end-text continuation flags from the same code (``:1170-1182``).
- :func:`boilerplate_mask` is the *new-design* Boilerpipe/Readability-style
  text-density classifier required by BASELINE.json's north_star (link
  density / block area features) — the reference has no HTML notion, so this
  component is original, not a port.
"""

from __future__ import annotations

import re

import numpy as np

from . import geometry as g
from . import neighbors as nb
from .analyzer import analyze_text
from .doc import Document

__all__ = ["categorize_blocks", "boilerplate_mask"]

_STARTS_DIALOGUE = re.compile(r"^(-|\"|\')\s*[A-Z\"]")
_HAS_LOWER = re.compile(r"[a-z]")
_ENDS_PUNCT = re.compile(r"(\.|!|\?|\"|\')\s*$")


def _start_end_flags(text: str) -> tuple[bool, bool]:
    """start_text / end_text detection (``ocr_tree_analyser.py:1170-1182``)."""
    if text and (_HAS_LOWER.search(text) and not text[0].isupper()
                 and not _STARTS_DIALOGUE.match(text)):
        start = False
    else:
        start = True
    if text and (_ENDS_PUNCT.search(text) or not _HAS_LOWER.search(text)):
        end = True
    else:
        end = False
    return start, end


def categorize_blocks(doc: Document, conf: int = 10, override: bool = False,
                      analysis: dict | None = None) -> dict:
    """Assign a type to every level-2 block in place; returns the analysis
    dict (``categorize_boxes``, ``ocr_tree_analyser.py:1202-1231``)."""
    if analysis is None:
        analysis = analyze_text(doc, conf=conf)
    normal = analysis.get("normal_text_size", 0)
    avg_char_w = analysis.get("average_character_width", 0.0)
    all_idx = np.arange(doc.n_blocks())
    # one all-pairs pass instead of a per-block strip+prune semi-join call
    above_tbl = nb.neighbor_tables(doc.b_box, all_idx, kinds=("above",))["above"]

    for bi in range(doc.n_blocks()):
        if doc.b_type[bi] is not None and not override:
            continue
        btype = None
        if doc.block_is_empty(bi, conf=conf, only_text=True):
            btype = "delimiter" if doc.block_is_delimiter(bi, conf=conf) else "other"
        else:
            mh = doc.block_mean_word_height(bi, conf=conf)
            mw = doc.block_char_mean_width(bi, conf=conf)
            is_text_size = doc.block_is_text_size(bi, normal, mean_height=mh, rng=0.1)
            title_range = (
                not doc.block_is_text_size(bi, normal, mean_height=mh, rng=1.0)
                or not (avg_char_w * 0.5 <= mw <= avg_char_w * 1.5)
            )
            above = above_tbl[bi]

            if is_text_size and not title_range:
                if not any(doc.block_is_image(ai, conf=conf) for ai in above):
                    btype = "text"
                else:
                    btype = "caption"
            elif doc.block_is_vertical_text(bi, conf=conf):
                btype = "text"
            elif mh > normal and title_range:
                wi = doc.words_of(bi)
                nwords = sum(1 for i in wi
                             if doc.w_conf[i] >= conf and doc.w_text[i].strip())
                btype = "title" if nwords < 10 else "highlight"
            elif mh < normal and any(
                doc.block_is_image(ai, conf=conf) or doc.b_type[ai] == "caption"
                for ai in above
            ):
                btype = "caption"

            # continuation flags use a min conf of 50 (``:1167-1169``)
            text = doc.block_to_text(bi, conf=max(50, conf)).strip()
            start, end = _start_end_flags(text)
            doc.b_start_text[bi] = start
            doc.b_end_text[bi] = end

        if btype is None:
            btype = "text" if not doc.block_is_empty(bi, conf=conf) else "other"
        doc.b_type[bi] = btype
    return analysis


def boilerplate_mask(doc: Document, link_density_threshold: float = 0.5,
                     min_words: int = 1) -> np.ndarray:
    """Boolean mask of boilerplate blocks (True = strip).

    Boilerpipe-style block features over the parsed word table (original
    design per the north_star; the reference operates on OCR output and has
    no anchor/link notion):

    - **link density**: fraction of a block's words inside ``<a>`` anchors —
      nav bars, menus and footer link farms exceed
      ``link_density_threshold``.
    - tiny noise blocks below ``min_words`` confident words are also
      stripped (the reference's ``remove_solo_words`` analog at the page
      margin, ``ocr_tree_fix.py:685-708``).

    Blocks without words (images/delimiters) are never boilerplate here —
    reading-order/type handling decides their fate downstream.
    """
    n = doc.n_blocks()
    mask = np.zeros(n, dtype=bool)
    for bi in range(n):
        wi = doc.words_of(bi)
        if len(wi) == 0:
            continue
        link_frac = float(doc.w_link[wi].mean())
        if link_frac > link_density_threshold:
            mask[bi] = True
        elif len(wi) < min_words:
            mask[bi] = True
    return mask
