"""Flat JSON serialization of documents (SURVEY.md §2.1).

The reference dumps trees as a *pre-order flat list* of node dicts
(``OCR_Tree.to_json``, ``O/ocr_tree_module/ocr_tree.py:270-290``) and
rebuilds them with a level-driven stack (``from_json``, ``:102-128`` — the
same stack algorithm that tree-ifies Tesseract dicts,
``O/ocr_engines/engine_utils.py:88-109``).  This module reproduces that
wire format over the flat columnar :class:`Document`: levels
``1=page, 2=block, 3=paragraph, 4=line, 5=word`` (the document level
collapses into the row key).
"""

from __future__ import annotations

import json

import numpy as np

from .doc import Document

__all__ = ["to_json", "from_json"]


def _node(level: int, box, **extra) -> dict:
    d = {"level": level,
         "box": {"left": int(box[0]), "right": int(box[1]),
                 "top": int(box[2]), "bottom": int(box[3])}}
    d.update(extra)
    return d


def to_json(doc: Document) -> str:
    """Pre-order flat node list (page → block → par → line → word), the
    ``to_json`` wire format (``ocr_tree.py:270-290``)."""
    nodes: list[dict] = []
    if doc.n_blocks():
        page = [int(doc.b_box[:, 0].min()), int(doc.b_box[:, 1].max()),
                int(doc.b_box[:, 2].min()), int(doc.b_box[:, 3].max())]
    else:
        page = [0, 1, 0, 1]
    nodes.append(_node(1, page))
    for bi in range(doc.n_blocks()):
        nodes.append(_node(2, doc.b_box[bi], id=int(doc.b_id[bi]),
                           type=doc.b_type[bi]))
        wi = doc.words_of(bi)
        last_par = last_line = None
        for i in wi:
            p, ln = int(doc.w_par[i]), int(doc.w_line[i])
            if p != last_par:
                # par/line boxes are their word hulls; emit with the first
                # word's box and let from_json carry it (hulls re-derive)
                nodes.append(_node(3, doc.w_box[i], par=p))
                last_par, last_line = p, None
            if ln != last_line:
                nodes.append(_node(4, doc.w_box[i], line=ln))
                last_line = ln
            nodes.append(_node(5, doc.w_box[i], text=doc.w_text[i],
                               conf=int(doc.w_conf[i]), link=bool(doc.w_link[i])))
    return json.dumps(nodes)


def from_json(payload: str, url: str = "") -> Document:
    """Rebuild a :class:`Document` from the flat list with the level-driven
    stack (``from_json``, ``ocr_tree.py:102-128``): each node attaches to
    the most recent node of the previous level."""
    nodes = json.loads(payload)
    wb, wc, wt, wbl, wp, wl, wlk = [], [], [], [], [], [], []
    bb, bid, bty = [], [], []
    cur_block = -1
    cur_par = -1
    cur_line = -1
    for n in nodes:
        lv = n["level"]
        b = n["box"]
        box = (int(b["left"]), int(b["right"]), int(b["top"]), int(b["bottom"]))
        if lv == 2:
            cur_block += 1
            bb.append(box)
            bid.append(n.get("id", cur_block))
            bty.append(n.get("type"))
            cur_par = -1
            cur_line = -1
        elif lv == 3:
            cur_par = n.get("par", cur_par + 1)
            cur_line = -1
        elif lv == 4:
            cur_line = n.get("line", cur_line + 1)
        elif lv == 5:
            wb.append(box)
            wc.append(int(n.get("conf", -1)))
            wt.append(n.get("text", ""))
            wbl.append(cur_block)
            wp.append(max(cur_par, 0))
            wl.append(max(cur_line, 0))
            wlk.append(bool(n.get("link", False)))
    return Document(
        url=url,
        w_box=np.array(wb, np.int64).reshape(-1, 4), w_conf=np.array(wc, np.int64),
        w_text=np.array(wt, object), w_block=np.array(wbl, np.int64),
        w_par=np.array(wp, np.int64), w_line=np.array(wl, np.int64),
        w_link=np.array(wlk, bool), b_box=np.array(bb, np.int64).reshape(-1, 4),
        b_id=np.array(bid, np.int64), b_type=np.array(bty, object),
    )
