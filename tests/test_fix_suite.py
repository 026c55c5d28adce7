"""Unit + end-to-end tests for the §2.9 mutation/fix operators."""

import re

import duckdb
import numpy as np
import pytest

from osdocr_spark.kernels import fix as FX
from osdocr_spark.kernels.corpus import generate_page
from osdocr_spark.kernels.fix import MBlock, MWord
from osdocr_spark.kernels.hocr import parse_hocr
from osdocr_spark.kernels.pipeline import extract_document, extract_html

SF = "/root/testdata/sf0.001"


def W(text, l, t, w=40, h=20, conf=95, par=0, line=0):
    return MWord([l, l + w, t, t + h], conf, text, par, line)


def B(bid, box, words=None, type=None):
    return MBlock(bid, type, list(box), words or [])


def test_remove_nodes_conf_and_empty_boxes():
    blocks = [
        B(0, (0, 100, 0, 20), [W("keep", 0, 0), W("drop", 50, 0, conf=5)]),
        B(1, (0, 400, 40, 45)),                     # thin empty → delimiter kept
        B(2, (10, 60, 100, 140)),                   # empty non-delimiter → dropped
        B(3, (0, 1000, 0, 900)),                    # empty >80% page → dropped
    ]
    blocks = FX.remove_nodes_conf(blocks, conf=10)
    assert [w.text for w in blocks[0].words] == ["keep"]
    out = FX.remove_empty_boxes(blocks, [0, 1000, 0, 1000], conf=10)
    assert [b.id for b in out] == [0, 1]


def test_text_bound_box_fix_shrinks_to_hull():
    b = B(0, (0, 500, 0, 300), [W("a", 20, 30), W("b", 100, 30)])
    FX.text_bound_box_fix([b])
    assert b.box == [20, 140, 30, 50]


def test_block_bound_box_fix_merges_and_shrinks():
    # ≥70% mutual overlap of non-empty blocks → merge
    b1 = B(0, (0, 100, 0, 50), [W("x", 0, 0)])
    b2 = B(1, (5, 100, 0, 50), [W("y", 50, 0)])
    out = FX.block_bound_box_fix([b1, b2])
    assert len(out) == 1 and len(out[0].words) == 2
    # empty inside non-empty → dropped
    b3 = B(0, (0, 200, 0, 100), [W("x", 10, 10)])
    b4 = B(1, (20, 60, 20, 60))
    out = FX.block_bound_box_fix([b3, b4])
    assert [b.id for b in out] == [0]
    # partial overlap → smaller-ratio box shrinks, words clamp
    b5 = B(0, (0, 200, 0, 100), [W("x", 10, 10)])
    b6 = B(1, (180, 400, 0, 100), [W("y", 250, 10)])
    out = FX.block_bound_box_fix([b5, b6])
    assert len(out) == 2
    a, c = (np.array(out[0].box), np.array(out[1].box))
    assert a[1] <= c[0] or c[1] <= a[0]  # disjoint on x now


def test_split_block_horizontal_keep_all():
    words = [W("top", 0, 0, line=0), W("bot", 0, 60, line=1)]
    b = B(0, (0, 100, 0, 90), words)
    parts = FX.split_block(b, [0, 100, 25, 50], orientation="horizontal", keep_all=True)
    assert len(parts) == 2
    assert [w.text for w in parts[0].words] == ["top"]
    assert [w.text for w in parts[1].words] == ["bot"]


def test_split_whitespaces_cuts_common_gap():
    # two lines with the same huge inter-word gap → vertical split
    words = []
    for line in range(2):
        words.append(W(f"l{line}", 0, line * 30, w=40, line=line))
        words.append(W(f"r{line}", 400, line * 30, w=40, line=line))
    b = B(0, (0, 440, 0, 50), words)
    out = FX.split_whitespaces([b], avg_word_dist=10.0, conf=10)
    assert len(out) == 2
    texts = sorted(" ".join(w.text for w in blk.words) for blk in out)
    assert texts == ["l0 l1", "r0 r1"]


def test_unite_blocks_vertical():
    b1 = B(0, (0, 200, 0, 50), [W("upper", 0, 10)], type="text")
    b2 = B(1, (0, 200, 60, 110), [W("lower", 0, 70)], type="text")
    out = FX.unite_blocks([b1, b2])
    assert len(out) == 1
    assert [w.text for w in out[0].words] == ["upper", "lower"]
    assert out[0].box == [0, 200, 0, 110]


def test_remove_solo_words():
    big = B(0, (0, 400, 0, 200), [W("body", 10, 10), W("text", 60, 10)], type="text")
    solo = B(1, (100, 160, 100, 130), [W("noise", 100, 100)], type="other")
    out = FX.remove_solo_words([big, solo])
    assert [b.id for b in out] == [0]


def test_find_text_titles_splits_title_line():
    words = [W("BIG", 0, 0, w=80, h=50, line=0),
             W("normal", 0, 70, h=20, line=1), W("text", 50, 70, h=20, line=1)]
    b = B(0, (0, 200, 0, 90), words, type="text")
    out = FX.find_text_titles([b], normal_text_size=20, avg_char_width=12)
    types = sorted(str(x.type) for x in out)
    assert types == ["text", "title"]
    title = next(x for x in out if x.type == "title")
    assert [w.text for w in title.words] == ["BIG"]


def test_join_blocks_horizontal_slot_merge():
    a = B(0, (0, 100, 0, 60), [W("a1", 0, 0, line=0), W("a2", 0, 30, line=1)])
    b = B(1, (120, 220, 0, 60), [W("b1", 120, 0, line=0), W("b2", 120, 30, line=1)])
    FX.join_blocks(a, b, orientation="horizontal")
    lines = a.lines()
    assert [[w.text for w in ws] for _k, ws in lines] == [["a1", "b1"], ["a2", "b2"]]


def test_json_roundtrip():
    from osdocr_spark.kernels.serialize import from_json, to_json
    doc = parse_hocr(generate_page(3, "alpha beta gamma delta " * 10), url="j")
    doc2 = from_json(to_json(doc), url="j")
    assert list(doc.w_text) == list(doc2.w_text)
    assert (doc.w_box == doc2.w_box).all()
    assert (doc.b_box == doc2.b_box).all()
    assert (doc.w_par == doc2.w_par).all() and (doc.w_line == doc2.w_line).all()


@pytest.fixture(scope="module")
def docs():
    return duckdb.sql(
        f"select doc_id, text from '{SF}/documents.parquet' order by doc_id"
    ).fetchall()


def test_noisy_pages_break_without_clean(docs):
    broken = sum(
        1 for d, t in docs[:40]
        if extract_html(str(d), generate_page(d, t, noisy=True))["text"]
        != re.sub(r"\s+", " ", t).strip())
    assert broken == 40  # the injected noise is real


def test_clean_doc_recovers_noisy_pages(docs):
    """End-to-end §2.9 gauntlet: every noisy page byte-recovers after the
    full cleaning pipeline (the extract_text_noisy oracle)."""
    for d, t in docs:
        got = extract_html(str(d), generate_page(d, t, noisy=True), clean=True)["text"]
        assert got == re.sub(r"\s+", " ", t).strip(), f"doc {d}"


def test_clean_doc_stable_on_clean_pages(docs):
    for d, t in docs[:60]:
        got = extract_html(str(d), generate_page(d, t), clean=True)["text"]
        assert got == re.sub(r"\s+", " ", t).strip(), f"doc {d}"


def test_block_bound_box_fix_vec_matches_loop():
    """Exact A/B parity of the vectorized-partner-scan overlap fix against
    the scalar walk (boxes AND word assignments), over adversarial and
    crossed pages — the only layouts that reach the >=64-block dispatch."""
    import duckdb

    from osdocr_spark.kernels import fix as F
    from osdocr_spark.kernels.corpus import generate_page_adversarial
    from osdocr_spark.kernels.hocr import parse_hocr

    def snap(blocks):
        return [(b.box, sorted((tuple(w.box), w.text, w.conf)
                               for w in b.words)) for b in blocks]

    rows = duckdb.sql("select doc_id, text from "
                      "'/root/testdata/sf0.001/documents.parquet'").fetchall()
    checked = 0
    for doc_id, text in rows[:30]:
        for noisy in (False, True):
            d = parse_hocr(generate_page_adversarial(doc_id, text.strip(),
                                                     noisy=noisy))
            b_vec, b_loop = F.to_mutable(d), F.to_mutable(d)
            v = F._block_bound_box_fix_vec(b_vec, 10, 5)
            old = F._BBF_VEC_MIN_BLOCKS
            F._BBF_VEC_MIN_BLOCKS = 10 ** 9  # force the scalar walk
            try:
                s = F.block_bound_box_fix(b_loop, 10, 5)
            finally:
                F._BBF_VEC_MIN_BLOCKS = old
            assert snap(v) == snap(s), (doc_id, noisy)
            checked += 1
    assert checked == 60
