"""``journal_template_to_text`` port tests (the last non-GUI reference
callable, ``O/ocr_tree_module/information_extraction.py:6-100``): template
derivation invariants, a formatted-dump golden, sections↔pipeline-text
consistency, and the delimiter article split (k+1 slicing — documented
divergence from the reference's truncating ``range(len-1)`` loop)."""

import duckdb
import numpy as np
import pytest

from osdocr_spark.kernels import geometry as g
from osdocr_spark.kernels.corpus import generate_page
from osdocr_spark.kernels.doc import Document
from osdocr_spark.kernels.hocr import parse_hocr
from osdocr_spark.kernels.info_extract import (_column_articles,
                                               derive_journal_template,
                                               journal_template_sections,
                                               journal_template_to_text)
from osdocr_spark.kernels.pipeline import extract_document

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return duckdb.sql(
        f"select doc_id, text from '{SF}/documents.parquet' order by doc_id"
    ).fetchall()


def _prep(d, t):
    doc = parse_hocr(generate_page(d, t), url=str(d))
    r = extract_document(doc)
    return doc, r


def test_template_bands_partition_page(docs):
    """Header band ends where the columns start, columns end where the
    footer starts, and the column-strip count equals the pipeline's
    detected column count."""
    for d, t in docs[:30]:
        doc, r = _prep(d, t)
        tpl = derive_journal_template(doc)
        cols = tpl["columns"]
        assert len(cols) == r["detected_columns"]
        for c in cols:
            assert int(tpl["header"][g.B]) == int(c[g.T])
            assert int(tpl["footer"][g.T]) == int(c[g.B])
        # footer is x-bounded to the columns' span: the marginalia rail
        # (left edge 1100) must sit outside it
        assert int(tpl["footer"][g.R]) <= 1100


_GOLDEN_DOC0 = (
    "HEADER:\n\n\n\t\nhome login subscribe \n\n\t\nthe fast \n\n"
    + "#" * 100
    + "\n        COLUMN 0:\n\nTITLE: None\n"
    + "-" * 34 + "\n" + "-" * 34 + "\n        AUTHORS: \n"
    + "-" * 34 + "\n" + "-" * 34 + "\n        ABSTRACT: \n        None\n"
    + "-" * 34 + "\n" + "-" * 34 + "\n        BODY: \n"
    "[('text', '\\n\\t \\nkey order sort table scan merge part window small "
    "hash scan join order batch batch  \\nbatch stream spark window window "
    "dup ')]\n\n" + "-" * 34 + "\n\n"
    + "^" * 49 + "\n        FOOTER:\n\n\n\t\ncontact about privacy \n"
)


def test_dump_golden_doc0(docs):
    """Byte-exact formatted dump for doc 0 (single column) — banner layout,
    ``TITLE: None`` stringification and the body repr-print are all the
    reference's own quirks (``article.py:151-170``: ``{self.body}``)."""
    d, t = docs[0]
    doc, _ = _prep(d, t)
    assert journal_template_to_text(doc) == _GOLDEN_DOC0


def test_dump_structure(docs):
    """One HEADER banner, one COLUMN banner per template strip, one FOOTER
    banner, in order."""
    for d, t in docs[:20]:
        doc, _ = _prep(d, t)
        tpl = derive_journal_template(doc)
        s = journal_template_to_text(doc, tpl)
        assert s.startswith("HEADER:\n\n")
        assert s.count("#" * 100) == len(tpl["columns"])
        assert s.count("^" * 49 + "\n        FOOTER:") == 1
        for i in range(len(tpl["columns"])):
            assert f"        COLUMN {i}:\n" in s


def test_sections_reconstruct_pipeline_text(docs):
    """header = 3 nav words + title; columns in order carry the body words
    in reading order — so title + columns re-concatenated equals the
    pipeline's normalized text byte-for-byte (the same invariant the
    driver's ``extract_journal_template`` oracle pins cross-engine)."""
    for d, t in docs[:40]:
        doc, r = _prep(d, t)
        secs = dict(journal_template_sections(doc, r))
        title = " ".join(secs["header"].split(" ")[3:])
        body = " ".join(v for k, v in sorted(secs.items())
                        if k.startswith("column_"))
        assert (title + " " + body).strip() == r["text"]
        assert len(secs["footer"].split(" ")) == 3


def _mini_doc(with_delims):
    """Two stacked text blocks in one column, optionally separated/followed
    by wide horizontal delimiters."""
    words = [("alpha", 0), ("beta", 1)]
    w_box, w_text, w_block = [], [], []
    for wi, (w, b) in enumerate(words):
        top = 10 + b * 100
        w_box.append([10, 60, top, top + 20])
        w_text.append(w)
        w_block.append(b)
    boxes = [[10, 200, 10, 30], [10, 200, 110, 130]]
    types = ["text", "text"]
    if with_delims:
        boxes += [[10, 200, 60, 62], [10, 200, 160, 162]]
        types += ["delimiter", "delimiter"]
    n = len(w_text)
    nb = len(boxes)
    return Document(
        url="m",
        w_box=np.array(w_box, dtype=np.int64),
        w_conf=np.full(n, 90, dtype=np.int64),
        w_text=np.array(w_text, dtype=object),
        w_block=np.array(w_block, dtype=np.int64),
        w_par=np.zeros(n, dtype=np.int64),
        w_line=np.zeros(n, dtype=np.int64),
        w_link=np.zeros(n, dtype=bool),
        b_box=np.array(boxes, dtype=np.int64),
        b_id=np.arange(nb, dtype=np.int64),
        b_type=np.array(types, dtype=object),
    )


def test_column_articles_delimiter_split():
    """Two horizontal delimiters slice the column into per-segment articles;
    content below the LAST delimiter is kept (the reference's
    ``range(len(article_delimiters)-1)`` loop would drop it — and would
    emit zero articles for a single delimiter; divergence documented in
    ``info_extract._column_articles``)."""
    doc = _mini_doc(with_delims=True)
    col = g.box(0, 210, 0, 200)
    arts = _column_articles(doc, list(range(doc.n_blocks())), col)
    assert arts == [[0], [1]]
    # single delimiter between the blocks: both sides survive
    doc2 = _mini_doc(with_delims=False)
    doc2.b_box = np.vstack([doc2.b_box, [[10, 200, 60, 62]]])
    doc2.b_id = np.arange(3, dtype=np.int64)
    doc2.b_type = np.array(["text", "text", "delimiter"], dtype=object)
    arts2 = _column_articles(doc2, [0, 1, 2], col)
    assert arts2 == [[0], [1]]


def test_column_articles_no_delimiter_is_one_article():
    doc = _mini_doc(with_delims=False)
    col = g.box(0, 210, 0, 200)
    assert _column_articles(doc, [0, 1], col) == [[0, 1]]
