"""Fixture↔oracle coupling tripwire (round 4, VERDICT r3 item 5).

The extraction oracles (`ops/extraction.py::_O_WRAP_PREFIX/_O_BLOCKS/
_O_BOILER/...`) carry LITERAL arithmetic that must move in lockstep with
``kernels/corpus.py`` — historically the likeliest silent-greenness bug (a
generator edit that forgets one of the coupled oracles).  Every probe here
re-derives the oracle's quantities FROM corpus.py's own functions and
constants and compares against the SQL run on a synthetic probe corpus, so
a one-sided edit fails THIS file loudly, fast (DuckDB only, no Spark),
with a named probe.  Mutation-verified: flipping ``RAIL_X``, ``GUTTER``,
``SIZES`` or the hyphen-split modulus makes a probe here fail (see
NOTES.md round-4 log).
"""

import duckdb
import pytest

from osdocr_spark.kernels import corpus as C
from osdocr_spark.kernels.corpus import _NAV, _wrap_words, generate_page, layout_params
from osdocr_spark.kernels.hocr import parse_hocr
from osdocr_spark.ops import extraction as X

# Probe corpus: doc_ids cover all 4 size classes and both column parities;
# word counts straddle the title_n (24) and n_cols (40) thresholds; word
# lengths 2–8 chars so the deterministic hyphen rule (len >= 6) triggers.
_PROBE = [
    (i, " ".join("w" + "x" * (1 + (j * 7 + i) % 7) for j in range(n)))
    for i, n in ((0, 10), (1, 23), (2, 24), (3, 39), (4, 40), (5, 41),
                 (6, 80), (7, 120), (10, 55), (13, 200))
]
_TEXT = dict(_PROBE)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    c.executemany("INSERT INTO documents VALUES (?, ?)", _PROBE)
    return c


def _url(doc_id):
    from osdocr_spark.spark.stages import URL_DOMAINS
    return f"https://news-{doc_id % URL_DOMAINS}.example.com/a/{doc_id}"


def test_nav_vocab_literals_derive_from_corpus():
    """The oracle's inlined nav-word/length arrays ARE corpus._NAV."""
    assert X._NAV_LEN_SQL == "[" + ",".join(str(len(w)) for w in _NAV) + "]"
    assert X._NAV_SQL == "[" + ",".join(f"'{w}'" for w in _NAV) + "]"
    # r4 ADVICE: the rotation modulus must track the vocabulary size too —
    # a grown _NAV with a stale "% 10" would desynchronize every nav oracle.
    # _NAV_MOD is interpolated into every nav rotation in the oracle SQL.
    assert X._NAV_MOD == len(_NAV)
    assert f"% {X._NAV_MOD} AS INT" in X._O_TEMPLATE


def test_lay3_matches_layout_params(con):
    """lay/lay2/lay3 CTE literals (size classes, title_n and n_cols
    thresholds, col_w span RAIL_X−GUTTER−MARGIN, cpl floor, title cpl over
    PAGE_W−2·MARGIN) re-derived from corpus constants."""
    rows = con.sql(X._O_WRAP_PREFIX + """
      SELECT doc_id, s, title_n, n_cols, col_w, cpl, cpl_t, tsize, tcw, cw
      FROM lay3 ORDER BY doc_id""").fetchall()
    assert len(rows) == len(_PROBE)
    for doc_id, s, title_n, n_cols, col_w, cpl, cpl_t, tsize, tcw, cw in rows:
        p = layout_params(doc_id, len(_TEXT[doc_id].split(" ")))
        assert (s, title_n, n_cols) == (p["size"], p["title_n"], p["n_cols"])
        assert tsize == p["title_size"] and cw == p["char_w"]
        assert tcw == p["title_size"] * 3 // 5
        exp_col_w = (C.RAIL_X - C.GUTTER - C.MARGIN
                     - (n_cols - 1) * C.GUTTER) // n_cols
        assert col_w == exp_col_w
        assert cpl == max(exp_col_w // p["char_w"], 8)
        assert cpl_t == (C.PAGE_W - 2 * C.MARGIN) // tcw


def test_wrap_sim_matches_wrap_words(con):
    """The recursive sim's closed lines (char width incl. separators, item
    count, hyphen splits) equal corpus._wrap_words line-for-line on both
    streams — the arithmetic every geometry oracle stands on."""
    rows = con.sql(X._O_WRAP_PREFIX + """
      SELECT stream, doc_id, line_idx, chars, items
      FROM lines ORDER BY stream, doc_id, line_idx""").fetchall()
    by = {}
    for stream, doc_id, li, chars, items in rows:
        by.setdefault((stream, doc_id), []).append((li, chars, items))
    for doc_id, text in _PROBE:
        words = text.split(" ")
        p = layout_params(doc_id, len(words))
        col_w = (C.RAIL_X - C.GUTTER - C.MARGIN
                 - (p["n_cols"] - 1) * C.GUTTER) // p["n_cols"]
        cpl = max(col_w // p["char_w"], 8)
        tcw = p["title_size"] * 3 // 5
        cpl_t = (C.PAGE_W - 2 * C.MARGIN) // tcw
        for stream, src, hyphen, width in (
                (0, words[p["title_n"]:], True, cpl),
                (1, words[:p["title_n"]], False, cpl_t)):
            want = _wrap_words(src, width, doc_id, allow_hyphen=hyphen) if src else []
            got = by.get((stream, doc_id), [])
            assert len(got) == len(want), (doc_id, stream, len(got), len(want))
            for (li, chars, items), ln in zip(got, want):
                assert items == len(ln), (doc_id, stream, li)
                assert chars == sum(len(w) for w in ln) + len(ln) - 1, \
                    (doc_id, stream, li)


def test_blocks_oracle_geometry_matches_generated_page(con):
    """_O_BLOCKS geometry (every block's bbox — nav, title, body columns,
    column-rule delimiters at the GUTTER midpoint, footer, and the
    marginalia rail at literal RAIL_X) equals the PARSE of the page corpus
    actually generates.  This is the probe that trips on a RAIL_X / GUTTER /
    MARGIN / pitch mutation."""
    rows = con.sql(X._O_BLOCKS).fetchall()
    by_url = {}
    for r in rows:
        by_url.setdefault(r[0], []).append(r)
    for doc_id, text in _PROBE:
        doc = parse_hocr(generate_page(doc_id, text), url=_url(doc_id))
        want = sorted(by_url[_url(doc_id)], key=lambda r: r[1])
        assert len(want) == doc.n_blocks()
        for r in want:
            (_, bid, _type, left, right, top, bottom, n_words, *_rest) = r
            i = int(bid)  # parse order == block_id on the clean corpus
            assert [left, right, top, bottom] == list(map(int, doc.b_box[i])), \
                (doc_id, bid)
            assert n_words == len(doc.words_of(i)), (doc_id, bid)


def test_boiler_oracle_matches_generated_link_blocks(con):
    """_O_BOILER's closed forms (2 unconditional link blocks + rail
    3 + nw//12 when body exists; n_cols−1 delimiters) equal a direct count
    of all-link / word-less blocks on the generated page."""
    got = {u: (nb, nd) for u, nb, nd in con.sql(X._O_BOILER).fetchall()}
    for doc_id, text in _PROBE:
        doc = parse_hocr(generate_page(doc_id, text), url=_url(doc_id))
        n_link = sum(
            1 for i in range(doc.n_blocks())
            if len(doc.words_of(i)) and doc.w_link[doc.words_of(i)].mean() > 0.5)
        n_delim = sum(1 for i in range(doc.n_blocks())
                      if len(doc.words_of(i)) == 0)
        assert got[_url(doc_id)] == (n_link, n_delim), (doc_id, got[_url(doc_id)],
                                                        (n_link, n_delim))


def test_stats_oracle_matches_layout_params(con):
    """_O_STATS size-class and column-count CASE literals re-derived from
    corpus.SIZES / layout_params thresholds."""
    got = {u: (s, na, dc) for u, s, na, dc in con.sql(X._O_STATS).fetchall()}
    for doc_id, text in _PROBE:
        p = layout_params(doc_id, len(text.split(" ")))
        assert got[_url(doc_id)] == (p["size"], 1, p["n_cols"]), doc_id
        assert p["size"] == C.SIZES[doc_id % 4]
