"""bench.py harness logic (VERDICT r4 items 1+7) — pure-Python, no Spark.

r4's official bench record went unparseable (the stdout JSON line outgrew
the driver's tail capture) AND its numbers came from a contaminated
measurement window that silently overwrote the clean table.  These tests
pin the three defenses: a bounded driver-facing line with a sidecar
pointer, a self-classifying window-quality gate on never-touched sentinel
queries, and window-labeled BASELINE.md sections that never clobber each
other.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402


def _vs_prev(deltas):
    return {"source": "BENCH_r03.json", "canary_prev": 6.0, "canary_cur": 6.0,
            "delta_raw_pct": dict(deltas), "delta_normalized_pct": dict(deltas)}


def test_window_clean_when_sentinels_steady():
    timings = {"extract_text": 1.5, "q_agg_pricing": 1.0,
               "q_join_topk": 1.2, "q_asof_join": 0.9}
    medians = {k: v * 1.1 for k, v in timings.items()}
    vs = _vs_prev({"q_agg_pricing": 2.0, "q_join_topk": -3.0,
                   "q_asof_join": 1.0, "extract_text": -15.0})
    assert B._window_flags(timings, medians, vs) == []


def test_window_degraded_on_sentinel_drift():
    """The r4 driver-window signature: untouched-code sentinels move >10%
    normalized (flagship movement alone must NOT trip it — that can be a
    real code change)."""
    timings = {"extract_text": 2.4, "q_agg_pricing": 1.3,
               "q_join_topk": 1.6, "q_asof_join": 1.2}
    medians = {k: v * 1.1 for k, v in timings.items()}
    vs = _vs_prev({"q_agg_pricing": 10.4, "q_join_topk": 16.0,
                   "q_asof_join": 12.0, "extract_text": 39.2})
    assert "sentinel_drift" in B._window_flags(timings, medians, vs)
    # a lone outlier sentinel (median of deltas <= 10) stays clean
    vs2 = _vs_prev({"q_agg_pricing": 2.0, "q_join_topk": 25.0,
                    "q_asof_join": -1.0})
    assert B._window_flags(timings, medians, vs2) == []


def test_window_baseline_drift_is_informational_not_degraded():
    """Sentinels running FASTER than the prior record cannot be this
    window's contamination (contention only inflates times) — it flags the
    PRIOR baseline as slow-biased, and the window stays clean (no rerun)."""
    timings = {"extract_text": 1.3, "q_agg_pricing": 0.34,
               "q_join_topk": 1.23, "q_asof_join": 0.24}
    medians = {k: v * 1.08 for k, v in timings.items()}
    vs = _vs_prev({"q_agg_pricing": -20.9, "q_join_topk": -7.2,
                   "q_asof_join": -19.4, "extract_text": -21.4})
    flags = B._window_flags(timings, medians, vs)
    assert flags == ["baseline_drift"]
    # the classification rule: baseline_drift alone does not degrade
    assert not set(flags) - {"baseline_drift"}


def test_window_degraded_on_median_min_blowout():
    """r4's second signature: every median ~2x its min.  Works with no
    prior-round record at all (first round / cross-SF)."""
    timings = {"a": 1.0, "b": 2.0, "c": 1.5}
    medians = {"a": 2.0, "b": 4.1, "c": 2.9}
    assert B._window_flags(timings, medians, None) == ["median_min_blowout"]
    # sub-0.2s queries are excluded from the ratio (dispatch noise)
    t2 = {"tiny": 0.05, "a": 1.0}
    m2 = {"tiny": 0.19, "a": 1.1}
    assert B._window_flags(t2, m2, None) == []


def test_prev_round_bench_skips_unparseable_records():
    """r4's BENCH_r04.json has parsed=null; normalization must fall back to
    the newest record that actually carries queries+canary."""
    got = B._prev_round_bench()
    assert got is not None
    src, rec = got
    assert rec.get("queries") and rec.get("cpu_canary_per_proc")
    # the repo's r4 record is the known-unparseable one
    r04 = os.path.join(os.path.dirname(os.path.abspath(B.__file__)),
                       "BENCH_r04.json")
    if os.path.exists(r04):
        with open(r04) as f:
            j = json.load(f)
        if not (j.get("queries") or isinstance(j.get("parsed"), dict)):
            assert src != "BENCH_r04.json"


def test_compact_record_bounded_and_sidecar_pointer():
    out = {
        "metric": "headline_suite_wall", "value": 30.0, "unit": "sec",
        "queries": {f"q{i:02d}": 1.234 for i in range(20)},
        "queries_median": {f"q{i:02d}": 1.5 for i in range(20)},
        "window": "clean", "window_flags": [],
        "cpu_canary_per_proc": 6.3,
        "vs_prev_round": {"delta_normalized_pct": {"x": 1.0}},
        "discarded_attempts": [{"value": 99.0}],
        "methodology": "m" * 500, "notes": {"n": "x" * 500},
        "sf": 0.1, "cpus": 32, "docs": 5000, "extract_docs_per_sec": 3000.0,
        "window_attempts": 1,
    }
    compact = B._compact_record(out, "BENCH/bench_r05_detail.json")
    line = json.dumps(compact)
    assert len(line) <= B._STDOUT_BUDGET
    assert compact["detail"] == "BENCH/bench_r05_detail.json"
    # driver contract intact; bulk keys shed to the sidecar
    for k in ("metric", "value", "unit", "queries", "sf", "window"):
        assert k in compact
    for k in B._DETAIL_KEYS:
        assert k not in compact


def test_normalized_table_sections_never_clobber(tmp_path):
    """A degraded-window run appends its OWN labeled section; the clean
    table survives (r4: last-writer-wins overwrote the clean record)."""
    path = str(tmp_path / "BASELINE.md")
    with open(path, "w") as f:
        f.write("# scaling header\n\nscaling table here\n")
    t_clean = {"extract_text": 1.4}
    t_bad = {"extract_text": 2.4}
    vs = _vs_prev({"extract_text": -15.0})
    B._write_normalized_table(vs, t_clean, "clean", path=path)
    B._write_normalized_table(_vs_prev({"extract_text": 39.0}), t_bad,
                              "degraded", path=path)
    body = open(path).read()
    assert "# scaling header" in body
    assert "— clean window" in body and "— degraded window" in body
    assert "| extract_text | 1.4 |" in body      # clean row survives
    assert "| extract_text | 2.4 |" in body      # degraded row labeled
    # a fresh clean run replaces only the clean section
    B._write_normalized_table(_vs_prev({"extract_text": -20.0}),
                              {"extract_text": 1.3}, "clean", path=path)
    body = open(path).read()
    assert "| extract_text | 1.3 |" in body
    assert "| extract_text | 1.4 |" not in body
    assert "| extract_text | 2.4 |" in body
    assert body.count("— degraded window") == 1


def test_cross_sf_deltas_refused():
    """A sf0.001 smoke run must not 'drift' against the prior round's sf0.1
    record — cross-SF deltas are refused outright."""
    vs = B._normalized_deltas({"extract_text": 0.2}, 6.0, sf=0.001)
    if vs is not None:  # repo carries prior records
        assert "delta_normalized_pct" not in vs
        assert "note" in vs
