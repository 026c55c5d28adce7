#!/usr/bin/env python
"""Regenerate PLANS.md: physical-plan audit of representative operators.

Captures ``executedPlan`` for the queries whose shapes the plan-regression
tests pin, strips expression ids for stable diffs, truncates each excerpt,
and writes a short scale note per plan.
"""

from __future__ import annotations

import re

NOTES = {
    "extract_text": "Production shape: ONE Python stage fused over the scan "
    "(synthesize+extract in a single Arrow hop); the only exchange is the "
    "up-front salted repartition (test-scale crutch for the single-file "
    "corpus — a multi-TB table scans with natural splits).",
    "q_filter_project": "Filter + projection reach the parquet scan "
    "(PushedFilters / pruned ReadSchema) — at 100 TB only the surviving "
    "column bytes move.",
    "q_join_topk": "Dimension join broadcasts; global top-k plans "
    "TakeOrderedAndProject (per-partition heaps + driver merge, never a "
    "full sort).",
    "q_asof_join": "As-of join as union + running-last window over the "
    "merged stream: ONE shuffle, zero joins — the shape that survives a "
    "10^12-row fact side.",
    "d_minhash_pairs": "Two-phase bucket cap: count-only agg finds small "
    "buckets (fixed 8-byte state), semi-join, THEN collect_list — a flood "
    "bucket never materializes; pair expansion is a narrow in-array "
    "transform, no self-join.",
    "d_winnow": "Narrow kernel path: scan → length filter → mapInPandas; "
    "the per-character-position explode + window shuffle lives only in the "
    "DuckDB oracle.",
    "s_ann_ivf": "Centroid assignment folded into the projection as "
    "literals (narrow map, no join); probe side broadcasts.",
    "s_ann_lsh_multiprobe": "Probe expansion (9 buckets) on the broadcast "
    "QUERY side only; the corpus keeps one bucket per vector — bounded "
    "broadcast join, no corpus explode.",
    "t_repetition": "Whole-stage-codegen projection: all three repetition "
    "signals compute inside array expressions on the row; zero aggregation "
    "state leaves the row.",
    "v_calibrate": "3-row config sweep broadcast against the corpus; "
    "per-doc scores reduce to BIGINT sums in one aggregation; the argmax "
    "window sees 3 rows.",
    "d_winnow_fast": "Same narrow shape as d_winnow (scan → length filter "
    "→ mapInPandas); the vectorized Karp-Rabin gram hash changes only the "
    "kernel's per-doc CPU, never the plan.",
    "extract_text_adversarial": "Identical plan to the flagship — the "
    "irregular-layout synthesis lives inside the same fused Arrow stage, "
    "so robustness costs zero extra exchanges.",
    "extract_journal_template": "One fused Arrow stage over the scan "
    "(template derivation + section dump per doc); explode to section "
    "rows is narrow — no shuffle beyond the input split.",
    "extract_text_crossed": "Same fused single-Python-stage shape as the "
    "flagship: defect injection + irregular synthesis + the §2.9 fix "
    "suite all run inside the one Arrow stage — the robustness gauntlet "
    "costs kernel CPU, never an extra exchange.",
    "m_wav_meta": "Binary payload synthesis + WAV decode in one fused "
    "Arrow stage over the scan; rejected records surface as "
    "decode_ok=false rows in the same narrow pass (no filter-and-rejoin).",
}

MAX_LINES = 16
MAX_COL = 100


def main() -> None:
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as E
    from osdocr_spark.spark.session import get_spark
    spark = get_spark(cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.01"
    qs = E.queries()
    out = [
        "# PLANS — physical-plan audit of representative operators", "",
        "`spark.sql.shuffle.partitions=8`, sf0.01, captured from",
        "`df._jdf.queryExecution().executedPlan()` (the exact plans the",
        "plan-shape regression tests in `tests/test_entry_contract.py` pin;",
        "expression ids stripped, excerpts truncated).",
        "Regenerate with `python scripts/dump_plans.py`.", "",
    ]
    for name, note in NOTES.items():
        plan = qs[name](spark, sf)._jdf.queryExecution().executedPlan().toString()
        plan = re.sub(r"#\d+L?", "#", plan)
        lines = [l.rstrip()[:MAX_COL] for l in plan.splitlines()]
        body = "\n".join(lines[:MAX_LINES])
        if len(lines) > MAX_LINES:
            body += f"\n... ({len(lines) - MAX_LINES} more lines)"
        out.append(f"## {name}\n\n{note}\n\n```\n{body}\n```\n")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")


if __name__ == "__main__":
    main()
