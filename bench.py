#!/usr/bin/env python
"""Benchmark harness.

Default mode (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``--scaling`` mode (north-rule evidence): run the identical extraction job at
two parallelism levels (local[8] vs local[32] — the sandbox stand-in for N
vs 4N executors), report docs/sec at both plus scaling efficiency, and write
``BENCH/BASELINE.md``.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "extract_text",
    "q_agg_pricing",
    "q_join_topk",
    "q_window_lag",
    "d_minhash_pairs",
    "d_simhash",
    "s_ann_bruteforce",
    "t_quality",
]


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _fresh_spark(cpus: int):
    from osdocr_spark.spark.session import get_spark, stop_spark
    stop_spark()
    s = get_spark(app=f"bench-{cpus}", cpus=cpus, shuffle_partitions=max(cpus, 8))
    s.sparkContext.setLogLevel("ERROR")
    return s


def _run_extraction(spark, sf_dir: str) -> tuple[float, int]:
    """Wall time + doc count of the full extraction stage (cache-free)."""
    from osdocr_spark.spark.jobs import load_pages
    from osdocr_spark.spark.stages import extract_pages
    t0 = time.time()
    n = extract_pages(load_pages(spark, sf_dir)).count()
    return time.time() - t0, n


def bench(sf_dir: str = SF_DIR, cpus: int = CPUS) -> dict:
    import __spark_entry__ as E
    spark = _fresh_spark(cpus)
    qs = E.queries()
    timings: dict[str, float] = {}
    n_docs = 0
    for name in HEADLINE:
        t0 = time.time()
        if name == "extract_text":
            n_docs = qs[name](spark, sf_dir).count()
        else:
            qs[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(sf_dir),
        "cpus": cpus,
        "docs": n_docs,
        "extract_docs_per_sec": round(n_docs / timings["extract_text"], 1)
        if timings.get("extract_text") else None,
    }
    return out


def scaling(sf_dir: str = SF_DIR) -> dict:
    """local[8] vs local[32] on the same input → scaling efficiency."""
    results = {}
    for cpus in (8, 32):
        spark = _fresh_spark(cpus)
        # warm the JVM + python workers once, then measure
        _run_extraction(spark, "/root/testdata/sf0.001")
        wall, n = _run_extraction(spark, sf_dir)
        results[cpus] = {"wall_s": round(wall, 2), "docs": n,
                         "docs_per_sec": round(n / wall, 1)}
    eff = results[32]["docs_per_sec"] / (4 * results[8]["docs_per_sec"])
    out = {"sf": _sf_of(sf_dir), "n_cores": results,
           "scaling_efficiency_8_to_32": round(eff, 3)}
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH baseline — extraction scaling (sandbox evidence for the north rule)

The north rule's two-cluster-size criterion (throughput scaling efficiency
≥0.8 from N to 4N executors) cannot use a real cluster here; per the driver
instruction it is evidenced by the identical job at two parallelism levels
on the same input.

| config | docs | wall (s) | docs/sec |
| --- | --- | --- | --- |
| local[8]  | {results[8]['docs']} | {results[8]['wall_s']} | {results[8]['docs_per_sec']} |
| local[32] | {results[32]['docs']} | {results[32]['wall_s']} | {results[32]['docs_per_sec']} |

**Scaling efficiency 8→32 cores (N→4N): {round(eff, 3)}** (target ≥ 0.8).

Input: pages synthesized from `{sf_dir}/documents.parquet` (deterministic
layout generator), full extraction pipeline (parse → analyze → categorize →
boilerplate strip → reading order → articles → emit).  Job shape is
embarrassingly parallel per url after one salted repartition; determinism
across parallelism levels is pinned by
`tests/test_entry_contract.py::test_parallelism_invariance`.

The reference publishes no benchmark numbers (SURVEY.md §6); the operative
baseline is this table plus BENCH_r{{N}}.json per round.
""")
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(scaling()))
    else:
        print(json.dumps(bench()))
