"""Mirror of the driver's correctness gate: run every ``queries()`` entry on
Spark and its ``oracle_sql()`` SQL on DuckDB over the same parquet tables;
compare row count, column names, and an order-insensitive value canon."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # full double precision: the decimal-exact + ROUND(…,4) discipline in
        # the oracles makes Spark and DuckDB bit-identical, so compare strictly
        return f"{v:.17g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def canon(df: pd.DataFrame) -> tuple[int, list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = sorted(
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    )
    return len(df), cols, rows


def compare(spark_df, oracle_pdf: pd.DataFrame) -> dict:
    got = spark_df.toPandas()
    n1, c1, r1 = canon(got)
    n2, c2, r2 = canon(oracle_pdf)
    out = {"rows": n1, "oracle_rows": n2, "cols_match": c1 == c2,
           "count_match": n1 == n2, "values_match": r1 == r2}
    if not out["cols_match"]:
        out["cols"] = (c1, c2)
    if out["count_match"] and out["cols_match"] and not out["values_match"]:
        diff = [(a, b) for a, b in zip(r1, r2) if a != b][:3]
        out["first_diffs"] = diff
    return out
