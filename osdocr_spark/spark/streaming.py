"""Structured Streaming wrapper around the extraction pipeline.

The reference is strictly batch (SURVEY.md §2.11 — one document at a time,
``O/pipeline.py:971-1093``); since every kernel here is per-document pure,
a streaming deployment is just ``readStream`` → the same ``mapInPandas``
stage → ``writeStream``:

- **source**: file-arrival stream over a parquet directory of pages (on a
  real cluster: an Iceberg/Kafka stream of WARC records).
- **transform**: :func:`~osdocr_spark.spark.stages.extract_pages` — narrow,
  stateless, Arrow-batched; no watermark needed (no aggregation state).
  Stateful companions: :func:`stream_domain_stats` (watermarked windowed
  aggregation, append mode) and :func:`stream_first_seen`
  (``applyInPandasWithState`` crawl dedup).
- **sink**: parquet append with checkpointing — exactly-once per file via
  the streaming file-source log, which *is* the resume story for the
  streaming deployment (batch resume lives in
  :func:`~osdocr_spark.spark.jobs.run_extract_job`).
- **metrics**: per micro-batch counts via ``foreachBatch`` appended to the
  lineage table.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .stages import PAGES_SCHEMA, extract_pages

__all__ = ["stream_extract", "stream_domain_stats", "stream_first_seen"]


def stream_extract(spark: SparkSession, pages_dir: str, out_dir: str,
                   clean: bool = False, max_files_per_trigger: int = 8):
    """Start (and return) a streaming query extracting newly-arrived page
    files; call ``.processAllAvailable()`` / ``.stop()`` on the handle, or
    run with ``trigger(availableNow=True)`` semantics by letting it drain.
    """
    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(pages_dir)
    )
    extracted = extract_pages(pages, clean=clean)
    metrics_path = os.path.join(out_dir, "stream_metrics")

    def sink(batch_df, batch_id: int):
        batch_df.persist()
        batch_df.write.mode("append").parquet(os.path.join(out_dir, "extracted"))
        (batch_df.groupBy("partition_id")
         .agg(F.count("*").alias("url_count"),
              F.sum("n_words").alias("word_count"))
         .withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(metrics_path))
        batch_df.unpersist()

    return (
        extracted.writeStream
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def stream_domain_stats(spark: SparkSession, pages_dir: str, out_dir: str,
                        window: str = "1 hour", watermark: str = "10 minutes",
                        max_files_per_trigger: int = 8):
    """Watermarked windowed aggregation over the page stream: per
    (event-time window, domain) page counts and html byte volume.

    The late-data story for a crawl feed: ``warc_ts`` is event time, rows
    arriving ≤ ``watermark`` late still land in their window, older state is
    finalized and evicted — bounded state at 10^12-doc scale.  Append mode:
    a window emits exactly once, when the watermark passes it."""
    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(pages_dir)
    )
    agg = (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"),
                 F.regexp_extract("url", r"https://([^/]+)/", 1).alias("domain"))
        .agg(F.count("*").alias("n_pages"),
             F.sum(F.octet_length("html")).alias("html_bytes"))
        .select(F.col("win.start").alias("win_start"), "domain",
                "n_pages", "html_bytes")
    )
    return (
        agg.writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "domain_stats"))
        .option("checkpointLocation", os.path.join(out_dir, "_stats_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def stream_first_seen(spark: SparkSession, pages_dir: str, out_dir: str,
                      max_files_per_trigger: int = 8):
    """Custom stateful operator via ``applyInPandasWithState``: streaming
    first-seen url dedup per domain (the online form of ``d_exact`` — a
    crawl feed re-delivers urls; only the first sighting passes).

    State per domain = the set of url hashes seen so far; at scale the state
    store shards by the group key, so a domain's set never leaves its
    executor.  No event-time eviction here (NoTimeout): crawl dedup state is
    permanent by design; a TTL would use GroupStateTimeout.EventTimeTimeout.
    """
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(pages_dir)
        .withColumn("domain", F.regexp_extract("url", r"https://([^/]+)/", 1))
        .select("domain", "url")
    )

    out_schema = T.StructType([
        T.StructField("domain", T.StringType()),
        T.StructField("url", T.StringType()),
    ])
    state_schema = T.StructType([
        T.StructField("seen", T.ArrayType(T.StringType())),
    ])

    def dedup(key, pdfs, state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        fresh = []
        for pdf in pdfs:
            for url in pdf["url"]:
                if url not in seen:
                    seen.add(url)
                    fresh.append(url)
        state.update((sorted(seen),))
        yield pd.DataFrame({"domain": [key[0]] * len(fresh), "url": fresh})

    firsts = pages.groupBy("domain").applyInPandasWithState(
        dedup, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout)
    return (
        firsts.writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "first_seen"))
        .option("checkpointLocation", os.path.join(out_dir, "_dedup_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
