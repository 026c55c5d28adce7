"""Structured Streaming wrapper around the extraction pipeline.

The reference is strictly batch (SURVEY.md §2.11 — one document at a time,
``O/pipeline.py:971-1093``); since every kernel here is per-document pure,
a streaming deployment is just ``readStream`` → the same ``mapInPandas``
stage → ``writeStream``:

- **source**: file-arrival stream over a parquet directory of pages (on a
  real cluster: an Iceberg/Kafka stream of WARC records).
- **transform**: :func:`~osdocr_spark.spark.stages.extract_pages` — narrow,
  stateless, Arrow-batched; no watermark needed (no aggregation state).
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

__all__ = ["stream_extract"]


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
