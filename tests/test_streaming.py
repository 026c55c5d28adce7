"""Streaming wrapper: file-arrival source → extraction → parquet sink with
exactly-once checkpointing (availableNow drain)."""

import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from osdocr_spark.spark.session import get_spark
    s = get_spark(cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_stream_extract_end_to_end(spark, tmp_path):
    from osdocr_spark.spark.jobs import load_pages
    from osdocr_spark.spark.streaming import stream_extract

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    load_pages(spark, SF, num_partitions=4).write.parquet(pages_dir)

    q = stream_extract(spark, pages_dir, out_dir)
    q.awaitTermination(300)

    got = spark.read.parquet(os.path.join(out_dir, "extracted"))
    assert got.count() == 500
    # byte parity holds through the streaming path too
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    sample = {r["url"]: r["text"] for r in got.limit(50).collect()}
    texts = {str(r["doc_id"]): r["text"] for r in docs.collect()}
    for url, text in sample.items():
        doc_id = url.rsplit("/", 1)[1]
        assert text == re.sub(r"\s+", " ", texts[doc_id]).strip()
    # restart with same checkpoint: nothing reprocessed
    q2 = stream_extract(spark, pages_dir, out_dir)
    q2.awaitTermination(300)
    assert spark.read.parquet(os.path.join(out_dir, "extracted")).count() == 500
    m = spark.read.parquet(os.path.join(out_dir, "stream_metrics"))
    assert m.groupBy().sum("url_count").collect()[0][0] == 500
