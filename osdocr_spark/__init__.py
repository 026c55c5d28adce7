"""osdocr_spark — a from-scratch PySpark-native layout-analysis / main-content
extraction engine with the query + data-processing capabilities of the
reference thesis toolkit *brazafonso/OCR-old_documents* (read-only checkout at
``/root/reference``; cited below as ``O/`` = ``OSDOCR/OSDOCR/``).

Architecture (Spark-first, NOT a port):

- The relational surface (scans, filters, joins, aggregations, windows,
  dedup / similarity-search / text-analysis operators) is expressed with the
  PySpark DataFrame API so Catalyst handles pushdown, pruning, join strategy
  and AQE.  See :mod:`osdocr_spark.ops`.
- The reference's per-document layout algorithms (block geometry, histogram
  peak analysis, block classification, reading-order graph, article
  extraction, text emission — ``O/ocr_tree_module/*``,
  ``O/aux_utils/box.py``, ``O/output_module/*``) are re-implemented as
  vectorized numpy kernels that run one *batch* of documents per Python
  invocation inside Arrow-fed ``mapInPandas`` stages (never per-row Python).
  See :mod:`osdocr_spark.kernels`.
- Scale design: salted repartitioning for domain-key skew, per-partition
  lineage counters, checkpoint/resume on the output table, and near-linear
  scaling (the job is embarrassingly parallel per url after one shuffle).
  See :mod:`osdocr_spark.spark`.
"""

__version__ = "0.1.0"
