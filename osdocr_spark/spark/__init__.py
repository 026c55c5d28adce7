"""Spark-side glue: session builder, Arrow-batched stages, scale-out jobs."""
