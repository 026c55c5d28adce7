"""Similarity search over the ``embeddings`` table (``array<float>``, 64-d).

- :func:`s_ann_bruteforce` — exact cosine top-k for a query sample: the
  correctness baseline.  Broadcast the (small) query side; the candidate
  scan stays a single pass.
- :func:`s_lsh_buckets` / :func:`s_ann_lsh` — sign-bit LSH bucketing (the
  scale path: at 10^12 rows the bucket join touches ~1/2^8 of the candidate
  pairs; brute force is a full cross product).

Numeric discipline: elements are cast float→double *before* any arithmetic
on both engines (exact widening), dot products and norms are double sums,
and scores are rounded to 4dp with vec_id tie-breaks — so Spark/DuckDB
summation-order differences (≈1e-15) cannot flip a rank.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["QUERIES", "ORACLES"]

DIM = 64
TOPK = 5
N_PLANES = 8  # sign bits → 256 buckets


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return e.repartition(spark.sparkContext.defaultParallelism, "vec_id")


_DOT = """
aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
          CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
"""
_NORM = """
aggregate(transform({col}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
          CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
"""


def _with_cos(joined: DataFrame) -> DataFrame:
    """cos = dot(a,b) / (sqrt(|a|)·sqrt(|b|)), rounded 4dp."""
    return joined.withColumn(
        "cos",
        F.round(
            F.expr(_DOT)
            / (F.sqrt(F.expr(_NORM.format(col="a"))) * F.sqrt(F.expr(_NORM.format(col="b")))),
            4,
        ),
    )


def s_ann_bruteforce(spark, sf_dir):
    """Exact top-5 cosine neighbors for the vec_id%50==0 query sample
    (queries broadcast; full scan over candidates)."""
    e = _emb(spark, sf_dir)
    q = e.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("a"))
    c = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("b"))
    j = c.join(F.broadcast(q), F.col("q_id") != F.col("c_id"))
    scored = _with_cos(j)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= TOPK)
            .select("q_id", "c_id", "cos", "rn"))


_O_BRUTE = f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS a FROM embeddings WHERE vec_id % 50 = 0),
c AS (SELECT vec_id AS c_id, embedding AS b FROM embeddings),
norms AS (
  SELECT vec_id, SUM(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)) AS nrm
  FROM embeddings, range(1, {DIM + 1}) r(i) GROUP BY vec_id),
dots AS (
  SELECT q_id, c_id, SUM(CAST(a[i] AS DOUBLE) * CAST(b[i] AS DOUBLE)) AS dot
  FROM q JOIN c ON q_id <> c_id, range(1, {DIM + 1}) r(i)
  GROUP BY q_id, c_id),
scored AS (
  SELECT q_id, c_id, ROUND(dot / (SQRT(nq.nrm) * SQRT(nc.nrm)), 4) AS cos
  FROM dots JOIN norms nq ON q_id = nq.vec_id JOIN norms nc ON c_id = nc.vec_id)
SELECT q_id, c_id, cos, rn FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS INT) AS rn
  FROM scored)
WHERE rn <= {TOPK}
"""


def _bucket_expr(col: str, engine: str = "duckdb") -> str:
    """Sign-bit LSH bucket id from the first N_PLANES dimensions.

    NB: Spark's ``a[i]`` subscript is 0-based while DuckDB's is 1-based —
    Spark uses ``element_at`` (1-based in both semantics)."""
    if engine == "spark":
        elem = "element_at({col}, {i})"
    else:
        elem = "{col}[{i}]"
    bits = " + ".join(
        "(CASE WHEN CAST(" + elem.format(col=col, i=j + 1)
        + f" AS DOUBLE) > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(N_PLANES)
    )
    return f"({bits})"


def s_lsh_buckets(spark, sf_dir):
    """Bucket histogram: how the sign-bit LSH partitions the corpus."""
    e = _emb(spark, sf_dir)
    return (e.withColumn("bucket", F.expr(_bucket_expr("embedding", "spark")))
            .groupBy("bucket").agg(F.count("*").alias("n_vectors")))


_O_LSH_BUCKETS = f"""
SELECT {_bucket_expr("embedding")} AS bucket, COUNT(*) AS n_vectors
FROM embeddings GROUP BY 1
"""


def s_ann_lsh(spark, sf_dir):
    """LSH-restricted ANN: top-3 cosine neighbors *within the same sign-bit
    bucket* for the vec_id%50==0 queries — the scale path (candidate set
    shrinks ~2^{N_PLANES}×; recall traded for a bounded join)."""
    e = _emb(spark, sf_dir).withColumn("bucket", F.expr(_bucket_expr("embedding", "spark")))
    q = e.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("a"), "bucket")
    c = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("b"), "bucket")
    j = c.join(F.broadcast(q), ["bucket"]).where(F.col("q_id") != F.col("c_id"))
    scored = _with_cos(j)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 3)
            .select("q_id", "c_id", "cos", "rn"))


_O_ANN_LSH = f"""
WITH e AS (SELECT vec_id, embedding, {_bucket_expr("embedding")} AS bucket FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS a, bucket FROM e WHERE vec_id % 50 = 0),
c AS (SELECT vec_id AS c_id, embedding AS b, bucket FROM e),
norms AS (
  SELECT vec_id, SUM(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)) AS nrm
  FROM embeddings, range(1, {DIM + 1}) r(i) GROUP BY vec_id),
dots AS (
  SELECT q_id, c_id, SUM(CAST(a[i] AS DOUBLE) * CAST(b[i] AS DOUBLE)) AS dot
  FROM q JOIN c USING (bucket), range(1, {DIM + 1}) r(i)
  WHERE q_id <> c_id
  GROUP BY q_id, c_id),
scored AS (
  SELECT q_id, c_id, ROUND(dot / (SQRT(nq.nrm) * SQRT(nc.nrm)), 4) AS cos
  FROM dots JOIN norms nq ON q_id = nq.vec_id JOIN norms nc ON c_id = nc.vec_id)
SELECT q_id, c_id, cos, rn FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS INT) AS rn
  FROM scored)
WHERE rn <= 3
"""


def s_ann_lsh_multiprobe(spark, sf_dir):
    """Multi-probe LSH ANN (Lv et al., VLDB'07): each query probes its own
    sign-bit bucket PLUS every Hamming-1 neighbor bucket (one sign flipped —
    the perturbations most likely to hold near neighbors that fell on the
    other side of one hyperplane).  Candidates grow to ~(1+{N_PLANES})/2^{N_PLANES}
    of the corpus — the standard recall/latency knob between ``s_ann_lsh``
    (1 probe) and brute force, with ONE table instead of L independent ones.

    Plan shape: the probe expansion happens on the tiny broadcast query side
    (9 rows per query); the corpus side keeps exactly one bucket per vector,
    so a (query, candidate) pair matches in at most one probe — no dedup
    pass, no corpus-side explode, same bounded broadcast join as 1-probe."""
    e = _emb(spark, sf_dir).withColumn(
        "bucket", F.expr(_bucket_expr("embedding", "spark")))
    probes = "array(bucket, " + ", ".join(
        f"bucket ^ {1 << j}" for j in range(N_PLANES)) + ")"
    q = (e.where(F.col("vec_id") % 50 == 0)
         .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("a"),
                 F.explode(F.expr(probes)).alias("bucket")))
    c = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("b"), "bucket")
    j = c.join(F.broadcast(q), ["bucket"]).where(F.col("q_id") != F.col("c_id"))
    scored = _with_cos(j)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 3)
            .select("q_id", "c_id", "cos", "rn"))


_O_ANN_LSH_MP = f"""
WITH e AS (SELECT vec_id, embedding, {_bucket_expr("embedding")} AS bucket FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS a,
             CASE WHEN p = 0 THEN bucket
                  ELSE xor(bucket, CAST(POWER(2, p - 1) AS INT)) END AS bucket
      FROM e, range(0, {N_PLANES + 1}) r(p) WHERE vec_id % 50 = 0),
c AS (SELECT vec_id AS c_id, embedding AS b, bucket FROM e),
norms AS (
  SELECT vec_id, SUM(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)) AS nrm
  FROM embeddings, range(1, {DIM + 1}) r(i) GROUP BY vec_id),
dots AS (
  SELECT q_id, c_id, SUM(CAST(a[i] AS DOUBLE) * CAST(b[i] AS DOUBLE)) AS dot
  FROM q JOIN c USING (bucket), range(1, {DIM + 1}) r(i)
  WHERE q_id <> c_id
  GROUP BY q_id, c_id),
scored AS (
  SELECT q_id, c_id, ROUND(dot / (SQRT(nq.nrm) * SQRT(nc.nrm)), 4) AS cos
  FROM dots JOIN norms nq ON q_id = nq.vec_id JOIN norms nc ON c_id = nc.vec_id)
SELECT q_id, c_id, cos, rn FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS INT) AS rn
  FROM scored)
WHERE rn <= 3
"""


K_IVF = 16          # coarse-quantizer lists
CENT_STRIDE = 31    # centroid c = embedding of vec_id 31·c (exists at every SF)
NPROBE = 2
IVF_TOPK = 3


def _ivf_centroids(spark, sf_dir) -> dict[int, list[float]]:
    """Deterministic IVF "training": centroid ``c`` is the embedding of
    vec_id ``31·c``.  A real deployment would k-means a driver-side sample —
    the collect-tiny-then-broadcast shape is identical; 16×64 doubles."""
    rows = (_emb(spark, sf_dir)
            .where((F.col("vec_id") % CENT_STRIDE == 0)
                   & (F.col("vec_id") < CENT_STRIDE * K_IVF))
            .select("vec_id", "embedding").collect())
    return {int(r["vec_id"]) // CENT_STRIDE: [float(x) for x in r["embedding"]]
            for r in rows}


def _centroid_scores(cents: dict[int, list[float]]):
    """Per-centroid cosine columns against ``embedding`` — literal centroid
    arrays folded into the projection, so assignment is a NARROW map (no
    shuffle, no join): the pattern that matters at 10^12 rows."""
    import math
    norm_v = F.sqrt(F.expr(_NORM.format(col="embedding")))
    structs = []
    for c in sorted(cents):
        vec = cents[c]
        arr = "array(" + ",".join(f"CAST({x!r} AS DOUBLE)" for x in vec) + ")"
        dot = (f"aggregate(zip_with(embedding, {arr},"
               " (x, y) -> CAST(x AS DOUBLE) * y),"
               " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
        ncent = math.sqrt(sum(x * x for x in vec))
        cos = F.round(F.expr(dot) / (norm_v * F.lit(ncent)), 4)
        # max of struct(cos, -c) ⇒ highest cos, ties → smallest centroid id
        structs.append(F.struct(cos.alias("cos"), F.lit(-c).alias("negc")))
    return F.array(*structs)


def s_ann_ivf(spark, sf_dir):
    """IVF ANN (the second scale path beside LSH): assign every vector to
    its nearest of 16 deterministic coarse centroids (narrow map over
    broadcast-literal centroids), probe the query's top-2 lists, exact
    top-3 cosine within the probed lists.  At 10^12 rows the candidate scan
    is ~NPROBE/K of the corpus and the probe join is a broadcast."""
    e = _emb(spark, sf_dir)
    scores = _centroid_scores(_ivf_centroids(spark, sf_dir))
    ranked = F.reverse(F.array_sort(scores))
    assigned = e.withColumn("cent", (-F.element_at(ranked, 1)["negc"]).cast("int"))
    cand = assigned.select(F.col("vec_id").alias("c_id"),
                           F.col("embedding").alias("b"), "cent")
    probes = (assigned.where(F.col("vec_id") % 50 == 0)
              .select(F.col("vec_id").alias("q_id"),
                      F.col("embedding").alias("a"),
                      F.explode(F.slice(ranked, 1, NPROBE)).alias("p"))
              .select("q_id", "a", (-F.col("p")["negc"]).cast("int").alias("cent")))
    j = cand.join(F.broadcast(probes), "cent").where(F.col("q_id") != F.col("c_id"))
    scored = _with_cos(j)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= IVF_TOPK)
            .select("q_id", "c_id", "cos", "rn"))


_O_ANN_IVF = f"""
WITH cents AS (
  SELECT CAST(vec_id // {CENT_STRIDE} AS INT) AS cent, embedding AS ce
  FROM embeddings
  WHERE vec_id % {CENT_STRIDE} = 0 AND vec_id < {CENT_STRIDE * K_IVF}),
norms AS (
  SELECT vec_id, SUM(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)) AS nrm
  FROM embeddings, range(1, {DIM + 1}) r(i) GROUP BY vec_id),
cnorms AS (
  SELECT cent, SUM(CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) AS cnrm
  FROM cents, range(1, {DIM + 1}) r(i) GROUP BY cent),
vc AS (
  SELECT e.vec_id, c.cent,
         SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(c.ce[i] AS DOUBLE)) AS dot
  FROM embeddings e, cents c, range(1, {DIM + 1}) r(i)
  GROUP BY e.vec_id, c.cent),
scoredc AS (
  SELECT vec_id, cent, ROUND(dot / (SQRT(n.nrm) * SQRT(cn.cnrm)), 4) AS ccos
  FROM vc JOIN norms n USING (vec_id) JOIN cnorms cn USING (cent)),
assign AS (
  SELECT vec_id, cent FROM (
    SELECT vec_id, cent,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent ASC) AS rn
    FROM scoredc) WHERE rn = 1),
probes AS (
  SELECT vec_id AS q_id, cent FROM (
    SELECT vec_id, cent,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent ASC) AS rn
    FROM scoredc WHERE vec_id % 50 = 0) WHERE rn <= {NPROBE}),
cand AS (
  SELECT a.vec_id AS c_id, e.embedding AS b, a.cent
  FROM assign a JOIN embeddings e ON a.vec_id = e.vec_id),
qv AS (
  SELECT q_id, cent, e.embedding AS a
  FROM probes JOIN embeddings e ON q_id = e.vec_id),
dots AS (
  SELECT q_id, c_id, SUM(CAST(a[i] AS DOUBLE) * CAST(b[i] AS DOUBLE)) AS dot
  FROM qv JOIN cand USING (cent), range(1, {DIM + 1}) r(i)
  WHERE q_id <> c_id
  GROUP BY q_id, c_id),
scored AS (
  SELECT q_id, c_id, ROUND(dot / (SQRT(nq.nrm) * SQRT(nc.nrm)), 4) AS cos
  FROM dots JOIN norms nq ON q_id = nq.vec_id JOIN norms nc ON c_id = nc.vec_id)
SELECT q_id, c_id, cos, rn FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS INT) AS rn
  FROM scored)
WHERE rn <= {IVF_TOPK}
"""


M_PQ = 8            # subspaces (64-d → 8 × 8-d)
DSUB = DIM // M_PQ
K_PQ = 16           # centroids per subspace
PQ_STRIDE = 13      # codebook row c = embedding of vec_id 13·c (exists at every SF)
PQ_TOPK = 3


def _pq_codebook(spark, sf_dir) -> list[list[list[float]]]:
    """Deterministic PQ "training": codebook row ``c`` is the embedding of
    vec_id ``13·c``, split into 8 contiguous 8-d sub-centroids.  A real
    deployment k-means a driver-side sample per subspace — the
    collect-tiny-then-literal-fold shape is identical; 16×64 doubles."""
    rows = (spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
            .where((F.col("vec_id") % PQ_STRIDE == 0)
                   & (F.col("vec_id") < PQ_STRIDE * K_PQ))
            .select("vec_id", "embedding").collect())
    full = {int(r["vec_id"]) // PQ_STRIDE: [float(x) for x in r["embedding"]]
            for r in rows}
    return [[full[c][m * DSUB:(m + 1) * DSUB] for c in sorted(full)]
            for m in range(M_PQ)]


def _arr_sql(vec: list[float]) -> str:
    return "array(" + ",".join(f"CAST({x!r} AS DOUBLE)" for x in vec) + ")"


def _pq_recon_col(cb):
    """Column: the PQ reconstruction of ``embedding`` — per-subspace code =
    lexicographic min of (rounded sq-distance, c) over the literal
    sub-centroids (a narrow map), reconstruction = concat of the chosen
    sub-centroids."""
    recon_parts = []
    for m in range(M_PQ):
        structs = []
        for c in range(K_PQ):
            d2 = (f"aggregate(zip_with(slice(embedding, {m * DSUB + 1}, {DSUB}),"
                  f" {_arr_sql(cb[m][c])},"
                  " (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),"
                  " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
            structs.append(F.struct(F.round(F.expr(d2), 4).alias("d"),
                                    F.lit(c).alias("c")))
        code = F.array_min(F.array(*structs))["c"]
        cents_m = "array(" + ",".join(_arr_sql(cb[m][c]) for c in range(K_PQ)) + ")"
        recon_parts.append(F.element_at(F.expr(cents_m), code + 1))
    return F.flatten(F.array(*recon_parts))


def s_ann_pq(spark, sf_dir):
    """Product-quantized ANN (Jégou et al., TPAMI'11 shape): every vector is
    encoded as 8 sub-codes (nearest of 16 literal sub-centroids per 8-d
    subspace — a NARROW map, no shuffle/join, the pattern that matters at
    10^12 rows), queries scan candidates against the *reconstructed*
    vectors (ADC): cos(q, concat(codebook[m][code_m])) — the index is 8
    bytes/vector instead of 256.  Exact top-3 within the approximation;
    sub-distances rounded 4dp before the argmin with smallest-centroid
    tie-break so both engines pick identical codes."""
    cb = _pq_codebook(spark, sf_dir)
    e = _emb(spark, sf_dir)
    coded = e.select("vec_id", "embedding", _pq_recon_col(cb).alias("recon"))
    q = (coded.where(F.col("vec_id") % 50 == 0)
         .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("a")))
    c_ = coded.select(F.col("vec_id").alias("c_id"), F.col("recon").alias("b"))
    j = c_.join(F.broadcast(q), F.col("q_id") != F.col("c_id"))
    scored = _with_cos(j)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= PQ_TOPK)
            .select("q_id", "c_id", "cos", "rn"))


_O_ANN_PQ = f"""
WITH cb AS (
  SELECT CAST(vec_id // {PQ_STRIDE} AS INT) AS c, embedding AS ce
  FROM embeddings
  WHERE vec_id % {PQ_STRIDE} = 0 AND vec_id < {PQ_STRIDE * K_PQ}),
subdist AS (
  SELECT e.vec_id, m.m, cb.c,
         ROUND(SUM((CAST(e.embedding[m.m * {DSUB} + i] AS DOUBLE)
                    - CAST(cb.ce[m.m * {DSUB} + i] AS DOUBLE))
                   * (CAST(e.embedding[m.m * {DSUB} + i] AS DOUBLE)
                      - CAST(cb.ce[m.m * {DSUB} + i] AS DOUBLE))), 4) AS d
  FROM embeddings e, range(0, {M_PQ}) m(m), cb, range(1, {DSUB + 1}) r(i)
  GROUP BY e.vec_id, m.m, cb.c),
codes AS (
  SELECT vec_id, m, c FROM (
    SELECT vec_id, m, c,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d ASC, c ASC) AS rn
    FROM subdist) WHERE rn = 1),
recon AS (
  SELECT k.vec_id, k.m, i AS sub_i,
         CAST(cb.ce[k.m * {DSUB} + i] AS DOUBLE) AS rv
  FROM codes k JOIN cb USING (c), range(1, {DSUB + 1}) r(i)),
rnorm AS (
  SELECT vec_id, SUM(rv * rv) AS nrm FROM recon GROUP BY vec_id),
qnorm AS (
  SELECT vec_id, SUM(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)) AS nrm
  FROM embeddings, range(1, {DIM + 1}) r(i)
  WHERE vec_id % 50 = 0 GROUP BY vec_id),
dots AS (
  SELECT q.vec_id AS q_id, rec.vec_id AS c_id,
         SUM(CAST(q.embedding[rec.m * {DSUB} + rec.sub_i] AS DOUBLE) * rec.rv) AS dot
  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 = 0) q
  JOIN recon rec ON rec.vec_id <> q.vec_id
  GROUP BY 1, 2),
scored AS (
  SELECT q_id, c_id, ROUND(dot / (SQRT(qn.nrm) * SQRT(rn.nrm)), 4) AS cos
  FROM dots JOIN qnorm qn ON q_id = qn.vec_id JOIN rnorm rn ON c_id = rn.vec_id)
SELECT q_id, c_id, cos, rn FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS INT) AS rn
  FROM scored)
WHERE rn <= {PQ_TOPK}
"""


def s_ann_ivfpq(spark, sf_dir):
    """IVF-PQ composed ANN — the production index shape (FAISS IVFPQ):
    coarse quantizer restricts the scan to the query's top-2 of 16 IVF
    lists (narrow literal-centroid assignment, broadcast probe), PQ codes
    stand in for the vectors inside each list (ADC against 8-byte
    reconstructions).  Both stages are the already-oracled building blocks
    (``s_ann_ivf``, ``s_ann_pq``); the compose touches ~NPROBE/K of the
    corpus and never moves a raw candidate vector."""
    e = _emb(spark, sf_dir)
    scores = _centroid_scores(_ivf_centroids(spark, sf_dir))
    ranked = F.reverse(F.array_sort(scores))
    cb = _pq_codebook(spark, sf_dir)
    coded = e.select(
        "vec_id", "embedding",
        (-F.element_at(ranked, 1)["negc"]).cast("int").alias("cent"),
        _pq_recon_col(cb).alias("recon"))
    cand = coded.select(F.col("vec_id").alias("c_id"),
                        F.col("recon").alias("b"), "cent")
    probes = (coded.where(F.col("vec_id") % 50 == 0)
              .select(F.col("vec_id").alias("q_id"),
                      F.col("embedding").alias("a"),
                      F.explode(F.slice(ranked, 1, NPROBE)).alias("p"))
              .select("q_id", "a", (-F.col("p")["negc"]).cast("int").alias("cent")))
    j = cand.join(F.broadcast(probes), "cent").where(F.col("q_id") != F.col("c_id"))
    scored = _with_cos(j)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= IVF_TOPK)
            .select("q_id", "c_id", "cos", "rn"))


_O_ANN_IVFPQ = f"""
WITH cents AS (
  SELECT CAST(vec_id // {CENT_STRIDE} AS INT) AS cent, embedding AS ce
  FROM embeddings
  WHERE vec_id % {CENT_STRIDE} = 0 AND vec_id < {CENT_STRIDE * K_IVF}),
norms AS (
  SELECT vec_id, SUM(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)) AS nrm
  FROM embeddings, range(1, {DIM + 1}) r(i) GROUP BY vec_id),
cnorms AS (
  SELECT cent, SUM(CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) AS cnrm
  FROM cents, range(1, {DIM + 1}) r(i) GROUP BY cent),
vc AS (
  SELECT e.vec_id, c.cent,
         SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(c.ce[i] AS DOUBLE)) AS dot
  FROM embeddings e, cents c, range(1, {DIM + 1}) r(i)
  GROUP BY e.vec_id, c.cent),
scoredc AS (
  SELECT vec_id, cent, ROUND(dot / (SQRT(n.nrm) * SQRT(cn.cnrm)), 4) AS ccos
  FROM vc JOIN norms n USING (vec_id) JOIN cnorms cn USING (cent)),
assign AS (
  SELECT vec_id, cent FROM (
    SELECT vec_id, cent,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent ASC) AS rn
    FROM scoredc) WHERE rn = 1),
probes AS (
  SELECT vec_id AS q_id, cent FROM (
    SELECT vec_id, cent,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent ASC) AS rn
    FROM scoredc WHERE vec_id % 50 = 0) WHERE rn <= {NPROBE}),
cb AS (
  SELECT CAST(vec_id // {PQ_STRIDE} AS INT) AS c, embedding AS ce
  FROM embeddings
  WHERE vec_id % {PQ_STRIDE} = 0 AND vec_id < {PQ_STRIDE * K_PQ}),
subdist AS (
  SELECT e.vec_id, m.m, cb.c,
         ROUND(SUM((CAST(e.embedding[m.m * {DSUB} + i] AS DOUBLE)
                    - CAST(cb.ce[m.m * {DSUB} + i] AS DOUBLE))
                   * (CAST(e.embedding[m.m * {DSUB} + i] AS DOUBLE)
                      - CAST(cb.ce[m.m * {DSUB} + i] AS DOUBLE))), 4) AS d
  FROM embeddings e, range(0, {M_PQ}) m(m), cb, range(1, {DSUB + 1}) r(i)
  GROUP BY e.vec_id, m.m, cb.c),
codes AS (
  SELECT vec_id, m, c FROM (
    SELECT vec_id, m, c,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d ASC, c ASC) AS rn
    FROM subdist) WHERE rn = 1),
recon AS (
  SELECT k.vec_id, k.m, i AS sub_i,
         CAST(cb.ce[k.m * {DSUB} + i] AS DOUBLE) AS rv
  FROM codes k JOIN cb USING (c), range(1, {DSUB + 1}) r(i)),
rnorm AS (
  SELECT vec_id, SUM(rv * rv) AS nrm FROM recon GROUP BY vec_id),
dots AS (
  SELECT p.q_id, a.vec_id AS c_id,
         SUM(CAST(qe.embedding[rec.m * {DSUB} + rec.sub_i] AS DOUBLE) * rec.rv) AS dot
  FROM probes p
  JOIN embeddings qe ON p.q_id = qe.vec_id
  JOIN assign a ON a.cent = p.cent AND a.vec_id <> p.q_id
  JOIN recon rec ON rec.vec_id = a.vec_id
  GROUP BY 1, 2),
scored AS (
  SELECT q_id, c_id, ROUND(dot / (SQRT(nq.nrm) * SQRT(rn.nrm)), 4) AS cos
  FROM dots JOIN norms nq ON q_id = nq.vec_id JOIN rnorm rn ON c_id = rn.vec_id)
SELECT q_id, c_id, cos, rn FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS INT) AS rn
  FROM scored)
WHERE rn <= {IVF_TOPK}
"""


QUERIES = {
    "s_ann_bruteforce": s_ann_bruteforce,
    "s_lsh_buckets": s_lsh_buckets,
    "s_ann_lsh": s_ann_lsh,
    "s_ann_lsh_multiprobe": s_ann_lsh_multiprobe,
    "s_ann_ivf": s_ann_ivf,
    "s_ann_pq": s_ann_pq,
    "s_ann_ivfpq": s_ann_ivfpq,
}

ORACLES = {
    "s_ann_bruteforce": _O_BRUTE,
    "s_lsh_buckets": _O_LSH_BUCKETS,
    "s_ann_lsh": _O_ANN_LSH,
    "s_ann_lsh_multiprobe": _O_ANN_LSH_MP,
    "s_ann_ivf": _O_ANN_IVF,
    "s_ann_pq": _O_ANN_PQ,
    "s_ann_ivfpq": _O_ANN_IVFPQ,
}
