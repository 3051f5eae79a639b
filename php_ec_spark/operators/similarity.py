"""Similarity search over embedding columns (array<float>).

Two paths:

- :func:`cosine_topk` — exact brute force. The query set is broadcast
  (small side), the corpus is scanned ONCE with no shuffle of the corpus
  itself; per-query top-k is a partial-aggregate (map-side) followed by a
  tiny final reduce, so the shuffled volume is O(|queries|·k·partitions),
  not O(|corpus|·|queries|).
- :func:`ivf_topk` — IVF-style approximate path: corpus is bucketed by a
  coarse quantizer (nearest of C centroids), queries probe only the
  ``nprobe`` nearest buckets. At 100 TB the bucket column becomes the
  partition key so a probe touches 1/C of the data.

Dot products run in the JVM via zip_with/aggregate — doubles, left-to-right
summation, bit-identical to the DuckDB oracle's list arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def with_unit_vec(df: DataFrame, vec_col: str = "embedding", out_col: str = "unit") -> DataFrame:
    """Pre-normalize embeddings to unit length (cosine ⇒ plain dot product).

    The norm is computed ONCE into a column (embedding it inside the
    per-element lambda would re-run the O(d) aggregate d times); zero
    vectors normalize to zero vectors instead of NaN."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    d = df.withColumn("__norm", _norm(v))
    return d.withColumn(
        out_col,
        F.when(
            F.col("__norm") > 0,
            F.transform(v, lambda x: x / F.col("__norm")),
        ).otherwise(F.transform(v, lambda x: x * 0.0)),
    ).drop("__norm")


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Output: (query_id, neighbor_id, cos, rank), rank 1..k, self-matches
    excluded. cos is rounded to 6 dp and ranking is by (rounded cos DESC,
    neighbor_id) so order is deterministic across engines.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cv"),
    )
    cos = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    scored = (
        c.join(F.broadcast(q))  # broadcast nested-loop: one pass over corpus
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(cos, 6).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cluster_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cos) with cos ≥
    threshold, id_a < id_b.

    Baseline path: exact all-pairs via self-join — correct at any data, the
    oracle-checkable reference. Scale path: pass ``cluster_col`` (an IVF
    bucket / coarse-quantizer assignment) to compare only within-bucket
    pairs — near-dups land in the same bucket when the quantizer has
    geometric meaning, turning O(n²) into Σ|bucket|².
    """
    c = corpus.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        *([F.col(cluster_col).alias("bucket")] if cluster_col else []),
    )
    a = c.select(
        *([F.col("bucket")] if cluster_col else []),
        F.col("id").alias("id_a"), F.col("v").alias("va"),
    )
    b = c.select(
        *([F.col("bucket")] if cluster_col else []),
        F.col("id").alias("id_b"), F.col("v").alias("vb"),
    )
    joined = a.join(b, ["bucket"] if cluster_col else []) if cluster_col else a.crossJoin(b)
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def build_centroids(
    corpus: DataFrame, cluster_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Coarse-quantizer centroids: mean vector per cluster id.

    Computed columnar: posexplode → groupBy(cluster, pos) mean → re-assemble
    the array ordered by position. One shuffle proportional to |corpus|·dim,
    run once at index-build time.
    """
    exploded = corpus.select(
        F.col(cluster_col).alias("cluster"),
        F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias(
            "pos", "val"
        ),
    )
    return (
        exploded.groupBy("cluster", "pos")
        .agg(F.avg("val").alias("m"))
        .groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cluster", F.transform("pm", lambda s: s["m"]).alias("centroid"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    cluster_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate top-k: probe only the ``nprobe`` nearest clusters.

    The corpus side is filtered by (query, cluster) assignment BEFORE any
    distance math — at scale, with the corpus written partitioned by
    cluster, this is partition pruning: each query reads nprobe/C of data.
    """
    cents = build_centroids(corpus, cluster_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qv"),
    )
    qcos = _dot(F.col("qv"), F.col("centroid")) / (
        _norm(F.col("qv")) * _norm(F.col("centroid"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("cluster"))
    probes = (
        q.join(F.broadcast(cents))
        .select("query_id", "qv", "cluster", qcos.alias("ccos"))
        .withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= nprobe)
        .select("query_id", "qv", "cluster")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(cluster_col).alias("cluster"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cv"),
    )
    cos = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    scored = (
        c.join(F.broadcast(probes), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(cos, 6).alias("cos"))
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(wr)).filter(F.col("rank") <= k)
