"""Layout utilities: bucketed co-located joins must plan without a
shuffle on either side; salted aggregation must equal the plain one;
training-shard export must be a deterministic, complete, balanced
partition of the corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from php_ec_spark.layout import (
    export_training_shards,
    salted_agg,
    with_shard,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


class TestBucketedJoin:
    def test_bucketed_join_has_no_exchange(self, spark, tmp_path_factory):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            orders = spark.read.parquet(f"{SF}/orders.parquet")
            lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
            write_bucketed(orders, "b_orders", ["o_orderkey"], 8,
                           sort_cols=["o_orderkey"])
            write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], 8,
                           sort_cols=["l_orderkey"])
            o = spark.table("b_orders")
            l = spark.table("b_lineitem")
            joined = l.join(o, l.l_orderkey == o.o_orderkey)
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            # sanity: the join still returns every lineitem row
            assert joined.count() == lineitem.count()
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_lineitem")


class TestSaltedAgg:
    def test_equals_plain_aggregation(self, spark):
        from php_ec_spark.model import load_events

        e = load_events(spark, SF)
        plain = {
            r["user_id"]: (r["n"], round(r["s"], 6))
            for r in e.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
            .collect()
        }
        salted_s = {
            r["user_id"]: round(r["sum_value"], 6)
            for r in salted_agg(e, "user_id", {"value": "sum"}, n_salts=8).collect()
        }
        salted_n = {
            r["user_id"]: r["count_value"]
            for r in salted_agg(e, "user_id", {"value": "count"}, n_salts=8).collect()
        }
        for uid, (n, s) in plain.items():
            assert salted_n[uid] == n
            assert abs(salted_s[uid] - s) < 1e-6


class TestTrainingShards:
    N = 16

    def test_export_is_a_complete_deterministic_partition(self, spark, tmp_path):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        want_ids = {r.doc_id for r in docs.select("doc_id").collect()}

        p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
        export_training_shards(docs, p1, self.N, salt=7)
        # a second export — different session state, different upstream
        # partitioning — must produce byte-identical shard membership
        export_training_shards(docs.repartition(3), p2, self.N, salt=7)

        r1 = spark.read.parquet(p1)
        by_shard = {
            r.shard: set(r.ids)
            for r in r1.groupBy("shard")
            .agg(F.collect_set("doc_id").alias("ids"))
            .collect()
        }
        # complete partition: every doc exactly once, every shard id valid
        assert set().union(*by_shard.values()) == want_ids
        assert sum(len(v) for v in by_shard.values()) == len(want_ids)
        assert all(0 <= s < self.N for s in by_shard)

        r2 = spark.read.parquet(p2)
        by_shard2 = {
            r.shard: set(r.ids)
            for r in r2.groupBy("shard")
            .agg(F.collect_set("doc_id").alias("ids"))
            .collect()
        }
        assert by_shard2 == by_shard

        # intra-shard order: sorted-by-ord read-back equals the column
        # recomputed from the id alone (no layout dependence)
        one = (
            r1.filter(F.col("shard") == min(by_shard))
            .orderBy("ord", "doc_id")
            .select("doc_id", "ord")
            .collect()
        )
        recomputed = {
            r.doc_id: r.ord
            for r in with_shard(docs, self.N, salt=7).select("doc_id", "ord").collect()
        }
        assert [r.ord for r in one] == sorted(recomputed[r.doc_id] for r in one)

    def test_salt_reshuffles_and_shards_stay_balanced(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        a = {r.doc_id: r.shard for r in with_shard(docs, self.N, salt=0).collect()}
        b = {r.doc_id: r.shard for r in with_shard(docs, self.N, salt=1).collect()}
        moved = sum(1 for d in a if a[d] != b[d])
        # an independent reshuffle moves ~(N-1)/N of docs; require >half
        assert moved > len(a) / 2

        from collections import Counter

        for assign in (a, b):
            sizes = Counter(assign.values())
            assert len(sizes) == self.N  # no empty shard at 500 docs
            mean = len(assign) / self.N
            # md5 is uniform: every shard within ±60% of mean (500 docs,
            # ~31/shard, binomial σ≈5.4 — a 60% band is ~3.5σ)
            assert all(abs(c - mean) < 0.6 * mean for c in sizes.values()), sizes

    def test_assignment_is_engine_portable(self, spark):
        """The docstring's portability contract: an external system (here
        DuckDB, the repo's oracle engine) recomputes identical (ord,
        shard) from the id alone — training loaders and audit queries
        never need Spark to know what a shard contains."""
        import duckdb

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = {
            r.doc_id: (r.ord, r.shard)
            for r in with_shard(docs, self.N, salt=7).collect()
        }
        con = duckdb.connect()
        want = {
            d: (o, s)
            for d, o, s in con.execute(
                f"""
                SELECT doc_id,
                       ('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS ord,
                       ('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % {self.N} AS shard
                FROM '{SF}/documents.parquet'
                """
            ).fetchall()
        }
        con.close()
        assert got == want
