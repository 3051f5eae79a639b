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

    def test_salt_from_is_deterministic_and_spreads(self, spark):
        """The default row-id salt is retry-UNstable (monotonic ids depend
        on task layout); salt_from=<row id column> must be a pure function
        of the column — identical across re-runs and upstream
        repartitioning — while still spreading rows of one hot key over
        many salt values."""
        from php_ec_spark.layout import with_salt

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        a = {r.doc_id: r["__salt"]
             for r in with_salt(docs, 8, salt_from="doc_id").collect()}
        b = {r.doc_id: r["__salt"]
             for r in with_salt(docs.repartition(7), 8, salt_from="doc_id").collect()}
        assert a == b
        assert all(0 <= v < 8 for v in a.values())
        # one "hot key" (all docs) spreads over every salt value
        assert len(set(a.values())) == 8


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

    def test_export_tasks_align_with_shards(self, spark):
        """The export repartitions by RANGE on the shard value: a shard
        never splits across two tasks, and — unlike hashing the shard
        value, which leaves ~1/e of tasks empty while others write
        several shards — nearly every task writes. Pinned on the same
        repartition the writer uses (write parallelism is the point of
        the ADVICE fix; membership is layout-independent either way)."""
        from php_ec_spark.layout import with_shard

        n = 64
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        d = (
            with_shard(docs, n, salt=7)
            .repartitionByRange(n, "shard")
            .select("shard", F.spark_partition_id().alias("pid"))
            .collect()
        )
        shard_pids: dict[int, set[int]] = {}
        for r in d:
            shard_pids.setdefault(r.shard, set()).add(r.pid)
        # range partitioning keeps equal keys together: one task per shard
        assert all(len(p) == 1 for p in shard_pids.values())
        used = {next(iter(p)) for p in shard_pids.values()}
        # hash partitioning leaves ~1/e of 64 tasks empty (~40 used);
        # range boundaries over a uniform 0..63 use nearly all of them
        assert len(used) >= n - 8, len(used)

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
