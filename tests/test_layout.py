"""Layout utilities: bucketed co-located joins must plan without a
shuffle on either side; salted aggregation must equal the plain one."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from php_ec_spark.layout import salted_agg, write_bucketed

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
