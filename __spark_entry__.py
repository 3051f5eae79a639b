"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Everything is sourced from :mod:`php_ec_spark.catalog`: each operator from
SURVEY.md §2 (and the training-data pipeline set) registers a Spark
callable + DuckDB oracle pair in queries_cep.py / queries_relational.py /
queries_pipeline.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from php_ec_spark.catalog import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's canonical scenario: sequence-with-
    timeout correlation (order placed → paid within T else timeout;
    examples/online_shop/rules/CheckOrderPayment.php) compiled to the
    one-shuffle window plan."""
    q = all_queries()["cep_seq_two_step"]
    return q.spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted ⇒ rows-only check."""
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
