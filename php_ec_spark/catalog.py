"""Query catalog — the driver-facing inventory of implemented operators.

Every operator from SURVEY.md §2 (plus the large-scale pipeline operators)
is exposed as a named query: a Spark callable ``(spark, sf_dir) -> DataFrame``
paired with an equivalent ANSI-SQL oracle that DuckDB runs on the same
parquet tables. The driver (and ``tests/test_oracle_parity.py``) compares
them row-for-row; column names/aliases MUST match on both sides.

Conventions that keep the comparison exact:

- timestamps: oracle SQL casts ``ts::TIMESTAMP`` (DuckDB reads the events
  table as TIMESTAMP_NS; Spark floors to µs — the cast makes DuckDB match).
- float aggregates are rounded (``_r`` suffix) — sums of 2-decimal inputs
  round exactly on both engines; orderings use the rounded value plus an id
  tie-break so double ULP differences can't flip ranks.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None ⇒ non-SQL-expressible, rows-only check
    headline: bool = False  # included in bench.py
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def _with_session_defaults(fn: Callable[[SparkSession, str], DataFrame]):
    """Pin the session settings oracle parity depends on, regardless of how
    the caller built its SparkSession: UTC timestamps (DuckDB timestamps
    are UTC-naive; reference normalizes to UTC, Event.php:63-80) and
    ns-as-long parquet reads (events.parquet is TIMESTAMP(NANOS))."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # TIMESTAMP(µs, isAdjustedToUTC=false) parquet columns must read as
        # session-TZ TIMESTAMP (UTC), not TIMESTAMP_NTZ — matches DuckDB's
        # naive-UTC timestamps and keeps ts arithmetic (casts to double,
        # unix_timestamp) legal.
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def register(
    name: str,
    oracle: Optional[str],
    headline: bool = False,
    doc: str = "",
):
    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name}")
        _REGISTRY[name] = Query(
            name=name,
            spark=_with_session_defaults(fn),
            oracle=oracle,
            headline=headline,
            doc=doc,
        )
        return fn

    return wrap


def all_queries() -> dict[str, Query]:
    _load_all()
    return dict(_REGISTRY)


def _load_all() -> None:
    # Importing the modules populates the registry. ORDER AND COUNT ARE
    # POLICY: the driver's correctness gate evaluates only the FIRST 50
    # registrations, so (a) total registrations must stay ≤ 50 — adding a
    # query means consolidating or displacing one, never silently pushing
    # an existing query past the window — and (b) modules are ordered by
    # novelty (CEP engine semantics, then pipeline operators, then the
    # relational surface Catalyst gives for free) so if the count ever
    # creeps over, the least-novel queries are the ones that drop out.
    from . import queries_cep  # noqa: F401  (17)
    from . import queries_pipeline  # noqa: F401  (19)
    from . import queries_relational  # noqa: F401  (14)
