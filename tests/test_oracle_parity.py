"""Local mirror of the driver's t2 correctness gate.

For every catalog query with an oracle: run the Spark callable and the
DuckDB SQL on the same sf directory, then compare row count, column names,
and (column-name-sorted, row-sorted) values — the same thing the driver's
value-hash sees. Floats must match to 1e-9 (the driver hashes exactly;
queries are designed to agree bitwise via rounding, so any drift here is a
real bug, but we allow tiny tolerance to localize failures instead of
failing on representation).

Run with SPARK_GRAFT_PARITY_SF=/root/testdata/sf0.01 for the driver-exact
check (slower); defaults to sf0.001.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

from php_ec_spark.catalog import all_queries
from php_ec_spark.session import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        return [f"{name}: columns differ spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"]
    if len(sdf) != len(odf):
        problems.append(f"{name}: row count spark={len(sdf)} oracle={len(odf)}")
        return problems
    s, o = _canon(sdf), _canon(odf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sv = pd.to_numeric(sv, errors="coerce")
            ov = pd.to_numeric(ov, errors="coerce")
            bad = ~(
                (sv.isna() & ov.isna())
                | ((sv - ov).abs() <= 1e-9 + 1e-9 * ov.abs())
            )
        else:
            bad = ~((sv.isna() & ov.isna()) | (sv == ov))
        if bad.any():
            i = bad.idxmax()
            problems.append(
                f"{name}.{c}: {int(bad.sum())}/{len(s)} mismatches, "
                f"first at row {i}: spark={sv[i]!r} oracle={ov[i]!r}"
            )
    return problems


QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(name, spark, ddb):
    q = QUERIES[name]
    sdf = q.spark(spark, SF_DIR).toPandas()
    assert len(sdf) >= 0  # smoke: the Spark side must at least run
    if q.oracle is None:
        assert len(sdf) > 0, f"{name}: rows-only query returned empty result"
        return
    odf = ddb.execute(q.oracle).df()
    problems = _compare(name, sdf, odf)
    assert not problems, "\n".join(problems)


#: Queries whose semantics have scale-dependent surface (window/session
#: boundaries, stop-shingle df cutoffs, sampling hash distributions) AND
#: whose DuckDB oracle scales linearly — parity-checked again at 10× the
#: driver's gate. The exact-all-pairs oracles (minhash, dedup_clusters)
#: are intentionally absent: THEIR DuckDB side is quadratic in |docs|
#: (12.5M list-intersections at sf0.1, tens of minutes) — the Spark side
#: scales fine and keeps its sf0.01 gate + recall tests instead.
SCALE_SENSITIVE = [
    "pipe_jaccard_pairs",
    "pipe_simhash",
    "pipe_sample_mix_decon",
    "pipe_pack_sequences",  # prefix sums cross more partition boundaries
    "pipe_repetition_signals",  # longer-tail run lengths per doc
    "rel_events_eps",
    "cep_gap_sessions",
]

SF01 = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def ddb_sf01():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF01}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.slow
@pytest.mark.parametrize("name", SCALE_SENSITIVE)
def test_scale_boundary_parity_sf01(name, spark, ddb_sf01):
    """Driver gates at sf0.01; these semantics have boundaries the small
    SF can miss (LSH band recall at 0.8, max_df stop-shingle cutoffs that
    only engage with enough docs, 15-minute slide windows over a longer
    span, md5 keep-rate tails). One order of magnitude up, same exactness
    bar."""
    q = QUERIES[name]
    sdf = q.spark(spark, SF01).toPandas()
    odf = ddb_sf01.execute(q.oracle).df()
    problems = _compare(name, sdf, odf)
    assert not problems, "\n".join(problems)


class TestNullValueOracleParity:
    """The driver's corpora carry no NULL values, so the gate can't see a
    misaligned oracle: three independent first_value(...IGNORE NULLS)
    windows take ts/id from the first match but val from a LATER one when
    the matched event's value is NULL. The struct-anchored oracles must
    agree with the engine on exactly that stream."""

    def test_seq_two_step_oracle_handles_null_values(self, spark):
        import datetime as dt

        from php_ec_spark.engine import correlate
        from php_ec_spark.rules import sequence_rule

        base = dt.datetime(2024, 1, 1)
        rows = [
            # signup -> purchase(value NULL) -> purchase(7.0): the engine
            # completes on the FIRST purchase and value_sum = 10.0
            (1, base, 1, "signup", 10.0, None),
            (2, base + dt.timedelta(minutes=1), 1, "purchase", None, None),
            (3, base + dt.timedelta(minutes=2), 1, "purchase", 7.0, None),
            # signup -> purchase(value NULL), nothing later: engine emits
            # value_sum = 5.0 (None values are skipped, not propagated)
            (4, base, 2, "signup", 5.0, None),
            (5, base + dt.timedelta(minutes=1), 2, "purchase", None, None),
        ]
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        rule = sequence_rule(
            "pay_check", ["signup", "purchase"], key="user_id",
            timeout="PT24H",
        )
        spark_pdf = (
            all_queries()["cep_seq_two_step"]  # noqa: F841  (schema ref)
            and correlate(ev, [rule])
            .selectExpr(
                "rule", "key", "outcome", "fire_ts", "start_event_id",
                "last_event_id", "n_events",
                "round(value_sum, 6) AS value_sum",
            )
            .toPandas()
        )
        con = duckdb.connect()
        con.register("events_pdf", ev.toPandas())
        con.execute("CREATE VIEW events AS SELECT * FROM events_pdf")
        oracle_pdf = con.execute(
            all_queries()["cep_seq_two_step"].oracle
        ).df()
        cols = sorted(spark_pdf.columns)
        a = spark_pdf[cols].sort_values(cols).reset_index(drop=True)
        b = oracle_pdf[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        # and pin the engine-side semantics explicitly
        by_key = {r["key"]: r for _, r in a.iterrows()}
        assert by_key["1"]["value_sum"] == 10.0
        assert by_key["1"]["last_event_id"] == 2  # FIRST purchase
        assert by_key["2"]["value_sum"] == 5.0


class TestIrregularWhitespaceOracleParity:
    """The driver's corpora are single-spaced ASCII, so the gate can't see
    a tokenization-convention split between the Spark operators
    (split(trim, '\\s+')) and an oracle written with string_split(' ').
    Pin the registered jaccard oracle against the Spark side on text with
    repeated/tab/edge whitespace."""

    def test_jaccard_oracle_matches_on_messy_whitespace(self, spark):
        from php_ec_spark.operators.dedup import jaccard_pairs

        texts = [
            (0, "x y  z w one two three"),    # double space
            (1, "x y z w one two three"),
            (2, "alpha  beta\tgamma delta "),  # doubles + tab + trailing
            (3, "alpha beta gamma delta"),
        ] + [
            # filler so the 5% max_df cutoff (floor'd like the registered
            # query) keeps df=2 shingles: max_df = floor(0.05*44) = 2
            (10 + i, f"filler{i} words nothing{i} shared{i} here{i}")
            for i in range(40)
        ]
        ev = spark.createDataFrame(texts, "doc_id long, text string")
        max_df = max(1, int(len(texts) * 0.05))
        sdf = jaccard_pairs(ev, 0.8, max_df=max_df).toPandas()
        con = duckdb.connect()
        con.register("docs_pdf", ev.toPandas())
        con.execute("CREATE VIEW documents AS SELECT * FROM docs_pdf")
        odf = con.execute(QUERIES["pipe_jaccard_pairs"].oracle).df()
        cols = sorted(sdf.columns)
        a = sdf[cols].sort_values(cols).reset_index(drop=True)
        b = odf[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        got = {(r.doc_a, r.doc_b) for r in a.itertuples()}
        assert (0, 1) in got and (2, 3) in got  # whitespace-insensitive
