"""End-to-end training-data pipeline composition: the operators compose
into the curation flow a real 100 TB pipeline runs — exact dedup →
near-dup cluster survivor pick → language/quality gates → token budget —
with every stage a DataFrame transform on one lineage (single job, no
intermediate materialization)."""

import pytest
from pyspark.sql import functions as F

from php_ec_spark.operators.dedup import dedup_clusters, exact_dedup
from php_ec_spark.operators.text import (
    with_bpe_token_count,
    with_lang_id,
    with_quality_score,
    with_token_stats,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_curation_pipeline_composes(spark, docs):
    # 1) exact dedup: survivor id per normalized-text group
    survivors = exact_dedup(docs).select("doc_id")
    stage1 = docs.join(survivors, "doc_id", "left_semi")

    # 2) near-dup clusters at J>=0.8: keep the min-id representative
    clusters = dedup_clusters(stage1, threshold=0.8)
    reps = clusters.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
    stage2 = stage1.join(reps, "doc_id", "left_semi")

    # 3) annotate: language, quality, tokens — all codegen column ops
    annotated = with_bpe_token_count(
        with_quality_score(with_lang_id(with_token_stats(stage2)))
    )

    # 4) gates a curation run would apply
    curated = annotated.filter(
        (F.col("pred_lang") != "und")
        & (F.col("quality_score") >= 0.2)
        & (F.col("n_bpe_tokens") >= 5)
    )

    rows = curated.select(
        "doc_id", "pred_lang", "quality_score", "n_bpe_tokens"
    ).collect()

    n_docs = docs.count()
    n1 = stage1.count()
    n2 = stage2.count()
    # each stage only removes rows, never duplicates or invents them
    assert n_docs >= n1 >= n2 >= len(rows) > 0

    # survivors are exactly one per near-dup cluster
    assert n2 == clusters.select("cluster_id").distinct().count()

    # annotations behaved like column functions (no row fanout/loss)
    assert annotated.count() == n2
    assert all(r.n_bpe_tokens >= 5 and r.quality_score >= 0.2 for r in rows)


def test_pipeline_is_one_spark_job_shape(spark, docs):
    """The composed pipeline stays declarative: one explain-able plan, type
    filters and projections visible to Catalyst (no collect between
    stages except dedup_clusters' bounded label-propagation loop)."""
    survivors = exact_dedup(docs).select("doc_id")
    stage1 = docs.join(survivors, "doc_id", "left_semi")
    annotated = with_quality_score(with_token_stats(stage1))
    plan = annotated._jdf.queryExecution().executedPlan().toString()
    # (AQE hides WholeStageCodegen spans until execution; assert structure)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "PushedFilters: [IsNotNull(doc_id)]" in plan


@pytest.mark.slow
def test_curation_example_runs(spark, tmp_path):
    """examples/curation_pipeline.py end to end at sf0.001: the funnel is
    monotonically non-increasing, every stage keeps at least one doc, the
    packed output covers exactly the sampled survivors, and the optional
    terminal shard export round-trips the curated docs."""
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples",
        "curation_pipeline.py",
    )
    spec = importlib.util.spec_from_file_location("curation_pipeline", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    export = str(tmp_path / "shards")
    funnel, packed = mod.curate(spark, SF, export_path=export, export_shards=4)
    assert funnel.pop("shards_written") == 4
    stages = list(funnel.values())
    assert stages == sorted(stages, reverse=True)  # funnel never grows
    assert stages[-1] > 0
    # the terminal export holds exactly the curated docs, 4 shard dirs
    exported = spark.read.parquet(export)
    assert exported.count() == funnel["sampled"]
    assert exported.select("shard").distinct().count() == 4
    assert funnel["packed_docs"] == funnel["sampled"]
    rows = sorted(packed.collect(), key=lambda r: r.doc_id)
    running = 0
    for r in rows:  # offsets are the exact prefix sums of the survivors
        assert r.start_offset == running
        running += r.n_tokens


def _load_example(name: str):
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples",
        name,
    )
    spec = importlib.util.spec_from_file_location(name[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_incremental_curation_example_runs(spark, capsys):
    """examples/incremental_curation.py end to end: the index survives
    two daily increments, re-crawls flag as exact dups, and the example
    cleans its catalog tables up after itself."""
    mod = _load_example("incremental_curation.py")
    mod.main(SF)
    out = capsys.readouterr().out
    assert "day 0: indexed" in out and "day 2" in out
    # the streaming stage's funnel: re-embed batch fully dropped, novel
    # batch fully landed, both batches journaled
    import re

    m = re.search(
        r"streaming ingest: 50 staged -> (\d+) landed, (\d+) dropped "
        r"as semantic dups \((\d+) batches journaled\)",
        out,
    )
    assert m, f"streaming ingest line missing:\n{out}"
    assert (int(m.group(1)), int(m.group(2)), int(m.group(3))) == (25, 25, 2)
    # the example's finally-block dropped its fixed-name index tables
    left = [t.name for t in spark.catalog.listTables()
            if t.name.startswith("curation_ix")]
    assert left == []


@pytest.mark.slow
def test_ingest_dedup_example_runs(spark, capsys):
    """examples/ingest_dedup.py end to end: the exact-dedup landing and
    the near-dup flagger both process the staged stream — parse the
    printed funnel and assert its invariants, not just that it spoke."""
    import re

    mod = _load_example("ingest_dedup.py")
    mod.main(SF)
    out = capsys.readouterr().out

    def num(label):
        m = re.search(rf"{label}\s*:\s*(\d+)", out)
        assert m, f"{label!r} line missing from example output:\n{out}"
        return int(m.group(1))

    n_in = num("docs replayed")
    n_landed = num(r"landed \(exact gate\)")
    n_flagged = num("near-dup flags")
    # the staged stream replays byte-duplicates on purpose: the exact
    # gate must drop SOME but never all, and flags never exceed arrivals
    assert 0 < n_landed < n_in
    assert 0 <= n_flagged <= n_in
    # every later side of an exact-verified near-dup pair was flagged at
    # ingest (the example prints the confirmation count)
    m = re.search(r"later sides: (\d+), of which flagged at ingest: (\d+)", out)
    assert m and m.group(1) == m.group(2), out
