"""Empty-input behavior across the public surface: every operator must
return an empty, correctly-typed result — not crash — when fed an empty
stream/corpus (the reference engine idles on an empty source)."""

from pyspark.sql import functions as F

from php_ec_spark.engine import correlate, correlate_state_machine
from php_ec_spark.rules import match_single_continuously, sequence_rule

EVENTS_DDL = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
DOCS_DDL = "doc_id long, text string, lang string, source string"
EMB_DDL = "vec_id long, embedding array<float>, label int"


def _empty(spark, ddl):
    return spark.createDataFrame([], ddl)


class TestEmptyEvents:
    def test_correlate_empty_stream(self, spark):
        rules = [
            sequence_rule("s", ["a", "b"], key="user_id", timeout="PT10S"),
            match_single_continuously("g", ["*"], key="user_id", timeout="PT5S"),
        ]
        out = correlate(_empty(spark, EVENTS_DDL), rules)
        assert out.count() == 0
        assert "rule" in out.columns and "fire_ts" in out.columns

    def test_state_machine_empty_stream(self, spark):
        rules = [sequence_rule("s", ["a", "b"], key="user_id", timeout="PT10S")]
        assert correlate_state_machine(_empty(spark, EVENTS_DDL), rules).count() == 0

    def test_cron_over_empty_stream(self, spark):
        from php_ec_spark.functions import cron_expression_fires, cron_fires

        assert cron_fires(_empty(spark, EVENTS_DDL)).count() == 0
        assert cron_expression_fires(_empty(spark, EVENTS_DDL), "0 * * * *").count() == 0

    def test_chain_correlate_empty_stream(self, spark):
        from php_ec_spark.engine.chain import chain_correlate

        rules = [sequence_rule("s", ["a", "b"], key="user_id", timeout="PT10S")]
        assert chain_correlate(_empty(spark, EVENTS_DDL), rules).count() == 0


class TestEmptyCorpus:
    def test_dedup_ops_empty_docs(self, spark):
        from php_ec_spark.operators.dedup import (
            dedup_clusters,
            exact_dedup,
            jaccard_pairs,
            minhash_lsh_pairs,
            simhash_pairs,
        )

        docs = _empty(spark, DOCS_DDL)
        assert exact_dedup(docs).count() == 0
        assert jaccard_pairs(docs).count() == 0
        assert minhash_lsh_pairs(docs).count() == 0
        assert simhash_pairs(docs).count() == 0
        assert dedup_clusters(docs).count() == 0

    def test_dup_span_stats_empty_docs(self, spark):
        from php_ec_spark.operators.dedup import dup_span_stats

        out = dup_span_stats(_empty(spark, DOCS_DDL))
        assert out.count() == 0
        assert set(out.columns) == {
            "doc_id", "n_windows", "n_dup_windows", "dup_fraction"
        }

    def test_remove_dup_spans_empty_docs(self, spark):
        from php_ec_spark.operators.dedup import remove_dup_spans

        out = remove_dup_spans(_empty(spark, DOCS_DDL))
        assert out.count() == 0
        assert set(out.columns) == {
            "doc_id", "text", "n_tokens", "tokens_removed"
        }

    def test_sample_to_token_budget_empty_docs(self, spark):
        from php_ec_spark.operators.sampling import sample_to_token_budget

        out = sample_to_token_budget(_empty(spark, DOCS_DDL), 1000)
        assert out.count() == 0
        assert {"doc_id", "text", "n_tokens", "cum_tokens"} <= set(
            out.columns
        )

    def test_similarity_empty_corpus_or_queries(self, spark):
        from php_ec_spark.operators.similarity import cosine_dup_pairs, cosine_topk

        emb = _empty(spark, EMB_DDL)
        assert cosine_topk(emb, emb, k=3).count() == 0
        assert cosine_dup_pairs(emb, threshold=0.5).count() == 0

    def test_text_ops_empty_docs(self, spark):
        from php_ec_spark.operators.text import with_lang_id, with_token_stats

        docs = _empty(spark, DOCS_DDL)
        assert with_token_stats(docs).count() == 0
        assert with_lang_id(docs).count() == 0

    def test_lm_bits_empty_docs(self, spark):
        """An empty corpus trains an empty model (vocab floor 1) and
        scores nothing — no division by zero, no rows."""
        from php_ec_spark.operators.lm import with_lm_bits

        out = with_lm_bits(_empty(spark, DOCS_DDL))
        assert out.count() == 0
        assert set(out.columns) == {"doc_id", "n_trans", "lm_bits"}


class TestEmptyIncrementalIndex:
    def test_dedup_index_empty_increment_and_empty_base(self, spark):
        import pytest as _pytest

        from php_ec_spark.operators.dedup_index import (
            dedup_index_add,
            dedup_index_build,
            dedup_index_drop,
            dedup_index_probe,
        )

        docs = spark.createDataFrame(
            [(1, "some text here"), (2, "other text there")],
            "doc_id long, text string",
        )
        # empty BASE: a legal (if pointless) index — everything probes novel
        dedup_index_build(_empty(spark, DOCS_DDL), "e_ix", num_buckets=2)
        try:
            out = dedup_index_probe(spark, "e_ix", docs)
            assert out.count() == 2
            assert out.filter(F.col("exact_dup_of").isNotNull()).count() == 0
            # empty INCREMENT: probe returns empty with the full schema,
            # add is a no-op
            empty_out = dedup_index_probe(
                spark, "e_ix", _empty(spark, "doc_id long, text string")
            )
            assert empty_out.count() == 0
            for c in ("text_hash", "exact_dup_of", "near_dup_of",
                      "near_jaccard"):
                assert c in empty_out.columns
            dedup_index_add(
                spark, "e_ix", _empty(spark, "doc_id long, text string")
            )
            assert spark.table("e_ix_digests").count() == 0
            # the round-10 probe variants hold the same empty contracts
            allm = dedup_index_probe(
                spark, "e_ix", _empty(spark, "doc_id long, text string"),
                matches="all",
            )
            assert allm.count() == 0 and "near_jaccard" in allm.columns
            exact_only = dedup_index_probe(
                spark, "e_ix", docs, near_layer=False
            )
            assert exact_only.count() == 2
            assert "near_dup_of" not in exact_only.columns
        finally:
            dedup_index_drop(spark, "e_ix")

    def test_semdedup_empty_corpus(self, spark):
        import numpy as np
        import pytest as _pytest

        from php_ec_spark.operators.similarity import semdedup

        # no vectors to train a quantizer on: loud, actionable error
        with _pytest.raises(ValueError):
            semdedup(_empty(spark, EMB_DDL), n_clusters=4)
        # with a provided quantizer an empty corpus is a legal no-op
        cents = np.eye(4, 8)
        out = semdedup(_empty(spark, EMB_DDL), centroids=cents)
        assert out.count() == 0
        assert set(out.columns) == {
            "vec_id", "cluster", "cent_cos", "semdup_group", "keep"
        }
