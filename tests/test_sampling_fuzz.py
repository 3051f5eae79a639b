"""Randomized differential fuzz for the deterministic samplers (md5 path).

The gate pins the sampler stack on one corpus (pipe_sample_mix_decon);
this fuzz recomputes MEMBERSHIP independently — the md5 hash path
exists precisely so an external auditor can do that
(operators/sampling.py:_u) — on seeded random corpora across seeds,
fractions, and partition counts:

- stratified_sample: u(id) = md5('id:stratified_sample:seed')[:8]/2^32
  < fraction(stratum), missing strata keep all;
- weighted_mix: per-source tag 'weighted_mix:<name>' (decisions
  independent across sources sharing an id space), keep rate w/max(w),
  largest source passes whole;
- sample_to_token_budget: docs in ('u', id) hash order with u from the
  'token_budget' tag, kept while the INCLUSIVE running token total fits
  the budget — no backfill past the first overflow, NULL text = 0
  tokens riding along if reached.
"""

from __future__ import annotations

import hashlib
import random

import pytest


def _u(value, seed: int, op: str) -> float:
    hx = hashlib.md5(f"{value}:{op}:{seed}".encode()).hexdigest()
    return int(hx[:8], 16) / float(1 << 32)


def _corpus(seed: int, n: int = 300) -> list:
    rng = random.Random(seed)
    langs = ["en", "de", "fr", "xx"]
    rows = [(0, None, "en"), (1, "", "de")]
    for i in range(2, n):
        words = rng.randint(0, 40)
        rows.append(
            (i, " ".join(f"w{rng.randrange(50)}" for _ in range(words)),
             rng.choice(langs))
        )
    return rows


@pytest.mark.parametrize("seed", [51, 52])
def test_stratified_sample_membership(spark, seed):
    from php_ec_spark.operators.sampling import stratified_sample

    rows = _corpus(seed)
    fractions = {"en": 0.3, "de": 0.85, "fr": 0.0}
    want = {
        r[0]
        for r in rows
        if _u(r[0], seed, "stratified_sample") < fractions.get(r[2], 1.0)
    }
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r.doc_id
        for r in stratified_sample(
            df, fractions, "lang", seed=seed, hash="md5"
        ).collect()
    }
    assert got == want


def test_weighted_mix_membership(spark):
    from php_ec_spark.operators.sampling import weighted_mix

    a = _corpus(61, 150)
    b = _corpus(62, 200)  # overlapping id space, on purpose
    weights = {"a": 1.0, "b": 0.25}
    want = {("a", r[0]) for r in a} | {
        ("b", r[0])
        for r in b
        if _u(r[0], 3, "weighted_mix:b") < 0.25
    }
    schema = "doc_id long, text string, lang string"
    out = weighted_mix(
        {"a": spark.createDataFrame(a, schema),
         "b": spark.createDataFrame(b, schema)},
        weights, seed=3, hash="md5",
    )
    got = {(r.mix_source, r.doc_id) for r in out.collect()}
    assert got == want


@pytest.mark.parametrize(
    "seed,budget,parts", [(71, 500, 1), (72, 500, 13), (73, 3, 8)]
)
def test_token_budget_membership_and_cutoff(spark, seed, budget, parts):
    from php_ec_spark.operators.sampling import sample_to_token_budget

    rows = _corpus(seed)
    ordered = sorted(
        rows, key=lambda r: (_u(r[0], seed, "token_budget"), r[0])
    )
    want, cum = {}, 0
    for r in ordered:
        n = 0 if r[1] is None else len(r[1].split(" "))
        cum += n
        if cum > budget:
            break  # inclusive-cumsum prefix; nothing after survives
        want[r[0]] = (n, cum)
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r.doc_id: (r.n_tokens, r.cum_tokens)
        for r in sample_to_token_budget(
            df, budget, seed=seed, hash="md5", num_partitions=parts
        ).collect()
    }
    assert got == want
    assert sum(n for n, _ in want.values()) <= budget
