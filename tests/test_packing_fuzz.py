"""Randomized differential fuzz for the distributed prefix-sum packer.

pack_sequences' deterministic tests pin the contract corners and a
partition-count sweep pins partition invariance on one corpus
(tests/test_pipeline_ops.py); this fuzz sweeps seeded random corpora —
random token counts with zeros, NULL text, empty strings, multi-space
runs — across budget × partition-count × counting convention against
an exact Python cumulative sum. The mirror reproduces the engine's
conventions precisely: the whitespace RECOUNT is a single-space split
(so '' counts 1 token and 'a  b' counts 3 — operators/packing.py),
NULL text/token counts coalesce to 0 BEFORE the prefix sum, and a
zero-token doc lands at seq_first = seq_last = start_offset DIV budget.
"""

from __future__ import annotations

import random

import pytest


def _brute(rows: list, budget: int, by_tokens: bool) -> dict:
    def count(r):
        if by_tokens:
            return r[1] or 0
        return 0 if r[1] is None else len(r[1].split(" "))

    out = {}
    off = 0
    for r in sorted(rows, key=lambda r: r[0]):
        n = count(r)
        last = off + n - 1 if n > 0 else off
        out[r[0]] = (n, off, off // budget, last // budget)
        off += n
    return out


def _text_corpus(seed: int, n: int = 400) -> list:
    rng = random.Random(seed)
    rows = [(0, None), (1, ""), (2, " "), (3, "a  b"), (4, "x" )]
    for i in range(5, n):
        words = rng.randint(0, 30)
        sep = rng.choice([" ", "  "])
        rows.append((i, sep.join("w" for _ in range(words))))
    return rows


def _count_corpus(seed: int, n: int = 400) -> list:
    rng = random.Random(seed)
    rows = [(0, None), (1, 0), (2, 0), (3, 1)]
    rows += [
        (i, rng.choice([0, 0, rng.randint(1, 5000)])) for i in range(4, n)
    ]
    return rows


@pytest.mark.parametrize(
    "seed,budget,parts",
    [(31, 512, 1), (32, 512, 7), (33, 3, 32), (34, 1, 5)],
)
def test_pack_by_text_matches_cumsum(spark, seed, budget, parts):
    from php_ec_spark.operators.packing import pack_sequences

    rows = _text_corpus(seed)
    want = _brute(rows, budget, by_tokens=False)
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(
        parts
    )
    got = {
        r.doc_id: (r.n_tokens, r.start_offset, r.seq_first, r.seq_last)
        for r in pack_sequences(
            df, budget=budget, num_partitions=parts
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("seed,budget,parts", [(41, 1000, 3), (42, 7, 16)])
def test_pack_by_token_col_matches_cumsum(spark, seed, budget, parts):
    from php_ec_spark.operators.packing import pack_sequences

    rows = _count_corpus(seed)
    want = _brute(rows, budget, by_tokens=True)
    df = spark.createDataFrame(
        rows, "doc_id long, n_tokens long"
    ).repartition(parts)
    got = {
        r.doc_id: (r.n_tokens, r.start_offset, r.seq_first, r.seq_last)
        for r in pack_sequences(
            df, budget=budget, num_partitions=parts, token_col="n_tokens"
        ).collect()
    }
    assert got == want
