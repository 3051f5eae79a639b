"""Randomized differential fuzz for the ExactSubstr window signal.

dup_span_stats' deterministic tests pin the contract corners
(tests/test_pipeline_ops.py::TestDupSpanStats) and the gate pins one
corpus; this fuzz sweeps seeded random corpora with PLANTED cross-doc
spans against a positionally-exact Python reference, across window
sizes and the min_docs branches — in particular the fully
map-side-combinable ``min(doc_id) != max(doc_id)`` shortcut the
operator substitutes for ``count_distinct >= 2`` (operators/dedup.py),
which a fuzz is the right tool to prove equivalent on arbitrary
geometry. The reference mirrors the engine exactly: ALL stride-1
window positions count (within-doc repeats are separate windows),
dup-ness tests DISTINCT docs, docs shorter than the window contribute
one whole-sequence window, and NULL text tokenizes like the empty
string.
"""

from __future__ import annotations

import random
import re

import pytest


def _windows(text, window: int) -> list:
    toks = re.split(r"\s+", (text or "").strip())
    if len(toks) < window:
        return [" ".join(toks)]
    return [
        " ".join(toks[i : i + window]) for i in range(len(toks) - window + 1)
    ]


def _brute(docs: dict, window: int, min_docs: int) -> dict:
    wins = {d: _windows(t, window) for d, t in docs.items()}
    docs_per_win: dict = {}
    for d, ws in wins.items():
        for w in set(ws):
            docs_per_win.setdefault(w, set()).add(d)
    out = {}
    for d, ws in wins.items():
        n_dup = sum(1 for w in ws if len(docs_per_win[w]) >= min_docs)
        out[d] = (len(ws), n_dup, round(n_dup / len(ws), 6))
    return out


def _corpus(seed: int, n_docs: int = 60) -> dict:
    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(40)]
    docs: dict = {}
    did = 0

    def add(text):
        nonlocal did
        docs[did] = text
        did += 1

    add(None)
    add("")
    add("t0")  # shorter than any window
    add("t1 t1 t1 t1 t1 t1")  # within-doc repeats: NOT duplication alone
    # a doc sharing its repeated window with another doc IS duplication
    add("t1 t1 t1")
    while did < n_docs:
        toks = [rng.choice(vocab) for _ in range(rng.randint(1, 60))]
        add(" ".join(toks))
        # plant a verbatim span of this doc into 0-2 other fresh docs
        for _ in range(rng.randint(0, 2)):
            if len(toks) < 4:
                break
            lo = rng.randrange(len(toks) - 3)
            span = toks[lo : lo + rng.randint(3, min(20, len(toks) - lo))]
            filler = [rng.choice(vocab) for _ in range(rng.randint(0, 10))]
            add(" ".join(filler + span))
            if did >= n_docs:
                break
    return docs


@pytest.mark.parametrize(
    "seed,window,min_docs",
    [
        (21, 13, 2),  # the default contract (min/max shortcut branch)
        (22, 3, 2),   # short windows: heavy collision density
        (23, 3, 3),   # the count_distinct branch
        (24, 5, 1),   # degenerate: every window qualifies
    ],
)
def test_dup_span_stats_match_brute_force(spark, seed, window, min_docs):
    from php_ec_spark.operators.dedup import dup_span_stats
    from php_ec_spark.session import release_checkpoint_caches

    docs = _corpus(seed)
    want = _brute(docs, window, min_docs)
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    try:
        got = {
            r.doc_id: (r.n_windows, r.n_dup_windows, r.dup_fraction)
            for r in dup_span_stats(
                df, window=window, min_docs=min_docs
            ).collect()
        }
    finally:
        release_checkpoint_caches(spark)
    assert set(got) == set(want)
    for d in want:
        assert got[d][:2] == want[d][:2], (d, got[d], want[d])
        assert abs(got[d][2] - want[d][2]) < 1e-9, (d, got[d], want[d])
