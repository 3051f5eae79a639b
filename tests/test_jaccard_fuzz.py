"""Randomized differential fuzz for the prefix-filtered Jaccard join.

The driver gate pins `jaccard_pairs` on ONE corpus/threshold/n config;
the prefix + positional + length filters are LOSSLESSNESS claims over
every geometry (the prefix-filtering lemma and the PPJoin overlap cap,
operators/dedup.py:369-457). This fuzz checks them the only way a lemma
application can be checked in code: seeded random corpora with planted
near-dup families and edge docs, swept across threshold / shingle order
/ max_df, compared pair-for-pair and value-for-value against a
brute-force all-pairs Python reference that mirrors the engine's
shingle semantics exactly:

- tokenization is `split(trim(coalesce(text,'')), r'\\s+')` — an
  empty/NULL doc tokenizes to [''] (Spark's split on the empty string),
  NOT to [] as Python's str.split() would;
- docs with < n tokens contribute their whole token sequence as one
  shingle;
- `max_df` drops shingles from the Jaccard SPACE itself (docs whose
  filtered set empties out vanish from the pair universe);
- the emitted value is HALF-UP-rounded to 6 dp and the threshold is
  applied to the ROUNDED value (Spark's F.round, not Python's
  round-half-even).

A filter that over-prunes (loses a true pair) or under-verifies (emits
a sub-threshold pair) on ANY of the seeded geometries fails here long
before a production corpus would reveal it.
"""

from __future__ import annotations

import math
import random
import re

import pytest


def _shingles(text, n: int) -> frozenset:
    """Mirror of operators.dedup.with_shingles for one document."""
    toks = re.split(r"\s+", (text or "").strip())
    if len(toks) < n:
        return frozenset({" ".join(toks)})
    return frozenset(
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    )


def _round6_half_up(x: float) -> float:
    """Spark F.round: HALF_UP at 6 dp (Python round() is half-even)."""
    return math.floor(x * 1e6 + 0.5) / 1e6


def _brute_pairs(docs: dict, threshold: float, n: int, max_df):
    """All-pairs reference: {(a, b): jaccard} over the (max_df-filtered)
    shingle space, thresholded on the 6-dp rounded value like the
    operator's output contract."""
    sets = {d: _shingles(t, n) for d, t in docs.items()}
    if max_df is not None:
        df_count: dict = {}
        for s in sets.values():
            for sh in s:
                df_count[sh] = df_count.get(sh, 0) + 1
        sets = {
            d: frozenset(sh for sh in s if df_count[sh] <= max_df)
            for d, s in sets.items()
        }
    sets = {d: s for d, s in sets.items() if s}  # emptied docs leave the space
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if not inter:
                continue
            j = _round6_half_up(inter / len(sets[a] | sets[b]))
            if j >= threshold:
                out[(a, b)] = j
    return out


def _corpus(seed: int, n_docs: int = 90) -> dict:
    """Random corpus with planted near-dup families and edge docs."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    docs: dict = {}
    doc_id = 0

    def add(text: str) -> None:
        nonlocal doc_id
        docs[doc_id] = text
        doc_id += 1

    # edge docs: NULL, empty, whitespace, single token, token-repeats,
    # an identical-text pair (J = 1.0)
    add(None)
    add("")
    add("   ")
    add("w0")
    add("w1 w1 w1 w1 w1")
    add("w2 w3 w4 w5 w2 w3")
    add("w2 w3 w4 w5 w2 w3")
    # near-dup families: a base doc + mutated copies at varying rates
    while doc_id < n_docs:
        base = [rng.choice(vocab) for _ in range(rng.randint(1, 28))]
        add(" ".join(base))
        for _ in range(rng.randint(0, 3)):
            mut = list(base)
            for _ in range(rng.randint(0, max(1, len(mut) // 4))):
                op = rng.random()
                pos = rng.randrange(len(mut)) if mut else 0
                if op < 0.5 and mut:
                    mut[pos] = rng.choice(vocab)
                elif op < 0.75 and mut:
                    del mut[pos]
                else:
                    mut.insert(pos, rng.choice(vocab))
            add(" ".join(mut) if mut else "")
            if doc_id >= n_docs:
                break
    return docs


@pytest.mark.parametrize(
    "seed,threshold,n,max_df",
    [
        (11, 0.8, 3, None),
        (12, 0.5, 3, None),  # low threshold: long prefixes, many candidates
        (13, 0.8, 2, None),  # bigram space: heavier co-occurrence
        (14, 0.9, 3, None),  # short prefixes: the aggressive-pruning end
        (15, 0.8, 3, 5),     # max_df cut reshapes the Jaccard space itself
        (16, 0.6, 2, 8),
    ],
)
def test_jaccard_pairs_match_brute_force(spark, seed, threshold, n, max_df):
    from php_ec_spark.operators.dedup import jaccard_pairs
    from php_ec_spark.session import release_checkpoint_caches

    docs = _corpus(seed)
    want = _brute_pairs(docs, threshold, n, max_df)
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    try:
        got = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in jaccard_pairs(
                df, threshold=threshold, n=n, max_df=max_df
            ).collect()
        }
    finally:
        release_checkpoint_caches(spark)

    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing, (
        f"prefix/positional filter LOST true pairs {missing[:5]} "
        f"(seed={seed}, t={threshold}, n={n}, max_df={max_df})"
    )
    assert not extra, (
        f"verification emitted sub-threshold pairs {extra[:5]} "
        f"(seed={seed}, t={threshold}, n={n}, max_df={max_df})"
    )
    for pair, j in want.items():
        assert abs(got[pair] - j) < 1e-9, (pair, got[pair], j)
