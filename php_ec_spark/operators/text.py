"""Text-analysis operators — token stats, quality, language-ID, fingerprints.

All operators are pure Spark column expressions: they stay inside
whole-stage codegen, push the text-column projection down to the parquet
scan, and shuffle nothing. Each has an exact ANSI-SQL twin used as the
DuckDB oracle (see queries_pipeline.py), so the arithmetic is chosen to be
bit-identical across engines (integer arithmetic, no float summation).

The reference has no text operators (php-ec is a CEP engine); these cover
the driver's training-data-pipeline requirement over the `documents` table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Modulus for the polynomial rolling fingerprint — Mersenne prime 2^31−1.
#: Keeps ``acc*B + c`` < 2^63 so both Spark and DuckDB stay in exact int64.
FP_MOD = 2_147_483_647
FP_BASE = 31

#: Marker tokens per language for the n-gram/stopword language-ID heuristic.
#: Deliberately tiny and deterministic — the point is a scalable, SQL-
#: expressible classifier shape (per-language marker counts → argmax), not
#: linguistic accuracy.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "es", "y"),
    "de": ("der", "die", "das", "und", "ist"),
}


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_chars / n_tokens / n_unique_tokens / avg token length per document.

    Token count is pure length arithmetic (chars − non-space chars + 1) so
    the DuckDB oracle reproduces it exactly; uniqueness uses
    ``array_distinct`` over the SAME single-space convention — a regex
    ``\\s+`` split here would count MORE unique tokens than n_tokens on
    text with non-space whitespace, pushing quality_score past 1.0 and
    diverging from the oracle's ``string_split(text, ' ')``.
    ``avg_token_len`` is derived from already-exact integers with one
    final division (deterministic double).
    """
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_spaces = (F.length(t) - F.length(F.regexp_replace(t, " ", ""))).cast("long")
    n_tokens = (n_spaces + F.lit(1)).cast("long")
    return (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "n_unique_tokens",
            F.size(F.array_distinct(F.split(t, " "))).cast("long"),
        )
        .withColumn(
            "avg_token_len",
            ((n_chars - n_spaces).cast("double") / n_tokens.cast("double")),
        )
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality score in [0,1]: lexical diversity × length band.

    score = (unique_tokens / tokens) clipped, scaled by whether the doc is
    in a "reasonable length" band (20..2000 tokens). Matches the shape of
    published quality filters (length/stopword/diversity ratios) while
    staying exactly SQL-expressible.
    """
    d = with_token_stats(df, text_col)
    diversity = F.col("n_unique_tokens").cast("double") / F.col("n_tokens").cast("double")
    in_band = (F.col("n_tokens") >= 20) & (F.col("n_tokens") <= 2000)
    return d.withColumn(
        "quality_score",
        F.round(diversity * F.when(in_band, F.lit(1.0)).otherwise(F.lit(0.5)), 6),
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token language ID: count per-language marker hits, argmax.

    Ties and zero-hit documents resolve to 'und' (undetermined) and the
    language keys are checked in sorted order — fully deterministic so the
    DuckDB oracle can reproduce the exact same labels.
    """
    t = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))

    def hits(lang: str) -> Column:
        c: Column = F.lit(0)
        for m in LANG_MARKERS[lang]:
            # occurrence count of ' marker ' via length arithmetic
            pat = f" {m} "
            c = c + (
                (F.length(t) - F.length(F.replace(t, F.lit(pat), F.lit(""))))
                / F.lit(len(pat))
            ).cast("long")
        return c

    langs = sorted(LANG_MARKERS)
    out = df
    for lang in langs:
        out = out.withColumn(f"__hits_{lang}", hits(lang))
    best = F.greatest(*[F.col(f"__hits_{lang}") for lang in langs])
    pred = F.lit("und")
    # first language (sorted order) achieving the max, provided max > 0;
    # build right-to-left so earlier langs win ties
    for lang in reversed(langs):
        pred = F.when((F.col(f"__hits_{lang}") == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return out.withColumn("pred_lang", pred).drop(*[f"__hits_{lang}" for lang in langs])


#: BPE-ish token regex: runs of word chars OR single non-word non-space
#: symbols — approximates subword-tokenizer pre-splitting; kept to a
#: dialect-neutral character-class form so Java (Spark) and RE2-style
#: (DuckDB) engines agree exactly.
BPE_ISH_RE = r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"


def with_bpe_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token count under the BPE-ish regex — the 'how many tokens will the
    tokenizer roughly produce' estimator every training pipeline needs."""
    return df.withColumn(
        "n_bpe_tokens",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_RE), 0)).cast("long"),
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Polynomial rolling-hash fingerprint of the full text, mod 2^31−1.

    fp = fold(chars, acc → (acc*31 + ascii(char)) mod p). Stays in exact
    int64 at every step, so Spark and DuckDB (list_reduce) agree bitwise.
    At scale this is a scan-local expression — no shuffle, no Python.
    """
    chars = F.filter(F.split(F.col(text_col), ""), lambda x: x != "")
    fp = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FP_BASE + F.ascii(c)) % FP_MOD,
    )
    return df.withColumn("fingerprint", fp)


def _top_run(sorted_arr: Column) -> Column:
    """(count, value) of the longest run in a lexicographically sorted array.

    One ``aggregate`` scan with a (prev, run, best, best_val) accumulator;
    strict ``>`` when updating the best means the FIRST maximal run wins,
    i.e. ties break to the lexicographically smallest value — the same
    deterministic tie-break the DuckDB oracle's ``ORDER BY c DESC, v ASC``
    produces. Scan-local: no shuffle, no Python.
    """
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit(None).cast("string").alias("best_val"),
    )

    def step(acc: Column, v: Column) -> Column:
        run = F.when(v == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            v.alias("prev"),
            run.alias("run"),
            F.greatest(run, acc["best"]).alias("best"),
            F.when(run > acc["best"], v).otherwise(acc["best_val"]).alias(
                "best_val"
            ),
        )

    return F.aggregate(sorted_arr, acc0, step)


def with_repetition_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition quality signals.

    Per document: ``n_words``, ``dup_word_frac`` (1 − distinct/total),
    ``top_word`` + ``top_word_frac`` (most frequent word's share, ties to
    the lexicographically smallest word), and ``top_bigram_frac`` (most
    frequent adjacent word-pair's share of the n−1 bigrams; 0.0 for
    single-word docs). High values flag boilerplate / TE-generated /
    looping text — the standard pre-training repetition filters (Gopher's
    "repetition" rule family), re-expressed as pure Spark column
    expressions.

    100 TB design: everything is computed inside one projection over the
    scan via ``sort_array`` + a single-pass ``aggregate`` run-scan per
    document — zero shuffle, zero Python, whole-stage codegen end to end.
    Tokenization splits on a single space to match the corpus conventions
    used by the dedup shingles (see queries_pipeline._SHINGLES).
    """
    t = F.col(text_col)
    words = F.split(t, " ")
    n = F.size(words).cast("long")
    top_w = _top_run(F.sort_array(words))
    bigrams = F.zip_with(
        F.slice(words, 1, n - 1),
        F.slice(words, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    top_b = _top_run(F.sort_array(bigrams))
    return (
        df.withColumn("n_words", n)
        .withColumn(
            "dup_word_frac",
            F.round(
                F.lit(1.0)
                - F.size(F.array_distinct(words)).cast("double") / n,
                6,
            ),
        )
        .withColumn("top_word", top_w["best_val"])
        .withColumn(
            "top_word_frac", F.round(top_w["best"].cast("double") / n, 6)
        )
        .withColumn(
            "top_bigram_frac",
            F.when(n < 2, F.lit(0.0)).otherwise(
                F.round(top_b["best"].cast("double") / (n - 1), 6)
            ),
        )
    )


#: PII scrub patterns, applied IN ORDER (emails first: they contain digit
#: runs the phone pattern would half-eat). Kept to the regex dialect both
#: Java (Spark) and RE2-style (DuckDB) engines interpret identically:
#: plain character classes and bounded quantifiers — no backreferences,
#: no lookaround. Heuristic by design (curation-grade scrubbing, not a
#: compliance tool): a long digit-and-separator run reads as a phone/card
#: number even when it is an invoice id — at corpus scale over-scrubbing
#: identifiers is the right trade for a training set.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    # 9+ digits with optional ()+-. / space separators, digit-anchored at
    # both ends: phone and card shapes without eating short numbers
    ("phone", r"\+?[0-9][0-9()\-. ]{7,}[0-9]\b", "<PHONE>"),
)


def scrub_pii(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Replace emails / IPv4 addresses / long phone-or-card digit runs
    with placeholder tokens — the standard pre-training scrub stage
    (CCNet/Dolma-style), as pure chained ``regexp_replace`` column
    expressions: whole-stage codegen, zero shuffle, linear in bytes.

    ``out_col=None`` scrubs in place; otherwise the original column is
    kept and the scrubbed text lands in ``out_col``. Also appends
    ``pii_matches`` — how many placeholders the scrub left, the cheap
    audit signal (docs saturated with PII usually want dropping, not
    scrubbing). Patterns are engine-portable (:data:`PII_PATTERNS`);
    the DuckDB twin is pinned in tests/test_pipeline_ops.py.
    """
    target = out_col or text_col
    scrubbed = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    d = df.withColumn(target, scrubbed)
    n_ph = sum(
        (
            F.length(F.col(target))
            - F.length(F.regexp_replace(F.col(target), F.lit(repl), F.lit("")))
        )
        / len(repl)
        for _, _, repl in PII_PATTERNS
    )
    return d.withColumn(
        "pii_matches", F.coalesce(n_ph.cast("long"), F.lit(0))
    )


#: Query parameters dropped by :func:`normalize_url` — tracking/session
#: junk that makes byte-identical pages look distinct to URL-keyed dedup.
#: One RE2∩Java-safe alternation, anchored at the parameter name.
URL_TRACKING_RE = (
    r"^(utm_[a-z]+|fbclid|gclid|msclkid|mc_cid|mc_eid|igshid|ref_src)="
)


def normalize_url(
    df: DataFrame,
    url_col: str = "url",
    out_col: str | None = None,
    strip_www: bool = True,
) -> DataFrame:
    """Canonicalize a URL column for identity use — the standard crawl
    convention: lowercase scheme+host (path/query case is significant),
    assume ``http`` when the scheme is missing, drop the fragment and
    userinfo, drop the scheme's default port (http:80 / https:443, other
    ports kept), optionally strip a leading ``www.``, collapse duplicate
    and trailing slashes in the path, drop tracking parameters
    (:data:`URL_TRACKING_RE`) and empty parameters, and SORT the
    surviving query parameters — so the same logical page fetched via
    differently-ordered or tracking-suffixed URLs gets one canonical
    string.

    Built for ``dedup_digest(key_cols=[out_col])`` /
    ``dedup_index_build(key_cols=...)``: URL-keyed dedup of a crawl
    should key on THIS column, not the raw fetch URL. Pure column
    expressions (regex chain + split/filter/array_sort — whole-stage
    codegen, zero shuffle); the DuckDB twin is pinned byte-identical in
    tests/test_pipeline_ops.py. NULL stays NULL; non-URL garbage
    normalizes deterministically (garbage in, canonical garbage out).
    ``out_col`` defaults to ``{url_col}_norm`` — identity columns should
    not silently overwrite the raw fetch URL.
    """
    target = out_col or f"{url_col}_norm"
    u = F.regexp_replace(F.trim(F.col(url_col)), r"#.*$", "")
    # protocol-relative hrefs ('//host/path', common in crawl data) get
    # the default scheme — otherwise the host would parse as empty and
    # fold into the path ('http:///host/path'), never unifying with the
    # absolute form
    u = F.when(u.rlike(r"^//"), F.concat(F.lit("http:"), u)).otherwise(u)
    scheme0 = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    scheme = F.when(scheme0 == "", F.lit("http")).otherwise(scheme0)
    rest = F.regexp_replace(
        F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", ""),
        r"^[^/?@]*@",
        "",
    )
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_replace(
        F.regexp_replace(F.regexp_extract(pathq, r"^([^?]*)", 1), r"//+", "/"),
        r"/+$",
        "",
    )
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(URL_TRACKING_RE),
    )
    q = F.array_join(F.array_sort(params), "&")
    return df.withColumn(
        target,
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
        ),
    )


def split_documents(
    df: DataFrame,
    max_tokens: int = 512,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split long documents into ``max_tokens``-token chunks with
    ``overlap`` tokens of context carried between consecutive chunks —
    the pre-packing step every training pipeline runs on long-form
    sources (books, code files) so no single document dominates a
    sequence and context windows see coherent pieces.

    Semantics, precisely: tokens are the ``\\s+`` whitespace convention
    (``split(trim(coalesce(text,'')), '\\s+')`` — the
    :func:`~php_ec_spark.operators.dedup.dup_span_stats` / shingle
    family; NOTE this differs from ``pack_sequences``' default
    single-space count on text with irregular whitespace — see the
    composition recipe below).
    Documents with at most ``max_tokens`` tokens come back as ONE chunk
    with their text VERBATIM (bytes untouched, NULL stays NULL — so the
    operator is safe upstream of byte-exact dedup digests for every
    document it does not split). Longer documents emit chunks starting
    every ``stride = max_tokens - overlap`` tokens: chunk k covers
    1-based token positions ``[k*stride + 1, k*stride + max_tokens]``,
    rebuilt single-space joined (affected documents lose their original
    whitespace — the :func:`~php_ec_spark.operators.dedup.remove_dup_spans`
    caveat applies); the last chunk is shorter but always carries at
    least one token not in the previous chunk, and together the chunks
    cover every token. Output: ``(id_col, chunk_id, text, n_tokens,
    start_token)``, chunk_id 0-based, start_token 1-based, ``n_tokens``
    the CHUNK's token count (0 for NULL and for WHITESPACE-ONLY text —
    ``split('', '\\s+')`` yields ``['']`` and would otherwise smuggle
    phantom tokens into ``token_col`` packing — matching the packing/
    sampling NULL contract; the chunk text stays byte-verbatim).

    Scale shape: one scan-local generate per document — no shuffle, no
    Python, exact integer arithmetic throughout (chunk counts via DIV,
    never float ceil), so chunk membership is reproducible across
    engines and partitionings.

    Composition with the packer (``pack_sequences`` takes ONE unique id
    column, so derive a chunk key, and pass THIS operator's counts so
    the units agree — verbatim short docs with irregular whitespace
    would otherwise re-count differently under the packer's
    single-space default)::

        chunks = split_documents(docs, max_tokens=512)
        packed = pack_sequences(
            chunks.withColumn("cid", F.col("doc_id") * 10_000 + F.col("chunk_id")),
            id_col="cid", token_col="n_tokens",
        )
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap must be in [0, max_tokens), got {overlap} "
            f"(max_tokens={max_tokens})"
        )
    stride = max_tokens - overlap
    d = df.select(
        F.col(id_col),
        F.col(text_col),
        F.split(
            F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"
        ).alias("__toks"),
    )
    n = F.size(F.col("__toks"))
    # exact-integer chunk count: 1 + ceil((n - max) / stride) for long
    # docs, computed as (n - max + stride - 1) DIV stride (SQL DIV —
    # a float ceil would lose exactness on huge token counts)
    n_chunks = F.when(n <= max_tokens, F.lit(1).cast("long")).otherwise(
        F.lit(1)
        + F.expr(
            f"(size(__toks) - {max_tokens} + {stride - 1}) DIV {stride}"
        )
    )
    chunks = F.sequence(F.lit(0).cast("long"), n_chunks - 1)
    e = d.select(
        F.col(id_col),
        F.col(text_col),
        F.col("__toks"),
        n.alias("__n"),
        F.explode(chunks).alias("__k"),
    )
    start = (F.col("__k") * stride + 1).cast("long")
    chunk_text = F.when(
        F.col("__n") <= max_tokens, F.col(text_col)
    ).otherwise(
        F.array_join(F.slice(F.col("__toks"), start.cast("int"), max_tokens), " ")
    )
    # NULL and whitespace-only text both count ZERO tokens
    # (split('','\s+') yields [''] — without the guard an empty doc
    # would flow phantom tokens into token_col packing; the regex, not
    # trim(), because SQL trim strips only SPACES and a tab-only doc
    # would slip through as 2 tokens); chunk text stays byte-verbatim
    chunk_n = F.when(
        F.col(text_col).isNull()
        | F.col(text_col).rlike(r"^\s*$"),
        F.lit(0),
    ).otherwise(F.least(F.lit(max_tokens), F.col("__n") - start + 1))
    return e.select(
        F.col(id_col),
        F.col("__k").cast("int").alias("chunk_id"),
        chunk_text.alias(text_col),
        chunk_n.cast("long").alias("n_tokens"),
        start.alias("start_token"),
    )
