"""Text analysis operators: shingling, stats, quality, language ID,
fingerprinting.

All JVM-side (regexp + array higher-order functions) — no Python in the
row path, so these run at scan speed and stay inside whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd  # module-level: pandas_udf type hints resolve against module globals
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_mapreduce_spark.functions.scalar import dround, tokenize

#: Tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic. Deliberately small and deterministic — the operator pattern
#: (broadcast stopwords -> token join -> per-doc argmax) is the product;
#: swap in real lists for production.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "que", "es"),
    "fr": ("le", "la", "les", "et", "est"),
}


def shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, distinct word n-gram shingles) — the substrate for Jaccard /
    MinHash dedup.

    Implemented as ONE Catalyst regex pass: join the tokens with single
    spaces, then extract every overlapping n-token window with a
    lookahead capture — ``(?=(tok tok tok))tok`` matches once per window
    start and captures the whole window without consuming it. Stays
    inside whole-stage codegen with zero per-row object conversion.

    Two rejected alternatives, both measured much slower here:
    ``transform(sequence, i -> slice(...))`` (higher-order-function
    lambdas evaluate interpreted per element — O(tokens^2) object churn,
    ~75x), and pyspark.ml.feature.NGram (a ScalaUDF whose
    ExpressionEncoder boxes every token to java.lang.String and back per
    row — the per-row cost is dominated by conversion, not the n-gram
    scan).
    """
    if n == 1:
        # The lookahead pattern below consumes "token + separator" per
        # window start, which silently drops the final token when n=1
        # (no trailing separator) — unigram shingles are just the tokens.
        return df.select(
            F.col(id_col).alias("id"),
            F.array_distinct(tokenize(text_col)).alias("shingles"),
        )
    token, sep = "[a-z]+", " "
    window = sep.join([token] * n)
    pattern = f"(?=({window})){token}{sep}"
    joined = F.array_join(tokenize(text_col), sep)
    grams = F.regexp_extract_all(joined, F.lit(pattern), F.lit(1))
    return df.select(F.col(id_col).alias("id"), F.array_distinct(grams).alias("shingles"))


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document stats: chars, tokens, alpha/punct ratios, stopword
    ratio — the standard quality-filter signals."""
    safe = F.coalesce(F.col(text_col), F.lit(""))  # NULL text = empty doc
    lower = F.lower(safe)
    toks = tokenize(text_col)
    n_chars = F.length(safe).cast("long")
    n_alpha = F.length(F.regexp_replace(lower, "[^a-z]", "")).cast("long")
    n_punct = F.length(F.regexp_replace(lower, "[a-z ]", "")).cast("long")
    en = STOPWORDS["en"]
    stop_count = F.size(F.filter(toks, lambda t: t.isin(*en))).cast("long")
    n_toks = F.size(toks).cast("long")
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_toks.alias("n_tokens"),
        dround(n_alpha / F.greatest(n_toks, F.lit(1)), 4).alias("avg_token_len"),
        dround(n_punct / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
        dround(stop_count / F.greatest(n_toks, F.lit(1)), 4).alias("stopword_ratio"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Composite quality score in [0, 1]: length saturation + low
    punctuation + natural stopword density. Deterministic arithmetic —
    reproducible across engines and runs."""
    stats = text_stats(df, id_col, text_col)
    score = (
        0.4 * F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
        + 0.3 * (F.lit(1.0) - F.col("punct_ratio"))
        + 0.3 * F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0))
    )
    return stats.select(F.col(id_col), dround(score, 4).alias("quality"))


def language_id_pred(toks_col: str | Column) -> Column:
    """Stopword-vote language prediction over an ALREADY-TOKENIZED array
    column, as a pure projection expression — per-language hit counts
    are array size/filter over the fixed 21-word STOPWORDS table
    (whole-stage codegen), the argmax is a struct ``greatest`` (max
    hits, ties broken by the alphabetically-first language — langs are
    iterated sorted and encoded as NEGATED indices so the struct
    comparison's second field picks the smallest index), zero hits ->
    'unknown'. A word in several languages' stopword lists counts for
    each, exactly like the old vote join."""
    toks = F.col(toks_col) if isinstance(toks_col, str) else toks_col
    langs = sorted(STOPWORDS)

    def _hits(words: tuple[str, ...]) -> Column:
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    best = F.greatest(
        *[
            F.struct(_hits(STOPWORDS[lg]).alias("h"), F.lit(-i).alias("ni"))
            for i, lg in enumerate(langs)
        ]
    )
    lang_arr = F.array(*[F.lit(lg) for lg in langs])
    return F.when(
        best["h"] > 0, F.element_at(lang_arr, -best["ni"] + F.lit(1))
    ).otherwise(F.lit("unknown"))


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-vote language ID.

    The stopword vocabulary is a FIXED tiny table, so the whole vote —
    per-language hit counts, argmax with ties broken by language code,
    no hits -> 'unknown' — evaluates as a single projection
    (:func:`language_id_pred`): no explode, no join, no per-doc
    shuffle, no window, at any corpus scale. The r10 shape (token
    explode -> broadcast stopword join -> (doc, lang) agg -> rank-1
    window -> left join back) spent two exchanges and four jobs
    computing what each row can answer locally.
    """
    base = df.select(F.col(id_col), tokenize(text_col).alias("__toks"))
    return base.select(
        F.col(id_col), language_id_pred("__toks").alias("pred_lang")
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace-normalized MD5 document fingerprint — the exact-dedup
    key that survives formatting noise."""
    normalized = F.trim(
        F.regexp_replace(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " ")
    )  # NULL text = empty doc: fingerprints as md5('')
    return df.select(F.col(id_col), F.md5(normalized).alias("fp"))


def token_counts(df: DataFrame, group_cols: Sequence[str], text_col: str) -> DataFrame:
    """Total token counts per group (corpus accounting)."""
    return df.groupBy(*group_cols).agg(
        F.sum(F.size(tokenize(text_col))).cast("long").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token windows — the chunking
    step before embedding/sequence-packing in a training pipeline.

    One row per chunk: (id, chunk_no, chunk_text, n_chunk_tokens).
    Chunk i covers tokens [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; every document yields at least one
    chunk. Pure Catalyst expressions; the per-document HOF transform
    iterates over CHUNK COUNTS (a handful per doc), not tokens, so the
    interpreted-lambda penalty documented in shingle_sets does not bite.
    """
    stride = chunk_tokens - overlap
    toks = tokenize(text_col)
    n = F.size(toks)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)).cast("double") / F.lit(stride)).cast("long"),
        F.lit(1).cast("long"),
    )
    chunks = F.transform(
        F.sequence(F.lit(0).cast("long"), n_chunks - 1),
        lambda i: F.slice(toks, (i * stride + 1).cast("int"), chunk_tokens),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.posexplode(chunks).alias("chunk_no", "c"))
        .select(
            "id",
            F.col("chunk_no").cast("long").alias("chunk_no"),
            F.array_join("c", " ").alias("chunk_text"),
            F.size("c").cast("long").alias("n_chunk_tokens"),
        )
    )


#: BPE-style pre-tokenizer segments (subword accounting): letter runs,
#: single digits, single non-space punctuation — the GPT-2 pre-tokenizer
#: shape, restricted to RE2-safe constructs so DuckDB oracles can replay
#: it (RE2 has no lookaround/unicode property classes).
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"


def bpe_token_counts(df: DataFrame, group_cols: Sequence[str], text_col: str) -> DataFrame:
    """Subword-style token accounting per group — the budget number an
    LLM-training pipeline actually tracks (whitespace words undercount
    punctuation/digit-heavy text)."""
    safe_text = F.coalesce(F.col(text_col), F.lit(""))  # NULL text = empty doc
    n = F.size(F.regexp_extract_all(safe_text, F.lit(BPE_ISH_PATTERN), F.lit(0)))
    return df.groupBy(*group_cols).agg(
        F.sum(n).cast("long").alias("total_bpe_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str, n: int = 2) -> DataFrame:
    """Per-document intra-repetition: total vs distinct word n-grams and
    the duplicate fraction — the Gopher/C4-style quality filter that
    drops boilerplate and degenerate (looping) generations. Beyond the
    reference surface (SURVEY.md §2.2 north-star extensions).

    Same one-regex-pass n-gram extraction as :func:`shingle_sets`, kept
    UN-deduplicated so the duplicate fraction is measurable; stays inside
    whole-stage codegen. At 100 TB this is a pure map — no shuffle.
    """
    token, sep = "[a-z]+", " "
    if n == 1:
        grams = tokenize(text_col)
    else:
        window = sep.join([token] * n)
        pattern = f"(?=({window})){token}{sep}"
        grams = F.regexp_extract_all(
            F.array_join(tokenize(text_col), sep), F.lit(pattern), F.lit(1)
        )
    n_grams = F.size(grams).cast("long")
    n_distinct = F.size(F.array_distinct(grams)).cast("long")
    return df.select(
        F.col(id_col).alias("id"),
        n_grams.alias("n_grams"),
        n_distinct.alias("n_distinct"),
        dround(
            (n_grams - n_distinct) / F.greatest(n_grams, F.lit(1)).cast("double"), 4
        ).alias("rep_ratio"),
    )


def gopher_quality_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_tok_len: float = 3.0,
    max_tok_len: float = 10.0,
    max_punct_ratio: float = 0.1,
    min_stop_hits: int = 2,
    max_rep_ratio: float = 0.2,
) -> DataFrame:
    """Gopher-style composite document filter: the standard rule bundle
    (Rae et al., Gopher appendix A1.1) that gates web text before
    training — token-count band, mean-token-length band, symbol ratio,
    minimum stopword evidence, and duplicate-2-gram repetition — emitted
    as per-rule flags plus the combined ``keep`` verdict so the audit
    (which rule fires how often) falls out of the same pass as the
    filter. Beyond the reference surface (SURVEY.md §2.2 north-star
    extensions).

    Thresholds default to corpus-appropriate adaptations of the Gopher
    values (the published 50-token floor would drop this synthetic
    corpus entirely); all are caller-tunable.

    Pure Catalyst expressions over ONE tokenization — a map with no
    shuffle at any scale; the 2-gram repetition signal reuses the
    one-regex-pass extraction documented in :func:`shingle_sets`.
    """
    safe = F.coalesce(F.col(text_col), F.lit(""))  # NULL text = empty doc
    toks = tokenize(text_col)
    n_toks = F.size(toks).cast("long")
    n_tok_chars = F.length(F.array_join(toks, "")).cast("long")
    mean_tok_len = dround(n_tok_chars / F.greatest(n_toks, F.lit(1)).cast("double"), 4)
    n_chars = F.length(safe)
    n_punct = F.length(F.regexp_replace(F.lower(safe), "[a-z ]", ""))
    punct_ratio = dround(n_punct / F.greatest(n_chars, F.lit(1)).cast("double"), 4)
    en = STOPWORDS["en"]
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*en))).cast("long")
    # Duplicate-2-gram fraction (same extraction as repetition_stats n=2).
    pattern = r"(?=([a-z]+ [a-z]+))[a-z]+ "
    grams = F.regexp_extract_all(F.array_join(toks, " "), F.lit(pattern), F.lit(1))
    n_grams = F.size(grams).cast("long")
    rep_ratio = dround(
        (n_grams - F.size(F.array_distinct(grams)))
        / F.greatest(n_grams, F.lit(1)).cast("double"),
        4,
    )
    ok_len = (n_toks >= min_tokens) & (n_toks <= max_tokens)
    ok_tok_len = (mean_tok_len >= min_tok_len) & (mean_tok_len <= max_tok_len)
    ok_punct = punct_ratio <= max_punct_ratio
    ok_stop = stop_hits >= min_stop_hits
    ok_rep = rep_ratio <= max_rep_ratio
    return df.select(
        F.col(id_col).alias("id"),
        n_toks.alias("n_tokens"),
        mean_tok_len.alias("mean_tok_len"),
        punct_ratio.alias("punct_ratio"),
        stop_hits.alias("stop_hits"),
        rep_ratio.alias("rep_ratio"),
        ok_len.alias("ok_len"),
        ok_tok_len.alias("ok_tok_len"),
        ok_punct.alias("ok_punct"),
        ok_stop.alias("ok_stop"),
        ok_rep.alias("ok_rep"),
        (ok_len & ok_tok_len & ok_punct & ok_stop & ok_rep).alias("keep"),
    )


def ngram_contamination(
    corpus: DataFrame,
    eval_set: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """Benchmark-contamination check: per corpus document, the fraction
    of its distinct word n-grams that appear anywhere in ``eval_set`` —
    the standard train/test-overlap audit run before training. Beyond
    the reference surface (SURVEY.md §2.2 north-star extensions).

    Plan shape for 100 TB: the eval side is benchmark-sized by contract,
    so its distinct n-gram set is BROADCAST and the corpus streams
    through a map-side hash join — the corpus is scanned once, never
    shuffled on text; the only shuffle is the per-doc count aggregation
    keyed by doc id. Long n-grams (default 8) make background collisions
    negligible, so nonzero overlap means genuine leakage.
    """
    ev = (
        shingle_sets(eval_set, id_col, text_col, n)
        .select(F.explode("shingles").alias("g"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    # ONE corpus pass: carry the per-doc gram count alongside the
    # exploded grams (explode_outer keeps gram-less docs, whose null
    # gram never matches the eval side), tag hits via the broadcast
    # join, and aggregate both counts in the same shuffle. A separate
    # sizes-frame join would re-run the n-gram extraction — the most
    # expensive stage — a second time over the whole corpus.
    posts = shingle_sets(corpus, id_col, text_col, n).select(
        "id",
        F.size("shingles").cast("long").alias("n_grams"),
        F.explode_outer("shingles").alias("g"),
    )
    tagged = posts.join(F.broadcast(ev), "g", "left")
    return tagged.groupBy("id").agg(
        F.max("n_grams").alias("n_grams"),
        F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_contaminated"),
    ).select(
        "id",
        "n_grams",
        "n_contaminated",
        dround(
            F.col("n_contaminated") / F.greatest("n_grams", F.lit(1)).cast("double"), 4
        ).alias("contamination"),
    )


def tfidf_topk(df: DataFrame, id_col: str, text_col: str, *, k: int = 5) -> DataFrame:
    """Per-document top-k keywords by smoothed TF-IDF — the standard
    keyword-extraction / doc-representation step in a corpus pipeline.
    Beyond the reference surface (SURVEY.md §2.2 north-star extensions).

    score = tf * (ln((N + 1) / (df + 1)) + 1), rounded to 4 decimals so
    the ranking grid is identical across engines; ties break on term.
    Output: (id, rn, term, tf, df, score), rn = 1..k.

    Plan shape for 100 TB: two key-partitioned aggregations — term
    frequency keyed by (doc, term), document frequency keyed by term —
    joined back on term (a shuffle join; the vocabulary is corpus-scale,
    never collected), the 1-row corpus count broadcast, and the top-k
    window partitioned BY DOC id, so no single-task stage anywhere.
    The tf frame is lazily localCheckpoint'ed because BOTH the score
    branch and the df branch consume it: without the cut, Catalyst
    column-prunes the df branch's copy into a *different* subtree (the
    unused count drops out), ReuseExchange can't fire, and the corpus —
    the expensive regex-explode stage — is scanned and exploded twice
    (verified on the executed plan). The checkpoint materializes the
    small post-agg (doc, term, tf) frame once; tokens never hit disk.
    """
    from pyspark.sql.window import Window  # noqa: PLC0415

    toks = df.select(F.col(id_col).alias("id"), F.explode(tokenize(text_col)).alias("term"))
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    tf = tf.localCheckpoint(eager=False)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("__n"))
    idf = F.log((F.col("__n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", dround(F.col("tf") * idf, 4))
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("id", "rn", "term", "tf", "df", "score")
    )


def vocab_coverage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    *,
    vocab_size: int = 1000,
) -> DataFrame:
    """Top-N corpus vocabulary + per-group out-of-vocabulary rates — the
    tokenizer-coverage audit run before committing a vocab: how much of
    each source/language would an N-term vocabulary fail to cover?
    Beyond the reference surface (SURVEY.md §2.2 north-star extensions).

    The vocabulary is the ``vocab_size`` most frequent tokens (ties on
    term), selected with TakeOrdered semantics (orderBy+limit — no full
    sort materialized) and BROADCAST back onto the doc-term counts
    (vocab_size is caller-bounded by contract, the corpus side never
    shuffles on term). Output per group: total/oov token counts, oov
    rate, and the count of docs contributing >= 1 token.

    Both the vocab branch and the coverage branch consume the same
    doc-term counts, so that frame is pre-aggregated ONCE — one row per
    (doc, group, term), weighted by its in-doc count — and lazily
    localCheckpoint'ed; without the cut Catalyst re-explodes the whole
    corpus for each branch (same finding as :func:`tfidf_topk`). The
    raw token stream itself is never materialized.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("__grp"),
        F.explode(tokenize(text_col)).alias("term"),
    )
    tf = toks.groupBy("id", "__grp", "term").agg(F.count(F.lit(1)).alias("cnt"))
    tf = tf.localCheckpoint(eager=False)
    vocab = (
        tf.groupBy("term")
        .agg(F.sum("cnt").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("term"))
        .limit(vocab_size)
        .select("term", F.lit(1).alias("__in_vocab"))
    )
    oov = F.sum(F.when(F.col("__in_vocab").isNull(), F.col("cnt")).otherwise(0)).cast("long")
    return (
        tf.join(F.broadcast(vocab), "term", "left")
        .groupBy("__grp")
        .agg(
            F.sum("cnt").cast("long").alias("total_tokens"),
            oov.alias("oov_tokens"),
            F.count_distinct("id").cast("long").alias("n_docs"),
        )
        .select(
            F.col("__grp").alias(group_col),
            "total_tokens",
            "oov_tokens",
            dround(
                F.col("oov_tokens") / F.greatest("total_tokens", F.lit(1)).cast("double"), 4
            ).alias("oov_rate"),
            "n_docs",
        )
    )


def pseudonymize(df: DataFrame, cols: Sequence[str], secret: str) -> DataFrame:
    """Keyed deterministic pseudonymization: replace each identifier
    column with ``sha256(secret || value)`` (lowercase hex) — the
    privacy step that strips direct identifiers while PRESERVING join
    and group-by integrity: equal inputs map to equal tokens on every
    table sharing the secret, so keyed joins still line up after
    scrubbing. Rotating the secret unlinkably re-deals every token.
    Beyond the reference surface (SURVEY.md §2.2 north-star extensions).

    A pure projection — no shuffle, no UDF, no state at any scale; the
    hash runs inside whole-stage codegen. NULLs stay NULL (a token for
    NULL would create a fake join key).
    """
    out = df
    for c in cols:
        token = F.sha2(F.concat(F.lit(secret), F.col(c).cast("string")), 256)
        out = out.withColumn(c, F.when(F.col(c).isNotNull(), token))
    return out


#: PII patterns chosen to parse identically under Java regex (Spark) and
#: RE2 (DuckDB): plain character classes, no backrefs or lookaround.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+1-555-[0-9]{4}"


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document PII detection + redaction: email and NANP-style
    phone spans are counted and replaced with typed placeholders; emits
    (id, n_emails, n_phones, redacted_len, redacted text). Beyond the
    reference surface (SURVEY.md §2.2 north-star extensions).

    Pure Catalyst regexp pass — a map with no shuffle at any scale. The
    pattern set is deliberately small and deterministic; the operator
    shape (count + replace + audit columns) is the product — swap in
    production pattern packs (SSNs, IBANs, addresses) the same way.
    """
    text = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL), F.lit(0))).cast("long")
    n_phones = F.size(F.regexp_extract_all(text, F.lit(PII_PHONE), F.lit(0))).cast("long")
    redacted = F.regexp_replace(
        F.regexp_replace(text, PII_EMAIL, "<EMAIL>"), PII_PHONE, "<PHONE>"
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        F.length(redacted).cast("long").alias("redacted_len"),
        redacted.alias("redacted"),
    )


#: Invisible codepoints :func:`clean_text` strips outright: zero-width
#: space/joiners, BOM, soft hyphen — they poison tokenization and dedup
#: fingerprints while rendering as nothing. Embedded as literal
#: codepoints so the identical class works under Java regex and RE2.
ZERO_WIDTH_CLASS = "[\u200b\u200c\u200d\ufeff\u00ad]"
#: Control characters (incl. tab/newline/bell) normalized to a space
#: before whitespace collapsing. ``\xNN`` escapes parse identically in
#: Java regex and RE2.
CONTROL_CLASS = r"[\x00-\x1F\x7F]"


def clean_text(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Text normalization: strip invisible codepoints, map control
    characters to spaces, collapse whitespace runs, trim — the cleanup
    pass run before tokenization/dedup so that byte-level noise (BOMs,
    soft hyphens, stray control chars, ragged spacing) cannot split
    tokens or perturb fingerprints. Beyond the reference surface
    (SURVEY.md §2.2 north-star extensions).

    Emits (id, raw_len, clean_len, clean). A pure Catalyst regexp chain
    — a map with no shuffle, no UDF at any scale; NULL text follows the
    engine-wide NULL-text-is-empty-document rule. The final collapse
    matches literal ``' +'`` (not ``\\s+``) because the control pass has
    already normalized every exotic whitespace to plain spaces — keeping
    the chain inside the Java-regex/RE2 common subset.
    """
    raw = F.coalesce(F.col(text_col), F.lit(""))
    t = F.regexp_replace(raw, ZERO_WIDTH_CLASS, "")
    t = F.regexp_replace(t, CONTROL_CLASS, " ")
    t = F.trim(F.regexp_replace(t, " +", " "))
    return df.select(
        F.col(id_col).alias("id"),
        F.length(raw).cast("long").alias("raw_len"),
        F.length(t).cast("long").alias("clean_len"),
        t.alias("clean"),
    )


def hashed_feature_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: DataFrame,
    *,
    buckets: int = 1024,
    bias: float = 0.0,
) -> DataFrame:
    """Hashed-feature linear text classifier scoring (the fastText /
    hashing-trick shape): each token hashes into one of ``buckets``
    feature buckets, the model is a (bucket, weight) table, and a
    document's score is ``bias + mean(weight over its tokens)`` — the
    model-based quality-filter step of a training pipeline (swap in
    real trained weights; the scoring plumbing is identical). Beyond
    the reference surface (SURVEY.md §2.2 north-star extensions).

    Emits (id, n_tokens, score, keep) with ``keep = score > 0``.

    Scale shape: tokens explode NARROW (id, bucket); the weight table
    (``buckets`` rows) broadcast-joins onto them; the per-doc mean is a
    hash agg whose partial (map-side) combine collapses the exploded
    stream back to ~one row per document BEFORE the shuffle — so the
    wire carries documents, not tokens. Bucketing uses the first 4 hex
    chars of md5 (reproducible in any engine); weights sum in
    DECIMAL(18,6) so the score is exact and associative at any
    parallelism (see functions/scalar.py::dsum), with one IEEE division
    at the end. Tokens whose bucket has no weight row contribute 0.
    Empty/NULL documents score exactly ``bias``.
    """
    n_b = int(buckets)
    toks = df.select(
        F.col(id_col).alias("id"), F.explode_outer(tokenize(F.col(text_col))).alias("tok")
    )
    bucketed = toks.withColumn(
        "bucket",
        F.pmod(F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("long"), F.lit(n_b)),
    )
    w = weights.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("weight").cast("decimal(18,6)").alias("__w"),
    )
    per = (
        bucketed.join(F.broadcast(w), "bucket", "left")
        .groupBy("id")
        .agg(
            F.count("tok").cast("long").alias("n_tokens"),
            F.coalesce(F.sum("__w"), F.lit(0).cast("decimal(18,6)")).alias("__sumw"),
        )
    )
    score = F.lit(float(bias)) + (
        F.col("__sumw").cast("double") / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")
    )
    return per.select(
        "id",
        "n_tokens",
        dround(score, 4).alias("score"),
        (score > 0).alias("keep"),
    )


def md5_weights(df_range: DataFrame, *, salt: str = "w") -> DataFrame:
    """Deterministic pseudo-weight table for :func:`hashed_feature_score`
    demos/tests: weight(bucket) = md5-derived uniform value in [-1, 1),
    rounded to 6 decimals — reproducible in any engine (the registry
    oracle replays the same rule in SQL). ``df_range`` supplies one row
    per bucket with a ``bucket`` column (e.g. ``spark.range(n)
    .withColumnRenamed('id', 'bucket')``). A real pipeline replaces this
    with trained weights loaded from storage; the scoring operator is
    agnostic.
    """
    b = F.col("bucket").cast("string")
    frac = F.conv(F.substring(F.md5(F.concat(F.lit(salt), b)), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(4294967296.0)
    return df_range.select(
        F.col("bucket").cast("long").alias("bucket"),
        dround(frac * 2.0 - 1.0, 6).alias("weight"),
    )


def segment_dedup(
    df: DataFrame, id_col: str, text_col: str, *, seg_tokens: int = 8
) -> DataFrame:
    """C4/CCNet-style duplicate-SEGMENT removal with document
    reassembly: split every document into disjoint ``seg_tokens``-token
    segments, keep only the globally FIRST occurrence of each distinct
    segment (smallest (doc_id, position)), and rebuild each document
    from its surviving segments in order — the line/paragraph dedup
    pass that strips boilerplate repeated across pages while leaving
    unique content intact (C4 did this per line; this corpus has no
    line structure, so the unit is a fixed token window). Beyond the
    reference surface (SURVEY.md §2.2 north-star extensions).

    Emits (id, n_segments, n_kept, text_dedup); empty/NULL documents
    survive with 0/0 and empty text.

    Scale shape: segments explode narrowly; the first-occurrence vote
    is a groupBy on md5(segment) — 32-hex keys cross the wire, never
    raw text twice — whose min(struct(id, pos)) partially aggregates
    map-side, so even a boilerplate segment shared by millions of
    documents contributes one row per partition to the shuffle (no hot
    -key stall). Reassembly shuffles only KEPT segments, keyed by doc.
    """
    seg = int(seg_tokens)
    base = df.select(
        F.col(id_col).cast("long").alias("id"), tokenize(F.col(text_col)).alias("toks")
    ).withColumn("nseg", F.ceil(F.size("toks") / F.lit(float(seg))).cast("int"))
    segs = base.select(
        "id",
        F.posexplode_outer(
            F.when(
                F.col("nseg") > 0,
                F.transform(
                    F.sequence(F.lit(0), F.col("nseg") - 1),
                    lambda i: F.array_join(F.slice("toks", i * seg + 1, seg), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos", "seg"),
    )
    # segs feeds the win vote, the keep join AND the per-doc counts (3
    # replays of the tokenize+explode pass uncut); one cut runs it once.
    segs = segs.localCheckpoint(eager=False)
    real = segs.filter(F.col("seg").isNotNull()).withColumn("gh", F.md5("seg"))
    wins = real.groupBy("gh").agg(F.min(F.struct("id", "pos")).alias("w"))
    kept = (
        real.join(wins, "gh")
        .filter((F.col("id") == F.col("w.id")) & (F.col("pos") == F.col("w.pos")))
        .select("id", "pos", "seg")
    )
    rebuilt = kept.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "seg"))), lambda s: s["seg"]
            ),
            " ",
        ).alias("text_dedup"),
    )
    counts = segs.groupBy("id").agg(F.count("seg").cast("long").alias("n_segments"))
    return counts.join(rebuilt, "id", "left").select(
        "id",
        "n_segments",
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
    )


def bigram_lm_score(df: DataFrame, id_col: str, text_col: str, *, k: float = 0.5) -> DataFrame:
    """Corpus-trained bigram language-model perplexity per document —
    the CCNet/KenLM-style "perplexity filter" quality signal, with the
    LM trained ON the corpus itself in the same job (no external model
    artifact): documents whose token transitions are improbable under
    the corpus's own bigram statistics (gibberish, boilerplate soup,
    wrong-language fragments) surface with high perplexity. Beyond the
    reference surface (SURVEY.md §2.2 north-star extensions).

    Model: add-k smoothing over SEEN CONTEXTS — p(w2|w1) =
    (c(w1 w2) + k) / (c(w1 ·) + k * V) with V = number of distinct
    bigram contexts (distinct first tokens), so every count derives
    from ONE bigram aggregation and training is a single corpus pass.
    Emits (id, n_bigrams, avg_logp, ppl) with ppl = exp(-avg_logp);
    documents with < 2 tokens carry NULL scores.

    Scale shape: bigrams explode narrowly; c(w1 w2) is one term-keyed
    agg, c(w1 ·) and V re-aggregate FROM it (no second corpus pass);
    scoring joins the exploded stream to the (lazily checkpointed,
    vocabulary-sized) count frames on the bigram key; the per-doc
    average partially aggregates map-side. Determinism: each bigram's
    log-prob is rounded to 1e-6 and summed in DECIMAL(18,6) — exact
    and associative at any parallelism, reproducible cross-engine.
    """
    kf = float(k)
    base = df.select(
        F.col(id_col).cast("long").alias("id"), tokenize(F.col(text_col)).alias("toks")
    )
    bi = base.select(
        "id",
        F.explode(
            F.expr(
                "zip_with(slice(toks, 1, greatest(size(toks) - 1, 0)),"
                " slice(toks, 2, greatest(size(toks) - 1, 0)),"
                " (a, b) -> concat(a, ' ', b))"
            )
        ).alias("bg"),
    )
    # bi feeds the count aggregation AND the scoring join — uncut, the
    # tokenize+explode pass runs twice; one cut runs it once.
    bi = bi.localCheckpoint(eager=False)
    # one corpus aggregation; everything else derives from it. Lazy
    # localCheckpoint cuts the shared lineage so the two consumers (the
    # scoring join reads c12 and c1) do not re-run the aggregation.
    c12 = (
        bi.groupBy("bg")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
        .withColumn("w1", F.substring_index("bg", " ", 1))
        .localCheckpoint(eager=False)
    )
    c1 = c12.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    vocab = c1.agg(F.count(F.lit(1)).cast("double").alias("v"))  # 1 row
    logp = dround(
        F.ln(
            (F.col("c12").cast("double") + F.lit(kf))
            / (F.col("c1").cast("double") + F.lit(kf) * F.col("v"))
        ),
        6,
    )
    scored = (
        bi.join(c12.select("bg", "c12", "w1"), "bg")
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("id", logp.cast("decimal(18,6)").alias("__lp"))
    )
    per = scored.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("__lp").alias("__sum_lp"),
    )
    avg4 = dround(F.col("__sum_lp").cast("double") / F.col("n_bigrams").cast("double"), 4)
    return (
        base.select("id")
        .join(per, "id", "left")
        .select(
            "id",
            F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
            avg4.alias("avg_logp"),
            dround(F.exp(-avg4), 4).alias("ppl"),
        )
    )


def build_inverted_index(
    df: DataFrame, id_col: str, text_col: str, *, max_postings: int = 100
) -> DataFrame:
    """Inverted-index export: per term, the document frequency and the
    top-``max_postings`` posting entries ranked by (tf DESC, doc ASC),
    serialized as "doc:tf" strings — the retrieval-side artifact a
    corpus pipeline ships to a search/RAG system.

    Scale shape: one (doc, term) tf aggregation (lazily checkpointed —
    both the df count and the posting trim consume it, and without the
    cut the corpus tokenization would run twice); posting lists are
    TRIMMED to max_postings with a term-partitioned row_number BEFORE
    collect_list, so a stop word's million-document posting list never
    materializes in one aggregation buffer — WindowGroupLimit pre-trims
    per input partition, and at most max_postings rows per term reach
    the collect. The collected list is sorted post-hoc (collect_list
    order is partition-arrival, not deterministic).
    """
    from pyspark.sql.window import Window  # noqa: PLC0415

    toks = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    )
    tf = (
        toks.groupBy("id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df_docs"))
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("id"))
    trimmed = tf.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= int(max_postings)
    )
    posts = trimmed.groupBy("term").agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        (-F.col("tf")).alias("o1"),
                        F.col("id").alias("o2"),
                        F.concat_ws(":", F.col("id"), F.col("tf")).alias("s"),
                    )
                )
            ),
            lambda x: x["s"],
        ).alias("postings")
    )
    return dfreq.join(posts, "term")


def token_pmi(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    top_n: int = 50,
    min_pair_docs: int = 5,
) -> DataFrame:
    """Token co-occurrence PMI (pointwise mutual information) over the
    top-``top_n`` vocabulary — collocation mining: which word pairs
    appear in the same documents far more often than chance. The
    corpus-analysis step behind phrase detection and topic seeding.

    PMI(a, b) = ln( P(a, b) / (P(a) P(b)) ) with probabilities over
    document incidence. Restricting to a TOP-N vocabulary is what makes
    this scale-sane: the per-document pair space is bounded by N^2
    (here 50^2), not vocabulary^2 — the same bounding discipline as
    SemDeDup's clusters. The vocab ranks by document frequency with a
    token-ascending tiebreak (deterministic in any engine) and
    broadcasts onto the incidence stream; the pair count is one
    doc-keyed self-join of the (doc, token) incidence.

    Returns (tok1, tok2, n_ab, pmi) for pairs co-occurring in at least
    ``min_pair_docs`` documents, tok1 < tok2.
    """
    inc_all = df.select(
        F.col(id_col).alias("id"), F.explode(tokenize(F.col(text_col))).alias("tok")
    ).distinct()
    inc_all = inc_all.localCheckpoint(eager=False)  # vocab + incidence consume it
    dfreq = inc_all.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("n_docs_tok"))
    # top-N vocabulary via sort+limit: Catalyst plans a
    # TakeOrderedAndProject (per-partition top-N, then merge N*parts
    # rows) — a web-scale token vocabulary never funnels through one
    # task the way a global row_number window would (same discipline as
    # vocab_coverage).
    vocab = dfreq.orderBy(F.desc("n_docs_tok"), F.asc("tok")).limit(int(top_n))
    inc = inc_all.join(F.broadcast(vocab.select("tok")), "tok")
    a = inc.select(F.col("id"), F.col("tok").alias("tok1"))
    b = inc.select(F.col("id"), F.col("tok").alias("tok2"))
    pairs = (
        a.join(b, "id")
        .filter(F.col("tok1") < F.col("tok2"))
        .groupBy("tok1", "tok2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= int(min_pair_docs))
    )
    n_total = df.select(F.countDistinct(F.col(id_col)).cast("double").alias("n")).alias("nt")
    va = vocab.select(F.col("tok").alias("tok1"), F.col("n_docs_tok").alias("n_a"))
    vb = vocab.select(F.col("tok").alias("tok2"), F.col("n_docs_tok").alias("n_b"))
    return (
        pairs.join(F.broadcast(va), "tok1")
        .join(F.broadcast(vb), "tok2")
        .crossJoin(F.broadcast(n_total))
        .select(
            "tok1",
            "tok2",
            "n_ab",
            dround(
                F.ln(
                    F.col("n_ab").cast("double")
                    * F.col("n")
                    / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
                ),
                4,
            ).alias("pmi"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 5,
    min_df: int = 2,
) -> DataFrame:
    """Cross-document duplicated-SPAN removal — the exact-substring
    dedup semantics of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better") at n-gram granularity: any n-token
    span occurring in at least ``min_df`` DISTINCT documents is removed
    from ALL of them (spans overlap, so the union of covered token
    positions is cut), and each document is rebuilt from its surviving
    tokens. Complements :func:`segment_dedup` (disjoint segments,
    keep-first) and `crossdoc_dup_coverage` (the measurement this
    operator acts on).

    Emits (id, n_tokens, n_removed, text_clean).

    Scale shape: gram keys travel as md5 digests (the shuffle never
    carries raw spans); the duplicated-gram vote is a distinct-count
    agg; covered positions explode only for DUPLICATED gram instances;
    the final cut is a position-keyed anti-join and the reassembly
    shuffles only surviving tokens. The tokenized base is checkpointed
    — gram extraction and the final cut both consume it.
    """
    seg = int(n)
    base = (
        df.select(
            F.col(id_col).cast("long").alias("id"), tokenize(F.col(text_col)).alias("toks")
        )
        .withColumn("n_tok", F.size("toks"))
        .localCheckpoint(eager=False)
    )
    grams = base.filter(F.col("n_tok") >= seg).select(
        "id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(toks) - {seg - 1}),"
                f" i -> array_join(slice(toks, i, {seg}), ' '))"
            )
        ).alias("pos", "g"),
    ).select("id", "pos", F.md5("g").alias("gh"))
    dup = (
        grams.groupBy("gh")
        .agg(F.countDistinct("id").alias("__df"))
        .filter(F.col("__df") >= int(min_df))
        .select("gh")
    )
    covered = (
        grams.join(dup, "gh")
        .select(
            "id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(seg - 1))
            ).alias("tokpos"),
        )
        .distinct()
    )
    toks = base.select("id", "n_tok", F.posexplode("toks").alias("tokpos", "tok"))
    kept = toks.join(covered, ["id", "tokpos"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("__kept"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("tokpos", "tok"))), lambda s: s["tok"]
            ),
            " ",
        ).alias("text_clean"),
    )
    return (
        base.select("id", F.col("n_tok").cast("long").alias("n_tokens"))
        .join(rebuilt, "id", "left")
        .select(
            "id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("__kept", F.lit(0))).cast("long").alias(
                "n_removed"
            ),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


def ngram_diversity(
    df: DataFrame, group_cols: Sequence[str], text_col: str, *, max_n: int = 3
) -> DataFrame:
    """Per-group n-gram diversity profile: for each n in 1..``max_n``,
    the distinct-gram and total-gram counts plus their ratio — the
    type-token-ratio family of corpus health metrics (self-BLEU's cheap
    cousin): a source whose 3-gram diversity collapses is template spam
    or mass duplication even when exact dedup passes. Beyond the
    reference surface (SURVEY.md §2.2 north-star extensions). Emits
    (group_cols..., n, total_grams, distinct_grams, diversity) with
    diversity rounded to 6 decimals; groups with no tokens at order n
    emit 0/0 with NULL diversity.

    Scale shape: ONE tokenization pass; each order's grams derive from
    the same token array via zip_with slices and explode tagged with n,
    md5-narrowed before the shuffle so 32-hex keys cross the wire, not
    raw gram text. count(DISTINCT gh) per (group, n) partially
    aggregates map-side after an internal (group, n, gh) pre-dedup —
    Catalyst plans the standard two-phase distinct-agg expansion.
    """
    gs = list(group_cols)
    # base feeds one gram frame per order (max_n replays of the
    # tokenize pass uncut); one cut tokenizes once and each order
    # re-slices the materialized token arrays.
    base = df.select(*gs, tokenize(F.col(text_col)).alias("toks")).localCheckpoint(
        eager=False
    )
    gram_frames = []
    for n in range(1, max_n + 1):
        if n == 1:
            grams = F.col("toks")
        else:
            width = f"greatest(size(toks) - {n - 1}, 0)"
            parts = [f"slice(toks, {i + 1}, {width})" for i in range(n)]
            expr = parts[0]
            for p in parts[1:]:
                expr = f"zip_with({expr}, {p}, (a, b) -> concat(a, ' ', b))"
            grams = F.expr(expr)
        gram_frames.append(
            base.select(
                *gs, F.lit(n).alias("n"), F.explode_outer(grams).alias("g")
            ).select(*gs, "n", F.md5("g").alias("gh"))
        )
    grams_all = gram_frames[0]
    for fr in gram_frames[1:]:
        grams_all = grams_all.unionByName(fr)
    agg = grams_all.groupBy(*gs, "n").agg(
        F.count("gh").cast("long").alias("total_grams"),
        F.count_distinct("gh").cast("long").alias("distinct_grams"),
    )
    diversity = F.when(
        F.col("total_grams") > 0,
        dround(F.col("distinct_grams").cast("double") / F.col("total_grams"), 6),
    )
    return agg.select(*gs, "n", "total_grams", "distinct_grams", diversity.alias("diversity"))


def chi2_terms(
    df: DataFrame,
    id_col: str,
    label_col: str,
    text_col: str,
    *,
    k: int = 5,
) -> DataFrame:
    """Chi-squared term selection: for every (label, term) the 2x2
    document-incidence chi-square statistic, keeping the top-``k`` most
    label-discriminative terms per label — the classic feature-selection
    / corpus-contrast step (what words make this language/source/split
    distinctive, which tokens leak the label). Beyond the reference
    surface (SURVEY.md §2.2 north-star extensions). Emits
    (label, term, n_label_docs_with_term, chi2, rn) ranked by
    (chi2 DESC, term ASC) — the rounded statistic plus lexical tiebreak
    makes the cut deterministic cross-engine.

    Scale shape: incidence pre-dedups per (doc, term) map-side before
    any counting; the (term, label) contingency cells come from ONE
    term-keyed aggregation, per-term document frequencies RE-aggregate
    from that frame (no second corpus pass), and the per-label doc
    totals are a broadcast-sized frame. The final top-k is
    :func:`~python_mapreduce_spark.operators.windows.topk_per_group`,
    so WindowGroupLimit pre-trims k rows per partition before the
    label-keyed shuffle. Chi2 divides exact integer counts in IEEE
    doubles with a fixed expression shape (identical in the oracle) and
    rounds to 4 decimals.
    """
    from python_mapreduce_spark.operators.windows import topk_per_group  # noqa: PLC0415 - avoid module cycle

    incidence = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(label_col).alias("label"),
            F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("term"),
        )
    )
    cells = (
        incidence.groupBy("term", "label")
        .agg(F.count(F.lit(1)).cast("long").alias("a"))
        .localCheckpoint(eager=False)  # feeds both the df roll-up and the join
    )
    term_df = cells.groupBy("term").agg(F.sum("a").cast("long").alias("df_t"))
    label_n = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_l")
    ).localCheckpoint(eager=False)  # feeds both the total and the join
    total = label_n.agg(F.sum("n_l").cast("long").alias("n_docs"))
    av, dfv, nl, nd = (
        F.col("a").cast("double"),
        F.col("df_t").cast("double"),
        F.col("n_l").cast("double"),
        F.col("n_docs").cast("double"),
    )
    b = dfv - av
    c = nl - av
    d = nd - nl - b
    denom = (av + b) * (c + d) * (av + c) * (b + d)
    chi2 = F.when(
        denom > 0, dround(nd * (av * d - b * c) * (av * d - b * c) / denom, 4)
    ).otherwise(F.lit(0.0))
    scored = (
        cells.join(term_df, "term")
        .join(F.broadcast(label_n), "label")
        .crossJoin(F.broadcast(total))
        .select("label", "term", F.col("a").alias("n_label_docs_with_term"), chi2.alias("chi2"))
    )
    return topk_per_group(
        scored, ["label"], [F.col("chi2").desc(), F.col("term").asc()], k
    ).withColumn("rn", F.col("rn").cast("long"))


def tokenizer_fertility(
    df: DataFrame, group_cols: Sequence[str], text_col: str
) -> DataFrame:
    """Per-group tokenizer fertility profile: characters, whitespace
    words, and BPE-ish subword tokens, with the two budget ratios a
    training pipeline sizes against — chars_per_token (compression; low
    for scripts a tokenizer fragments) and tokens_per_word (fertility;
    high values flag languages that will eat budget) — the per-language
    data-card row behind "this corpus is N tokens". Companion of
    :func:`bpe_token_counts` (totals only). Emits (group_cols...,
    n_docs, total_chars, total_words, total_tokens, chars_per_token,
    tokens_per_word), ratios rounded to 4; empty groups carry NULL
    ratios.

    Scale shape: a pure projection (three regexp/length expressions per
    row, whole-stage codegen) feeding one map-side-combinable hash agg
    — no shuffle beyond the group keys, no second pass.
    """
    gs = list(group_cols)
    safe = F.coalesce(F.col(text_col), F.lit(""))
    chars = F.length(safe).cast("long")
    words = F.size(F.regexp_extract_all(safe, F.lit(r"\S+"), F.lit(0))).cast("long")
    toks = F.size(F.regexp_extract_all(safe, F.lit(BPE_ISH_PATTERN), F.lit(0))).cast("long")
    agg = df.groupBy(*gs).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(chars).cast("long").alias("total_chars"),
        F.sum(words).cast("long").alias("total_words"),
        F.sum(toks).cast("long").alias("total_tokens"),
    )
    cpt = F.when(
        F.col("total_tokens") > 0,
        dround(F.col("total_chars").cast("double") / F.col("total_tokens"), 4),
    )
    tpw = F.when(
        F.col("total_words") > 0,
        dround(F.col("total_tokens").cast("double") / F.col("total_words"), 4),
    )
    return agg.select(
        *gs, "n_docs", "total_chars", "total_words", "total_tokens",
        cpt.alias("chars_per_token"), tpw.alias("tokens_per_word"),
    )


def readability_profile(
    df: DataFrame,
    group_cols: Sequence[str],
    text_col: str,
) -> DataFrame:
    """Per-group Flesch-style readability profile from corpus-level
    totals: words ([a-z]+ tokens), sentences ([.!?]+ runs, floored at
    one per non-empty doc), and vowel-group syllable approximations —
    the reading-level facet a data card reports next to
    :func:`tokenizer_fertility` (token budgets) and the quality
    heuristics. Flesch = 206.835 - 1.015*(words/sentences) -
    84.6*(syllables/words), computed from the GROUP's exact integer
    totals (not a mean of per-doc scores — one agg, no per-doc ratio
    noise). NULL text counts as the empty document. Emits
    (group_cols..., n_docs, words, sentences, syllables,
    words_per_sentence, syllables_per_word, flesch), ratios rounded to
    6; ratio/score columns are NULL for groups with zero words or zero
    sentences.

    Scale shape: three regexp counts per row in one whole-stage-codegen
    projection, then ONE map-side-combined hash agg on the group keys.
    """
    safe = F.coalesce(F.col(text_col), F.lit(""))
    low = F.lower(safe)
    words = F.size(F.regexp_extract_all(low, F.lit("[a-z]+"), F.lit(0)))
    sents_raw = F.size(F.regexp_extract_all(safe, F.lit("[.!?]+"), F.lit(0)))
    # a non-empty doc with no terminal punctuation is one sentence
    sents = F.when(words > 0, F.greatest(sents_raw, F.lit(1))).otherwise(F.lit(0))
    syll = F.size(F.regexp_extract_all(low, F.lit("[aeiouy]+"), F.lit(0)))
    gs = list(group_cols)
    agg = df.groupBy(*gs).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(words).cast("long").alias("words"),
        F.sum(sents).cast("long").alias("sentences"),
        F.sum(syll).cast("long").alias("syllables"),
    )
    wps = F.col("words") / F.col("sentences")
    spw = F.col("syllables") / F.col("words")
    ok = (F.col("words") > 0) & (F.col("sentences") > 0)
    return agg.select(
        *gs,
        "n_docs",
        "words",
        "sentences",
        "syllables",
        F.when(ok, dround(wps, 6)).alias("words_per_sentence"),
        F.when(ok, dround(spw, 6)).alias("syllables_per_word"),
        F.when(
            ok,
            dround(
                F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 6
            ),
        ).alias("flesch"),
    )


def code_detect(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.5,
) -> DataFrame:
    """Code-vs-prose routing signal: per document, the three cheap
    structural ratios that separate source code from natural text —
    symbol density ({}();=[]<> per character), indented-line share
    (lines opening with a tab or 2+ spaces), and code-keyword token
    hits (def/return/import/function/class/var/const/if/else) — plus a
    fixed-weight score and the boolean gate a mixing recipe routes on
    (code to the code bucket, prose to the prose bucket; misrouted code
    poisons both). NULL text is the empty document (all-zero signals,
    not code). Emits (id, n_chars, symbol_ratio, indent_ratio,
    keyword_hits, code_score, is_code), ratios and score rounded to 6.

    Scale shape: a pure whole-stage-codegen projection — three regexp
    counts and one length per row, no shuffle at all; any downstream
    per-source rollup is the caller's one aggregate. Score =
    0.5*min(1, 8*symbol_ratio) + 0.3*indent_ratio +
    0.2*min(1, keyword_hits/5) — fixed literals, identical in the
    oracle.
    """
    safe = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(safe)
    symbols = F.size(F.regexp_extract_all(safe, F.lit(r"[{}();=\[\]<>]"), F.lit(0)))
    lines = F.size(F.regexp_extract_all(safe, F.lit(r"(?m)^.+$"), F.lit(0)))
    indented = F.size(
        F.regexp_extract_all(safe, F.lit(r"(?m)^(?:\t|  +).*$"), F.lit(0))
    )
    kw = F.size(
        F.regexp_extract_all(
            F.lower(safe),
            F.lit(r"\b(?:def|return|import|function|class|var|const|if|else)\b"),
            F.lit(0),
        )
    )
    sym_ratio = F.when(n_chars > 0, symbols / n_chars).otherwise(F.lit(0.0))
    ind_ratio = F.when(lines > 0, indented / lines).otherwise(F.lit(0.0))
    score = (
        F.lit(0.5) * F.least(F.lit(1.0), F.lit(8.0) * sym_ratio)
        + F.lit(0.3) * ind_ratio
        + F.lit(0.2) * F.least(F.lit(1.0), kw / F.lit(5.0))
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.cast("long").alias("n_chars"),
        dround(sym_ratio, 6).alias("symbol_ratio"),
        dround(ind_ratio, 6).alias("indent_ratio"),
        kw.cast("long").alias("keyword_hits"),
        dround(score, 6).alias("code_score"),
        (score >= F.lit(float(threshold))).alias("is_code"),
    )


def blocklist_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: Sequence[str],
    *,
    max_hits_keep: int = 0,
) -> DataFrame:
    """Broadcast blocklist screening: per document, how many distinct
    blocklist terms appear (case-insensitive substring), the
    alphabetically-first matched term, and the keep/drop gate
    ``keep = hits <= max_hits_keep`` — the standard unsafe-content /
    boilerplate screen a corpus pipeline runs before anything expensive
    (reference analog: a user map function returning [] to drop a line,
    /root/reference/mapper.py:59-62 — here it is a first-class named
    operator). NULL text is the empty document (0 hits, kept).

    Scale shape: the term list ships as ONE array literal inside the
    projection and the match is an array higher-order filter per row —
    pure whole-stage codegen, no shuffle, no UDF, no join. Right for
    blocklists up to a few thousand terms (each term is a substring
    probe per row); past that, switch to tokenizing the corpus and
    broadcast-anti-joining a term table (the q_mr_aux_join pattern).
    """
    if not terms:
        raise ValueError("blocklist needs at least one term")
    lower = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    arr = F.array(*[F.lit(t.lower()) for t in sorted(set(terms))])
    matched = F.array_sort(F.filter(arr, lambda t: lower.contains(t)))
    hits = F.size(matched)
    return df.select(
        F.col(id_col).alias("id"),
        hits.cast("long").alias("hits"),
        F.get(matched, 0).alias("first_term"),
        (hits <= F.lit(int(max_hits_keep))).alias("keep"),
    )


def compression_ratio(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the classic cheap
    redundancy/quality signal (boilerplate, template spam, and
    character-level repetition compress far below prose; near-random
    text compresses above it). Emits (id, n_bytes, c_bytes, ratio)
    with ratio = compressed/raw bytes rounded to 6 (NULL-text documents
    report 0 bytes and ratio NULL).

    Scale shape: one Arrow-batched pandas UDF over the scan (zlib is
    CPU-bound C code; the batch transfer is the only Python cost) —
    no shuffle, embarrassingly parallel, output is 4 atomic columns.
    The byte counts are deterministic for a pinned zlib level; the
    REGISTRY exposes this rows-only with a hash-green eval twin
    asserting the ratio bounds (DuckDB has no zlib to replay against).
    """
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    lvl = int(level)

    @pandas_udf("long")
    def c_bytes(texts: pd.Series) -> pd.Series:
        import zlib  # noqa: PLC0415

        return texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), lvl)) if t else 0
        )

    raw = F.coalesce(F.col(text_col), F.lit(""))
    out = df.select(
        F.col(id_col).alias("id"),
        F.octet_length(raw).cast("long").alias("n_bytes"),
        c_bytes(raw).alias("c_bytes"),
    )
    return out.withColumn(
        "ratio",
        F.when(
            F.col("n_bytes") > 0,
            dround(F.col("c_bytes").cast("double") / F.col("n_bytes"), 6),
        ),
    )


def zipf_slope(
    df: DataFrame,
    text_col: str,
    *,
    top_n: int = 100,
) -> DataFrame:
    """Zipf's-law fit over the corpus term-frequency distribution: OLS
    slope of ln(frequency) on ln(rank) across the ``top_n`` most
    frequent terms — natural text sits near -1; word-soup/synthetic
    corpora flatten toward 0 and boilerplate-heavy corpora steepen, so
    the slope is a one-number corpus-authenticity probe beside
    :func:`ngram_diversity`. Emits ONE row: (n_terms, slope,
    intercept), both rounded to 1e-4. Rank order is (count desc, term
    asc) — the term tiebreak pins ln(rank) per term exactly, so the
    SQL twin reproduces the fit bit-for-bit at 4 decimals. Fewer than
    2 distinct terms -> NULL slope/intercept; empty input emits ZERO
    rows (grouped-agg convention).

    Scale shape: one tokenize+explode pass, a map-side-combined term
    count agg, a top-n trim via ONE TakeOrderedAndProject-shaped
    global sort-limit on the (vocabulary-sized, not corpus-sized)
    count frame, then the distributed global rank
    (:func:`~python_mapreduce_spark.operators.windows.global_row_number`)
    over at most ``top_n`` rows and one closed-form OLS agg. Raw text
    crosses the wire only as exploded tokens into the first combine.
    """
    from python_mapreduce_spark.operators.windows import global_row_number  # noqa: PLC0415

    if int(top_n) < 2:
        raise ValueError(f"top_n must be >= 2: {top_n}")
    counts = (
        df.select(F.explode(tokenize(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .withColumn("__negc", -F.col("c"))
        .orderBy("__negc", "term")
        .limit(int(top_n))
    )
    ranked = global_row_number(counts, ["__negc", "term"], out="__r")
    xy = ranked.select(
        F.log(F.col("__r").cast("double")).alias("__x"),
        F.log(F.col("c").cast("double")).alias("__y"),
    )
    agged = xy.groupBy(F.lit(1).alias("__g")).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
    )
    n = F.col("n_terms").cast("double")
    denom = F.col("__sxx") - F.col("__sx") * F.col("__sx") / n
    slope = F.when(
        (F.col("n_terms") >= 2) & (denom > 0),
        (F.col("__sxy") - F.col("__sx") * F.col("__sy") / n) / denom,
    )
    return agged.select(
        "n_terms",
        dround(slope, 4).alias("slope"),
        dround((F.col("__sy") - slope * F.col("__sx")) / n, 4).alias("intercept"),
    )


def tfidf_top_terms(
    df: DataFrame,
    group_col: str,
    text_col: str,
    *,
    k: int = 5,
) -> DataFrame:
    """Top-k characteristic terms per GROUP by tf-idf — "what words
    make this source/domain different". Distinct granularity from
    :func:`tfidf_topk` (per-DOCUMENT keywords, df over documents):
    here df counts GROUPS containing the term, so the group-cardinality
    frame, not the corpus, is the idf base — the mix-profiling view a
    data card wants. tf = term count within the group; idf = ln(n_groups /
    df) with df = number of groups containing the term (so a term in
    every group scores exactly 0 and drops out of any top-k that has
    alternatives). Emits (group, rank, term, tf, n_groups_with_term,
    score) with rank 1..k by (score desc, term asc) — the term
    tiebreak makes the cut deterministic; score rounds to 1e-4 AFTER
    ranking. Groups whose every term has idf 0 still emit k rows
    (scores 0) — the readout is "nothing distinguishes this group",
    not silence.

    Scale shape: one tokenize+explode pass into a (group, term)
    map-side-combined count; df comes from re-aggregating that
    (vocabulary x group)-sized frame, NOT the corpus; the final top-k
    is a per-GROUP row_number window — partitioned by group, so no
    single-task window at any vocabulary size.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    if int(k) < 1:
        raise ValueError(f"k must be >= 1: {k}")
    # tf feeds the group-frequency re-agg, the group-count probe AND
    # the scoring join (3 replays of the tokenize+explode pass uncut);
    # one cut of the (group x vocabulary)-sized frame runs it once.
    tf = (
        df.select(F.col(group_col).alias("grp"), F.explode(tokenize(F.col(text_col))).alias("term"))
        .groupBy("grp", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups_with_term")
    )
    ngroups = tf.select("grp").distinct().groupBy(F.lit(1).alias("__g")).agg(
        F.count(F.lit(1)).cast("long").alias("__ng")
    ).drop("__g")
    scored = tf.join(dfreq, "term").crossJoin(F.broadcast(ngroups)).withColumn(
        "__score",
        F.col("tf")
        * F.log(F.col("__ng").cast("double") / F.col("n_groups_with_term")),
    )
    w = Window.partitionBy("grp").orderBy(
        F.col("__score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(
            F.col("grp").alias(group_col),
            F.col("rank").cast("long").alias("rank"),
            "term",
            "tf",
            "n_groups_with_term",
            dround(F.col("__score"), 4).alias("score"),
        )
    )


def heaps_law(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    buckets: int = 10,
) -> DataFrame:
    """Heaps'-law vocabulary-growth fit — :func:`zipf_slope`'s
    companion: distinct vocabulary D(N) ~ K * N^beta as the corpus
    grows. Natural text sits near beta 0.4-0.6; a template/spam corpus
    saturates (beta -> 0) and synthetic word-soup runs high — the
    second one-number authenticity probe a data card wants. Emits ONE
    row: (n_points, beta, intercept) with intercept = ln K, both
    rounded 1e-4; fewer than 2 usable points -> NULL fit; empty input
    emits ZERO rows.

    The cumulative-distinct sequence — inherently sequential at first
    sight — decomposes into two LINEAR passes: docs rank into
    ``buckets`` prefix buckets (distributed global rank over doc id),
    then D_cum(k) = count of terms whose FIRST bucket (min over one
    term-keyed agg) is <= k and N_cum(k) = running token count — both
    running sums over the bucket-cardinality frame, which is bounded at
    ``buckets`` rows by construction, so they run as one plain window
    over a constant-size frame. The corpus is scanned once; the OLS
    fit is the same closed-form agg as the Zipf slope.
    """
    from python_mapreduce_spark.operators.windows import (  # noqa: PLC0415
        global_row_number,
    )

    if int(buckets) < 2:
        raise ValueError(f"buckets must be >= 2: {buckets}")
    ranked = global_row_number(
        df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__text")),
        ["__id"],
        out="__r",
    )
    n1 = ranked.groupBy(F.lit(1).alias("__g")).agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    ).drop("__g")
    tok = (
        ranked.crossJoin(F.broadcast(n1))
        .select(
            F.floor((F.col("__r") - 1) * int(buckets) / F.col("__n")).alias("bucket"),
            F.explode(tokenize(F.col("__text"))).alias("term"),
        )
    )
    # ONE tokenize pass: collapse to per-(bucket, term) instance counts
    # first (map-side combinable), cut the vocabulary-sized frame once,
    # and derive BOTH the token totals and the first-bucket counts from
    # it — uncut, tb and vb each replayed the corpus-wide explode.
    bt = tok.groupBy("bucket", "term").agg(
        F.count(F.lit(1)).cast("long").alias("__cnt")
    )
    bt = bt.localCheckpoint(eager=False)
    tb = bt.groupBy("bucket").agg(F.sum("__cnt").cast("long").alias("toks"))
    vb = (
        bt.groupBy("term")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("newterms"))
    )
    per_bucket = tb.join(vb, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("toks", F.lit(0)).alias("toks"),
        F.coalesce("newterms", F.lit(0)).alias("newterms"),
    )
    # per_bucket is <= `buckets` rows BY CONSTRUCTION (the floor rule
    # emits bucket ids 0..buckets-1), so the two cumulative sums run as
    # a plain window over a constant-size frame — the distributed
    # multi-weight running sum (eager range checkpoint + offsets
    # collect, ~3 blocking jobs) buys nothing here. Identical integers.
    from pyspark.sql.window import Window  # noqa: PLC0415

    wb = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_bucket.select(
        "bucket",
        F.sum("toks").over(wb).cast("long").alias("ncum"),
        F.sum("newterms").over(wb).cast("long").alias("dcum"),
    )
    xy = cum.filter((F.col("ncum") > 0) & (F.col("dcum") > 0)).select(
        F.log(F.col("ncum").cast("double")).alias("__x"),
        F.log(F.col("dcum").cast("double")).alias("__y"),
    )
    agged = xy.groupBy(F.lit(1).alias("__g")).agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
    )
    n = F.col("n_points").cast("double")
    denom = F.col("__sxx") - F.col("__sx") * F.col("__sx") / n
    beta = F.when(
        (F.col("n_points") >= 2) & (denom > 0),
        (F.col("__sxy") - F.col("__sx") * F.col("__sy") / n) / denom,
    )
    return agged.select(
        "n_points",
        dround(beta, 4).alias("beta"),
        dround((F.col("__sy") - beta * F.col("__sx")) / n, 4).alias("intercept"),
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 retrieval scoring: rank the corpus against a fixed query
    with the Lucene-style non-negative Okapi BM25 — idf(t) =
    ln(1 + (N - df + 0.5)/(df + 0.5)), contribution = idf * tf*(k1+1) /
    (tf + k1*(1 - b + b*dl/avgdl)) — the ranking function behind every
    practical keyword-retrieval baseline, completing the retrieval
    stack next to :func:`tfidf_topk` (doc keywords) and the dense ANN
    path (llm/similarity.py); the lexical half a hybrid retriever
    needs. Emits the top-``k`` docs as an unordered set (the driver
    hash is order-insensitive): (id, matched_terms, dl, score); ties
    at the cut break by (score DESC, id ASC) — a total order, so the
    SET is deterministic. Docs matching no query term never appear;
    NULL text = the empty document (house rule) and can never match.
    Beyond the reference surface (SURVEY.md §2.2 north-star
    extensions).

    Scale shape: the query is a FIXED tiny term list, so nothing
    doc x term ever needs to shuffle — one tokenize projection computes
    each doc's length and its per-query-term counts with array
    higher-order functions (size/filter, whole-stage codegen; no
    explode, no (doc, term) exchange), lazily localCheckpoint'ed once
    because corpus stats, df, AND the scoring all consume it; df for
    the query terms is a |query|-row broadcast, avgdl a 1-row
    broadcast, the per-doc melt touches only docs matching >= 1 term,
    and the final cut is orderBy+limit (TakeOrderedAndProject — no
    full sort, no window).

    Determinism: tf, dl, df, N are exact integers; avgdl and each
    per-term contribution compute in one fixed IEEE shape from them,
    identical on both engines — but the PER-DOC sum of contributions
    would be partition-order-dependent as a raw double sum, so each
    contribution quantizes to 1e-6 and accumulates in DECIMAL(38,6)
    (the sMAPE-term pattern); the order-by key is that exact decimal
    score and the emitted score rounds to 1e-4.
    """
    # duplicate query terms must count once (the old isin() filter had
    # set semantics); preserve first-seen order for the melt
    qt = list(dict.fromkeys(t.lower() for t in query_terms))

    def _count_of(term: str):  # 1-arg lambda: 2 args would mean (elem, idx)
        return F.size(F.filter("__toks", lambda x: x == F.lit(term))).cast("long")

    per_doc = df.select(
        F.col(id_col).alias("id"), tokenize(text_col).alias("__toks")
    ).select(
        "id",
        F.size("__toks").cast("long").alias("dl"),
        *[_count_of(t).alias(f"__tf_{i}") for i, t in enumerate(qt)],
    ).filter(F.col("dl") > 0)
    per_doc = per_doc.localCheckpoint(eager=False)
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("__nd"),
        F.sum("dl").cast("double").alias("__tok"),
    )
    n_docs = df.select(F.count(F.lit(1)).cast("long").alias("__n"))
    if qt:
        qtf = (
            per_doc.select(
                "id",
                "dl",
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(t).alias("term"), F.col(f"__tf_{i}").alias("tf")
                            )
                            for i, t in enumerate(qt)
                        ]
                    )
                ).alias("__p"),
            )
            .select("id", "dl", F.col("__p.term").alias("term"), F.col("__p.tf").alias("tf"))
            .filter(F.col("tf") > 0)
        )
    else:  # empty query: same empty-result shape without an empty array()
        qtf = per_doc.select(
            "id",
            "dl",
            F.lit("").alias("term"),
            F.lit(0).cast("long").alias("tf"),
        ).filter(F.lit(False))
    dfreq = qtf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    j = (
        qtf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(n_docs))
    )
    avgdl = F.col("__tok") / F.col("__nd").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    contrib = idf * tf_d * F.lit(float(k1) + 1.0) / (
        tf_d
        + F.lit(float(k1))
        * (
            F.lit(1.0 - float(b))
            + F.lit(float(b)) * F.col("dl").cast("double") / avgdl
        )
    )
    scored = j.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("matched_terms"),
        F.max("dl").alias("dl"),
        F.sum(dround(contrib, 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("__score"),
    )
    return (
        scored.orderBy(F.col("__score").desc(), F.col("id").asc())
        .limit(int(k))
        .select("id", "matched_terms", "dl", dround(F.col("__score"), 4).alias("score"))
    )
