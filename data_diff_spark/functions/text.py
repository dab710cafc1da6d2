"""Text-analysis column library for training-data pipelines.

Everything here is a pure JVM-side Column expression (no UDFs, no shuffle):
tokenization, n-gram shingles, language-ID, quality scoring, token counting
and document fingerprinting all run inside whole-stage codegen, so they
stream through a 100 TB scan at full executor parallelism with zero Python
round-trips.

The reference engine (datafold/data-diff) has no text surface at all — this
module is the beyond-reference training-data layer. Every function has a
`duckdb_*` twin emitting the DuckDB SQL that computes the *bit-identical*
value, which the driver's oracle gate runs side-by-side
(cross-engine determinism: md5-based 60-bit hashes, integer arithmetic,
IEEE-754 double ops in a fixed order).
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: all rolling/minhash arithmetic stays < 2^36, far
# inside int64, so Spark and DuckDB wrap identically (i.e. never).
P31 = 2_147_483_647

TOKEN_SPLIT = r"\s+"

# Small per-language stopword sets for the n-gram/stopword language-ID
# heuristic. Deliberately tiny: the heuristic is a cheap first-pass filter,
# not a classifier.
STOPWORDS: Dict[str, List[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von"],
    "en": ["the", "a", "of", "and", "is", "in", "to", "it", "that", "for"],
    "es": ["el", "la", "los", "las", "es", "y", "en", "que", "un", "una"],
    "fr": ["le", "la", "les", "est", "et", "en", "que", "un", "une", "pas"],
    "zh": ["的", "了", "是", "在", "我", "有", "和", "就", "不", "人"],
}
LANGS = sorted(STOPWORDS)  # deterministic tie-break order


# --- tokenization -----------------------------------------------------------


def tokens(col: Column) -> Column:
    """Whitespace tokens, empties dropped (split/trim semantics verified
    identical between Spark's Java regex and DuckDB's RE2)."""
    return F.filter(F.split(F.trim(col), TOKEN_SPLIT), lambda x: x != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def word_ngrams(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles as space-joined strings; empty array when the
    document has fewer than n tokens.

    PERFORMANCE TRAP: `col` is captured inside the transform lambda, and
    higher-order-function lambdas re-evaluate captured expressions per
    element — passing raw text re-runs the regex tokenize once per gram,
    O(len^2) per document (measured 28x on the sf1.0 corpus, and it is
    doc-LENGTH-quadratic, so far worse on real web documents). On any
    hot path, stage the token array in its own projection and call
    word_ngrams_from_tokens on the staged column instead; this form
    stays only as the convenience for short strings and tests."""
    return word_ngrams_from_tokens(tokens(col), n)


def word_ngrams_from_tokens(t: Column, n: int = 3) -> Column:
    """word_ngrams over an already-computed token-array column. When `t`
    is a staged ATTRIBUTE (its own projection), the lambda's captured
    reference is a row-buffer read, so each gram costs O(n) — the shape
    shingle_sets/dedup pin for the LSH path."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(t, i, n)),
    )
    return F.when(F.size(t) >= n, grams).otherwise(F.array().cast("array<string>"))


def duckdb_tokens(col: str) -> str:
    return f"list_filter(string_split_regex(trim({col}), '\\s+'), x -> x <> '')"


def duckdb_word_ngrams(col: str, n: int = 3) -> str:
    t = duckdb_tokens(col)
    return (
        f"list_transform(generate_series(1, len({t}) - {n - 1}), "
        f"i -> array_to_string(({t})[i:i+{n - 1}], ' '))"
    )


# --- hashing ----------------------------------------------------------------


def hash60(col: Column) -> Column:
    """Deterministic 60-bit integer hash of a string: low-overhead, cross-
    engine reproducible (md5 first 15 hex digits). Used as the base hash for
    minhash permutations, simhash bits and rolling fingerprints."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def duckdb_hash60(col: str) -> str:
    return f"('0x' || substring(md5({col}), 1, 15))::BIGINT"


# BPE-ish pre-tokenization pattern (GPT-2 style, lookaround-free so Java
# regex and RE2 agree): contractions, letter runs, digit runs, punctuation
# runs, each with an optional leading space.
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_count(col: Column) -> Column:
    """Approximate LLM token count: matches of the BPE pre-tokenizer
    pattern, whitespace-only matches excluded. Tracks real BPE counts
    closely enough for length filtering/budgeting without a vocab file."""
    toks = F.regexp_extract_all(col, F.lit(BPE_PATTERN), 0)
    return F.size(F.filter(toks, lambda x: F.trim(x) != ""))


def duckdb_bpe_token_count(col: str) -> str:
    pat = BPE_PATTERN.replace("'", "''")
    return (
        f"len(list_filter(regexp_extract_all({col}, '{pat}'), x -> trim(x) <> ''))"
    )


# --- language ID ------------------------------------------------------------


def _stopword_hits(toks: Column, words: Sequence[str]) -> Column:
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda x: F.array_contains(wl, x)))


def lang_scores(col: Column) -> Dict[str, Column]:
    """Stopword-hit count per language (token multiplicity counts)."""
    t = tokens(col)
    return {lang: _stopword_hits(t, STOPWORDS[lang]) for lang in LANGS}


def lang_id(col: Column) -> Column:
    """Predicted language: argmax of stopword hits, alphabetical tie-break,
    'und' (undetermined) when no stopword matches at all."""
    scores = lang_scores(col)
    g = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(LANGS):
        expr = F.when(scores[lang] == g, F.lit(lang)).otherwise(expr)
    return F.when(g == 0, F.lit("und")).otherwise(expr)


def duckdb_lang_id(col: str) -> str:
    t = duckdb_tokens(col)
    score = {
        lang: (
            f"len(list_filter({t}, x -> list_contains("
            f"[{', '.join(repr(w) for w in STOPWORDS[lang])}], x)))"
        )
        for lang in LANGS
    }
    g = f"greatest({', '.join(score.values())})"
    whens = " ".join(f"when {score[lang]} = {g} then '{lang}'" for lang in LANGS)
    return f"(case when {g} = 0 then 'und' {whens} else 'und' end)"


# --- quality scoring --------------------------------------------------------


def alpha_ratio(col: Column) -> Column:
    """Fraction of characters that are ASCII letters (0 for empty text)."""
    n = F.length(col)
    a = F.length(F.regexp_replace(col, "[^a-zA-Z]", ""))
    return F.when(n > 0, a.cast("double") / n).otherwise(F.lit(0.0))


def mean_token_len(col: Column) -> Column:
    t = tokens(col)
    total = F.aggregate(
        F.transform(t, F.length), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return F.when(F.size(t) > 0, total.cast("double") / F.size(t)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    t = tokens(col)
    hits = _stopword_hits(t, STOPWORDS[lang])
    return F.when(F.size(t) > 0, hits.cast("double") / F.size(t)).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0,1]: length saturation + letter ratio
    + stopword plausibility, fixed weights, fixed double-op order so both
    engines produce the identical IEEE-754 result."""
    tc = token_count(col)
    length_component = F.least(F.lit(1.0), tc.cast("double") / F.lit(256.0))
    return (
        length_component * F.lit(0.4)
        + alpha_ratio(col) * F.lit(0.3)
        + stopword_ratio(col, "en") * F.lit(0.3)
    )


def duckdb_quality_parts(col: str) -> Dict[str, str]:
    t = duckdb_tokens(col)
    en = ", ".join(repr(w) for w in STOPWORDS["en"])
    return {
        "token_count": f"len({t})",
        "alpha_ratio": (
            f"(case when length({col}) > 0 then "
            f"length(regexp_replace({col}, '[^a-zA-Z]', '', 'g'))::double / length({col}) "
            f"else 0.0 end)"
        ),
        "mean_token_len": (
            f"(case when len({t}) > 0 then "
            f"list_sum(list_transform({t}, x -> length(x)))::double / len({t}) "
            f"else 0.0 end)"
        ),
        "stopword_ratio_en": (
            f"(case when len({t}) > 0 then "
            f"len(list_filter({t}, x -> list_contains([{en}], x)))::double / len({t}) "
            f"else 0.0 end)"
        ),
    }


def duckdb_quality_score(col: str) -> str:
    p = duckdb_quality_parts(col)
    return (
        f"(least(1.0, {p['token_count']}::double / 256.0) * 0.4 "
        f"+ {p['alpha_ratio']} * 0.3 + {p['stopword_ratio_en']} * 0.3)"
    )


# --- fingerprinting ---------------------------------------------------------


def set_fingerprint(col: Column) -> Column:
    """Order-insensitive fingerprint: md5 over the sorted distinct token set.
    Two documents with the same vocabulary collide — that is the point (bag-
    of-words near-dup prefilter)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col)))))


def rolling_fingerprint(col: Column) -> Column:
    """Order-sensitive polynomial rolling hash over token hashes
    (acc*31 + h) mod P31 — detects reordered-but-same-vocabulary docs that
    set_fingerprint conflates. Pure array fold: no shuffle, no explode."""
    hs = F.transform(tokens(col), lambda x: hash60(x) % P31)
    return F.aggregate(
        hs, F.lit(0).cast("long"), lambda acc, x: (acc * 31 + x) % P31
    )


def duckdb_set_fingerprint(col: str) -> str:
    t = duckdb_tokens(col)
    return f"md5(array_to_string(list_sort(list_distinct({t})), ' '))"


def duckdb_rolling_fingerprint(col: str) -> str:
    t = duckdb_tokens(col)
    hs = f"list_transform({t}, x -> {duckdb_hash60('x')} % {P31})"
    return (
        f"list_reduce(list_prepend(0::BIGINT, {hs}), "
        f"(acc, x) -> (acc * 31 + x) % {P31})"
    )


# --- feature hashing (text -> fixed-dim vector) ------------------------------


# Above this many rows the SQL fold (dim interpreted aggregate lambdas per
# row, each rescanning the token-hash array — O(dim * tokens) interpreted
# ops) yields to an Arrow-batched numpy scatter-add over the SAME staged
# JVM-md5 hash column. Values are bit-identical (the hashing — the only
# engine-replayed arithmetic — stays in SQL; the fold is exact integer
# adds either way; parity pinned in tests/test_text_analysis.py). The
# same size-gated split as _assign_cells / pq_encode.
_HASHED_VEC_UDF_MIN_ROWS = 2048


def hashed_vector(df, text_col: str = "text", id_col: str = "doc_id", dim: int = 64,
                  n_rows: int | None = None):
    """Feature-hashing vectorizer ("hashing trick"): token t contributes
    sign(t) to dimension hash(t) mod dim, signs from an independent hash bit
    to cancel collision bias — sklearn's HashingVectorizer semantics, as a
    pure map-only pipeline (no vocabulary, no fitting, no shuffle), which
    is why it scales to 100 TB where a fitted vocabulary cannot. Pass the
    action-free `n_rows` hint to route big corpora to the numpy fold
    (see _HASHED_VEC_UDF_MIN_ROWS).

    Output column 'vector': array<long> of length dim, ready for the
    operators/similarity.py cosine machinery.

    NULL text yields the ZERO vector on every route: the staged hash
    column coalesces text to '' (empty token array), so the SQL fold's
    init-0 aggregate, the numpy scatter-add, and the DuckDB oracle's
    coalesce(list_sum(...), 0) all agree — without it the SQL fold
    returned an array of NULL dims and the numpy path raised on
    np.asarray(None) (r9 ADVICE)."""
    hs = "_hv_hs"
    staged = df.withColumn(
        hs, F.transform(tokens(F.coalesce(F.col(text_col), F.lit(""))), hash60)
    )

    if n_rows is not None and n_rows >= _HASHED_VEC_UDF_MIN_ROWS:
        import numpy as np
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        def _fold(hcol):
            # belt-and-braces: the staged column is non-null by
            # construction (text coalesced to ''), but a caller staging
            # its own hash column must not crash the whole job
            arrs = [np.asarray(a if a is not None else (), dtype=np.int64) for a in hcol]
            n = len(arrs)
            if not n:
                return pd.Series([], dtype=object)
            out = np.zeros((n, dim), dtype=np.int64)
            lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=n)
            if lens.sum():
                h = np.concatenate([a for a in arrs if len(a)])
                rows = np.repeat(np.arange(n), lens)
                signs = (((h >> 32) & 1) * 2 - 1).astype(np.int64)
                np.add.at(out, (rows, h % dim), signs)
            return pd.Series(list(out))

        _fold.__annotations__ = {"hcol": pd.Series, "return": pd.Series}
        return staged.withColumn(
            "vector", pandas_udf(_fold, "array<long>")(F.col(hs))
        ).drop(hs)

    def _dim_sum(i: int) -> Column:
        return F.aggregate(
            F.col(hs),
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when((h % dim) == i,
                     F.when(F.shiftright(h, 32).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
                     ).otherwise(0),
        )

    return staged.withColumn(
        "vector", F.array(*[_dim_sum(i) for i in range(dim)])
    ).drop(hs)


def duckdb_hashed_vector(col: str = "text", dim: int = 64) -> str:
    hs = f"list_transform({duckdb_tokens(col)}, x -> {duckdb_hash60('x')})"
    dims = ", ".join(
        f"coalesce(list_sum(list_transform({hs}, h -> "
        f"case when h % {dim} = {i} then (case when (h >> 32) & 1 = 1 then 1 else -1 end) else 0 end)), 0)::BIGINT"
        for i in range(dim)
    )
    return f"[{dims}]"


# --- corpus quality filtering ------------------------------------------------


def quality_filter(
    df,
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 1_000_000,
    min_quality: float = 0.3,
    allowed_langs: Optional[Sequence[str]] = None,
):
    """The canonical training-data cleaning stage: annotate every document
    with keep/reject and the FIRST failing rule (rules evaluated in a fixed
    order, so the reason is deterministic). Map-only — one codegen'd pass,
    no shuffle; filter with .where("keep") or keep the annotations for a
    rejection audit.

    Rules, in order: too_few_tokens, too_many_tokens, low_quality,
    disallowed_lang (skipped when allowed_langs is None).
    """
    c = F.col(text_col)
    # null text = 0 tokens (size() of a null array is null, whose
    # comparisons are null and would silently skip every rule)
    tc = F.coalesce(token_count(c), F.lit(0))
    qs = F.coalesce(quality_score(c), F.lit(0.0))
    reason = F.when(tc < min_tokens, F.lit("too_few_tokens")).when(
        tc > max_tokens, F.lit("too_many_tokens")
    ).when(qs < min_quality, F.lit("low_quality"))
    if allowed_langs is not None:
        lang = lang_id(c)
        reason = reason.when(
            ~lang.isin(list(allowed_langs)), F.lit("disallowed_lang")
        )
    reason = reason.otherwise(F.lit(None).cast("string"))
    return df.withColumn("reject_reason", reason).withColumn(
        "keep", F.col("reject_reason").isNull()
    )


def duckdb_quality_filter(
    col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 1_000_000,
    min_quality: float = 0.3,
    allowed_langs: Optional[Sequence[str]] = None,
) -> str:
    """DuckDB expression for the same reject_reason."""
    p = duckdb_quality_parts(col)
    tc = f"coalesce({p['token_count']}, 0)"
    qs = f"coalesce({duckdb_quality_score(col)}, 0.0)"
    whens = [
        f"when {tc} < {min_tokens} then 'too_few_tokens'",
        f"when {tc} > {max_tokens} then 'too_many_tokens'",
        f"when {qs} < {min_quality} then 'low_quality'",
    ]
    if allowed_langs is not None:
        langs = ", ".join(f"'{l}'" for l in allowed_langs)
        whens.append(
            f"when not list_contains([{langs}], {duckdb_lang_id(col)}) then 'disallowed_lang'"
        )
    return "(case " + " ".join(whens) + " else null end)"


# --- repetition stats (Gopher/MassiveText-style hygiene signals) ------------


def with_repetition_stats(
    df: DataFrame, text_col: str = "text", keep: Optional[Sequence[str]] = None
) -> DataFrame:
    """Append n_lines, dup_line_frac, dup_line_char_frac, top_bigram_frac —
    the within-document repetition signals the Gopher/MassiveText filters
    threshold on (duplicate-line fraction, characters inside duplicate
    lines, most-frequent-2-gram share). Pure Column expressions: map-only,
    no shuffle, no UDF. All ratios are int/int -> one IEEE divide, so the
    SQL oracle reproduces them bit-for-bit.

    Built as STAGED projections (split arrays -> distinct arrays -> ratios)
    rather than one nested expression: each intermediate is referenced
    several times, and CollapseProject keeps non-cheap multiply-used
    expressions staged, so every array is computed once per row. A single
    mega-expression re-evaluates the whole tokenize chain inside every
    higher-order lambda — measured 20x slower. The per-doc bigram mode is
    O(distinct x total) array work over attribute references — bounded by
    document length, embarrassingly parallel."""
    keep = list(keep) if keep is not None else [c for c in df.columns if c != text_col]
    col = F.col(text_col)
    staged = df.select(
        *keep,
        F.filter(F.split(col, "\n"), lambda x: F.trim(x) != "").alias("__lines"),
        tokens(col).alias("__toks"),
    ).select(
        *keep,
        "__lines",
        word_ngrams_from_tokens(F.col("__toks"), 2).alias("__grams"),
    ).select(
        *keep,
        "__lines",
        "__grams",
        F.array_distinct("__lines").alias("__dlines"),
        F.array_distinct("__grams").alias("__dgrams"),
    )

    def chars_of(c: str) -> Column:
        return F.aggregate(
            F.transform(c, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
        )

    def ratio(num: Column, den: Column) -> Column:
        return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(
            F.lit(0.0)
        )

    n, nd = F.size("__lines"), F.size("__dlines")
    top = F.array_max(
        F.transform(
            F.col("__dgrams"),
            lambda g: F.size(F.filter(F.col("__grams"), lambda x: x == g)),
        )
    )
    return staged.select(
        *keep,
        n.cast("long").alias("n_lines"),
        ratio(n - nd, n).alias("dup_line_frac"),
        ratio(chars_of("__lines") - chars_of("__dlines"), chars_of("__lines")).alias(
            "dup_line_char_frac"
        ),
        ratio(F.coalesce(top, F.lit(0)), F.size("__grams")).alias("top_bigram_frac"),
    )


def duckdb_repetition_stats(col: str) -> Dict[str, str]:
    """DuckDB expressions replaying repetition_stats field-for-field."""
    lines = f"list_filter(string_split({col}, chr(10)), x -> trim(x) <> '')"
    n = f"len({lines})"
    nd = f"len(list_distinct({lines}))"
    chars = f"coalesce(list_sum(list_transform({lines}, x -> length(x))), 0)"
    dchars = f"coalesce(list_sum(list_transform(list_distinct({lines}), x -> length(x))), 0)"
    grams = duckdb_word_ngrams(col, 2)
    ng = f"len({grams})"
    top = (
        f"coalesce(list_max(list_transform(list_distinct({grams}), "
        f"g -> len(list_filter({grams}, x -> x = g)))), 0)"
    )

    def ratio(num: str, den: str) -> str:
        return f"(case when {den} > 0 then ({num})::DOUBLE / ({den})::DOUBLE else 0.0 end)"

    return {
        "n_lines": f"{n}::BIGINT",
        "dup_line_frac": ratio(f"{n} - {nd}", n),
        "dup_line_char_frac": ratio(f"{chars} - {dchars}", chars),
        "top_bigram_frac": ratio(top, ng),
    }


# --- PII redaction ----------------------------------------------------------

# Patterns deliberately restricted to syntax Java regex and RE2 evaluate
# identically (no lookaround, no backrefs). Order matters and is part of the
# contract: SSN before phone, because an SSN body ("123-45-6789") also
# matches the looser phone shape — each stage counts/replaces on the OUTPUT
# of the previous stage.
PII_PATTERNS: List[tuple] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\+?[0-9][0-9()\- ]{7,}[0-9]", "<PHONE>"),
]


def redact_pii(col: Column) -> Column:
    """struct(text: redacted string, n_email, n_ssn, n_phone: match counts).
    Pure Column pipeline — map-only, zero shuffle, JVM-side regex (no UDF);
    at 100 TB this runs at scan speed inside WholeStageCodegen."""
    cur = col
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return F.struct(cur.alias("text"), *counts)


def duckdb_redact_pii(col: str) -> Dict[str, str]:
    """DuckDB expressions replaying redact_pii stage-for-stage: dict with
    'text' (redacted) and one 'n_<kind>' count per pattern. DuckDB's
    regexp_replace is first-match-only by default — the 'g' flag is load-
    bearing."""
    cur = col
    out: Dict[str, str] = {}
    for name, pat, repl in PII_PATTERNS:
        p = pat.replace("'", "''")
        out[f"n_{name}"] = f"len(regexp_extract_all({cur}, '{p}'))::BIGINT"
        cur = f"regexp_replace({cur}, '{p}', '{repl}', 'g')"
    out["text"] = cur
    return out


# --- minhash coefficients (shared with operators/dedup.py) ------------------


def perm_coefficients(k: int) -> List[tuple]:
    """Deterministic (a, b) pairs for the k minhash permutations
    h_i(x) = (a_i * x + b_i) mod P31, derived from md5 so every run, every
    engine and every test agrees without any runtime randomness."""
    out = []
    for i in range(k):
        a = int(hashlib.md5(f"minhash-a-{i}".encode()).hexdigest()[:15], 16) % P31
        b = int(hashlib.md5(f"minhash-b-{i}".encode()).hexdigest()[:15], 16) % P31
        out.append((a or 1, b))
    return out
