"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

All pure JVM column expressions (regexp/split/aggregate lambdas) so they
run inside whole-stage codegen at corpus scale. Each op also ships a
DuckDB-dialect SQL emitter used by the correctness oracle so both engines
evaluate the same arithmetic (integer outputs — no float hash flakiness).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "a"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "des", "est", "une"],
    "es": ["el", "los", "las", "es", "una", "por", "como"],
}
LANG_ORDER = ["en", "de", "fr", "es"]

FP_MOD = 1_000_000_007
FP_MULT = 131


def _stop_re(lang: str) -> str:
    return r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"


def token_count_col(text_col: str = "text") -> Column:
    return F.size(F.split(F.trim(F.col(text_col)), r"\s+"))


def stopword_hits_col(text_col: str, lang: str) -> Column:
    return F.size(F.regexp_extract_all(F.col(text_col), F.lit(_stop_re(lang)), F.lit(0)))


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_guess") -> DataFrame:
    """n-gram-free stopword-vote language ID; deterministic argmax with
    ties broken by LANG_ORDER; 0 hits everywhere → 'und'."""
    hits = {l: stopword_hits_col(text_col, l) for l in LANG_ORDER}
    best = F.lit("und")
    best_n = F.lit(0)
    for l in LANG_ORDER:  # later langs must beat strictly → order is tiebreak
        take = hits[l] > best_n
        best = F.when(take, F.lit(l)).otherwise(best)
        best_n = F.when(take, hits[l]).otherwise(best_n)
    return df.withColumn(out_col, best)


def lang_id_sql(text_expr: str, dialect: str = "duckdb") -> str:
    """Equivalent CASE expression for the oracle (same argmax + tiebreak)."""
    ln = "len" if dialect == "duckdb" else "size"
    hit = {
        l: f"{ln}(regexp_extract_all({text_expr}, '{_stop_re(l)}', 0))" for l in LANG_ORDER
    }
    expr = "'und'"
    best = "0"
    for l in LANG_ORDER:
        expr = f"(CASE WHEN {hit[l]} > {best} THEN '{l}' ELSE {expr} END)"
        best = f"(CASE WHEN {hit[l]} > {best} THEN {hit[l]} ELSE {best} END)"
    return expr


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds integer quality columns:

    - n_tokens: whitespace token count
    - mean_token_len_e3: floor(1000 * sum(len(w)) / n_tokens)
    - stop_ratio_e6: floor(1e6 * english-stopword hits / n_tokens)
    - n_punct: punctuation character count
    """
    w = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(w)
    char_sum = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    stops = stopword_hits_col(text_col, "en")
    return (
        df.withColumn("n_tokens", n)
        .withColumn(
            "mean_token_len_e3",
            F.floor(char_sum * F.lit(1000) / n).cast("long"),
        )
        .withColumn("stop_ratio_e6", F.floor(stops * F.lit(1_000_000) / n).cast("long"))
        .withColumn(
            "n_punct",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[.,;:!?]"), F.lit(0))),
        )
    )


def quality_metrics_sql(text_expr: str) -> dict[str, str]:
    """DuckDB expressions matching :func:`quality_metrics` column-for-column."""
    w = f"string_split_regex(trim({text_expr}), '\\s+')"
    n = f"len({w})"
    char_sum = f"list_reduce(list_transform({w}, x -> length(x)), (a, b) -> a + b)"
    stops = f"len(regexp_extract_all({text_expr}, '{_stop_re('en')}', 0))"
    return {
        "n_tokens": f"CAST({n} AS INT)",
        "mean_token_len_e3": f"CAST(FLOOR({char_sum} * 1000.0 / {n}) AS BIGINT)",
        "stop_ratio_e6": f"CAST(FLOOR({stops} * 1000000.0 / {n}) AS BIGINT)",
        "n_punct": f"CAST(len(regexp_extract_all({text_expr}, '[.,;:!?]', 0)) AS INT)",
    }


def _ngrams(w: Column, n_words: Column, k: int) -> Column:
    """Word k-grams as strings; empty array when the doc is shorter than k.
    Guarded slices (Spark sequence/slice over short arrays misbehave —
    see CLAUDE.md)."""
    parts = [F.slice(w, 1 + i, n_words - (k - 1)) for i in range(k)]
    g = parts[0]
    for p in parts[1:]:
        g = F.zip_with(g, p, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(n_words >= k, g).otherwise(F.array().cast("array<string>"))


def repetition_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality filters (Rae et al. 2021 §A1.1,
    public paper): per-document duplicate word-n-gram counts and the
    largest single-word frequency. All integer outputs:

    - n_words: whitespace token count
    - dup2 / dup3: (total − distinct) word 2-/3-grams — the numerator of
      the "fraction of duplicate n-grams" filter
    - top_word_n: occurrences of the most frequent word — numerator of
      the "fraction of chars in top word" style filters

    Everything stays a per-row JVM column expression (NO shuffle, unlike
    the naive explode → groupBy(doc, word) wordcount shape): top_word_n
    comes from sort_array + longest equal-adjacent run via a single
    ``aggregate`` fold, so at corpus scale the op is a map-only pass."""
    w = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(w)
    g2 = _ngrams(w, n, 2)
    g3 = _ngrams(w, n, 3)
    ws = F.sort_array(w)
    eq = F.zip_with(
        F.slice(ws, 1, n - 1),
        F.slice(ws, 2, n - 1),
        lambda a, b: F.when(a == b, F.lit(1)).otherwise(F.lit(0)),
    )
    run = F.aggregate(
        F.when(n >= 2, eq).otherwise(F.array().cast("array<int>")),
        F.struct(F.lit(1).alias("cur"), F.lit(1).alias("best")),
        lambda acc, x: F.struct(
            F.when(x == 1, acc["cur"] + 1).otherwise(F.lit(1)).alias("cur"),
            F.greatest(
                acc["best"], F.when(x == 1, acc["cur"] + 1).otherwise(F.lit(1))
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return (
        df.withColumn("n_words", n)
        .withColumn("dup2", F.size(g2) - F.size(F.array_distinct(g2)))
        .withColumn("dup3", F.size(g3) - F.size(F.array_distinct(g3)))
        .withColumn("top_word_n", run)
    )


def repetition_metrics_sql(text_expr: str) -> dict[str, str]:
    """DuckDB expressions matching :func:`repetition_metrics` (the
    top_word_n oracle is emitted separately — it needs an unnest join)."""
    w = f"string_split_regex(trim({text_expr}), '\\s+')"
    g2 = f"[{w}[i] || ' ' || {w}[i+1] FOR i IN range(1, len({w}))]"
    g3 = f"[{w}[i] || ' ' || {w}[i+1] || ' ' || {w}[i+2] FOR i IN range(1, len({w}) - 1)]"
    return {
        "n_words": f"CAST(len({w}) AS INT)",
        "dup2": f"CAST(len({g2}) - len(list_distinct({g2})) AS INT)",
        "dup3": f"CAST(len({g3}) - len(list_distinct({g3})) AS INT)",
    }


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fp") -> DataFrame:
    """Order-sensitive polynomial rolling hash over words:

        acc = (acc*131 + len(w)*31 + ascii(w[0])) mod 1e9+7

    Engine-portable (same integer arithmetic in ANSI SQL), content- and
    order-sensitive, and fully JVM-side via ``aggregate``.
    """
    w = F.split(F.trim(F.col(text_col)), r"\s+")
    acc = F.aggregate(
        w,
        F.lit(0).cast("long"),
        lambda a, x: (a * FP_MULT + F.length(x) * 31 + F.ascii(F.substring(x, 1, 1)))
        % FP_MOD,
    )
    return df.withColumn(out_col, acc)


def fingerprint_sql(text_expr: str) -> str:
    w = f"string_split_regex(trim({text_expr}), '\\s+')"
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform({w}, "
        f"w -> CAST(length(w) * 31 + ascii(substr(w, 1, 1)) AS BIGINT))), "
        f"(a, b) -> (a * {FP_MULT} + b) % {FP_MOD})"
    )
