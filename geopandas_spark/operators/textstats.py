"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

Design rule: anything expressible in pure Catalyst stays JVM-side (token
counts, ratios) so whole-stage codegen applies; only the n-gram language
profile runs as an Arrow UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# tiny stopword profiles for the language-ID heuristic (top function words)
_LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "von", "sie", "mit", "den"],
    "fr": ["le", "la", "les", "de", "et", "est", "que", "une", "dans", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "es", "por"],
}


def token_count(text) -> Column:
    """Whitespace token count — pure Catalyst (codegen'd, no UDF)."""
    t = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(t)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def word_token_count(text) -> Column:
    """BPE-ish token estimate: words + punctuation clusters."""
    t = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(t, F.lit(r"\w+|[^\w\s]+"), 0))


def quality_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_chars_calc, n_tokens, alpha_ratio, punct_ratio, upper_ratio,
    mean_token_len, stopword_ratio (en), quality_score — all Catalyst."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^!-/:-@\[-`{-~]", ""))
    n_upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    toks = token_count(t)
    stop_re = r"(?i)\b(" + "|".join(_LANG_PROFILES["en"]) + r")\b"
    n_stop = F.size(F.regexp_extract_all(t, F.lit(stop_re), 0))
    out = (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", toks)
        .withColumn("alpha_ratio", n_alpha / F.greatest(n_chars, F.lit(1)))
        .withColumn("punct_ratio", n_punct / F.greatest(n_chars, F.lit(1)))
        .withColumn("upper_ratio", n_upper / F.greatest(n_chars, F.lit(1)))
        .withColumn(
            "mean_token_len",
            n_chars / F.greatest(toks, F.lit(1)),
        )
        .withColumn("stopword_ratio", n_stop / F.greatest(toks, F.lit(1)))
    )
    return out.withColumn(
        "quality_score",
        (F.least(F.col("alpha_ratio") * 1.2, F.lit(1.0))
         + F.least(F.col("stopword_ratio") * 3.0, F.lit(1.0))
         + F.when((F.col("mean_token_len") >= 3) & (F.col("mean_token_len") <= 10),
                  F.lit(1.0)).otherwise(F.lit(0.0))
         - F.least(F.col("punct_ratio") * 2.0, F.lit(1.0))) / 3.0,
    )


def lang_id(df: DataFrame, text_col: str = "text",
            out_col: str = "lang_pred") -> DataFrame:
    """Stopword-profile language ID (n-gram heuristic): argmax over
    per-language function-word hit counts; 'und' (undetermined) when no
    profile scores."""
    langs = sorted(_LANG_PROFILES)
    import re as _re

    pats = {
        lang: _re.compile(r"\b(" + "|".join(map(_re.escape, words)) + r")\b")
        for lang, words in _LANG_PROFILES.items()
    }

    @pandas_udf("string")
    def _lid(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if not t:
                out.append("und")
                continue
            low = t.lower()
            scores = [len(pats[lang].findall(low)) for lang in langs]
            best = int(np.argmax(scores))
            out.append(langs[best] if scores[best] > 0 else "und")
        return pd.Series(out)

    return df.withColumn(out_col, _lid(F.col(text_col)))


def repetition_stats(df: DataFrame, text_col: str = "text",
                     n: int = 2) -> DataFrame:
    """Gopher-style intra-document repetition signals — the standard
    training-corpus quality filters for boilerplate / SEO-spam text
    (Rae et al. 2021 §A1.1 'repetition removal'). Adds

      n_words          whitespace word count (lowercased, trimmed)
      n_distinct_words distinct words
      dup_word_frac    1 - n_distinct_words / n_words
      top_ngram_n      occurrences of the MOST frequent word n-gram
      top_ngram_frac   top_ngram_n / (n_words - n + 1)
      dup_line_frac    1 - distinct lines / lines (newline-split)

    Everything is pure Catalyst (split / higher-order functions): the top
    n-gram count is a linear run-length scan over the SORTED gram array
    (aggregate over array_sort), so no per-document explode, no shuffle —
    at corpus scale this is a map-only stage that whole-stage codegen
    fuses with the scan."""
    # NULL-safe and whitespace-exact: F.trim strips only ASCII spaces, so
    # a trailing tab/newline (ubiquitous in scraped corpora) would leave
    # a phantom '' token after the split and inflate every count — strip
    # \s at both ends with a regex instead (review finding, pinned in
    # test_repetition_stats).
    t = F.coalesce(F.col(text_col), F.lit(""))
    stripped = F.regexp_replace(F.lower(t), r"^\s+|\s+$", "")
    words = F.split(stripped, r"\s+")
    nw = F.when(F.length(stripped) == 0, F.lit(0)).otherwise(F.size(words))
    grams = F.when(
        nw >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - F.lit(n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, i + j) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    acc0 = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                    F.lit(0).alias("best"))

    def _merge(acc, g):
        run = F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(g.alias("prev"), run.alias("run"),
                        F.greatest(acc["best"], run).alias("best"))

    top_n = F.aggregate(F.array_sort(grams), acc0, _merge,
                        lambda acc: acc["best"])
    ndw = F.size(F.array_distinct(words))
    lines = F.split(t, r"\n")
    nl = F.size(lines)
    return (
        df.withColumn("n_words", nw)
        .withColumn("n_distinct_words",
                    F.when(nw == 0, F.lit(0)).otherwise(ndw))
        .withColumn("dup_word_frac",
                    F.when(nw == 0, F.lit(0.0))
                    .otherwise(1.0 - ndw / nw.cast("double")))
        .withColumn(f"top_{n}gram_n", top_n)
        .withColumn(
            f"top_{n}gram_frac",
            F.when(nw < n, F.lit(0.0))
            .otherwise(top_n / (nw - F.lit(n - 1)).cast("double")))
        .withColumn("dup_line_frac",
                    1.0 - F.size(F.array_distinct(lines)) / nl.cast("double"))
    )


def fingerprint(df: DataFrame, text_col: str = "text",
                out_col: str = "doc_fp") -> DataFrame:
    """64-bit content fingerprint of normalized text — pure Catalyst
    (xxhash64 over lowercased whitespace-collapsed text)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return df.withColumn(out_col, F.xxhash64(norm))


# PII patterns chosen to parse and match IDENTICALLY under Java regex
# (Spark) and RE2 (DuckDB) — no backreferences, no lookaround — so the
# operator has a full SQL oracle. Counts are computed independently per
# kind on the ORIGINAL text (overlapping kinds both count); scrubbing
# applies the kinds in the caller's order, first pattern wins.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_scrub(df: DataFrame, text_col: str = "text",
              kinds: tuple = ("email", "ssn", "phone", "ipv4"),
              tag: str = "[{kind}]") -> DataFrame:
    """Redact common PII from a text corpus before training — the
    standard compliance pass of an LLM data pipeline. Adds, per kind in
    ``kinds``, an ``n_<kind>`` match count (on the original text) and a
    ``<text_col>_scrubbed`` column with every match replaced by ``tag``
    (a ``{kind}`` placeholder names the class, preserving document
    structure for downstream quality filters).

    Pure Catalyst (regexp_count/regexp_replace — whole-stage codegen,
    map-only, no shuffle): scales as a projection at any corpus size.
    Patterns are deliberately regex-dialect-portable so external SQL
    engines reproduce the outputs bit-for-bit.
    """
    unknown = [k for k in kinds if k not in PII_PATTERNS]
    if unknown:
        raise ValueError(f"unknown PII kinds {unknown} "
                         f"(supported: {sorted(PII_PATTERNS)})")
    src = F.coalesce(F.col(text_col), F.lit(""))
    out = df
    for kind in kinds:
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(src, F.lit(PII_PATTERNS[kind])))
    scrub = src
    for kind in kinds:
        scrub = F.regexp_replace(scrub, PII_PATTERNS[kind],
                                 tag.format(kind=kind))
    return out.withColumn(f"{text_col}_scrubbed", scrub)
