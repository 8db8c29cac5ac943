"""Text-analysis operators for large-scale training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen) — no Python
in the hot path. Each has an exact ANSI-SQL equivalent registered in
``__spark_entry__.oracle_sql`` so DuckDB can verify it.

Language ID uses a stopword-hit heuristic; quality scoring uses
length/word-shape/stopword ratios; token counting reports whitespace
tokens plus a BPE-ish subword estimate; fingerprinting is an MD5 of
the normalized text (the rolling-hash/winnowing variant lives in
operators/dedup.py as shingles).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny built-in stopword lists (deterministic; good enough for a
# heuristic language-ID over latin-script corpora)
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "to", "in", "and", "is", "for", "on", "with"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "ein", "für"],
    "fr": ["le", "la", "les", "et", "est", "de", "un", "une", "pour", "avec"],
    "es": ["el", "la", "los", "y", "es", "de", "un", "una", "para", "con"],
}


def tokens_col(text: Column) -> Column:
    """Whitespace tokens of lowercased text, empties removed — the
    Column-native (codegen) tokenizer used by the SQL-checkable
    operators. The indexing tokenizer (functions/tokenize.py) is the
    byte-identity one; this one exists so analysis ops stay JVM-side."""
    return F.filter(F.split(F.lower(F.coalesce(text, F.lit(""))), " "), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


def subword_estimate(text: Column) -> Column:
    """BPE-ish token estimate: ceil(chars/4) — the standard rough
    chars-per-token constant for latin corpora."""
    return F.ceil(F.length(F.coalesce(text, F.lit(""))) / F.lit(4.0)).cast("long")


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens_col(text)
    stops = LANG_STOPWORDS[lang]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(stops)))
    return (n_stop / F.greatest(F.size(toks), F.lit(1))).cast("double")


def mean_word_len(text: Column) -> Column:
    toks = tokens_col(text)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return (total / F.greatest(F.size(toks), F.lit(1))).cast("double")


def quality_score(text: Column, lang: str = "en") -> Column:
    """Composite document-quality heuristic in [0, 1]:
    0.4 * length_score (saturates at 100 tokens)
    + 0.3 * stopword presence (saturates at ratio 0.3)
    + 0.3 * word-shape score (mean word length in the 3..12 band)."""
    toks = tokens_col(text)
    n = F.size(toks).cast("double")
    length_score = F.least(n / F.lit(100.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(text, lang) / F.lit(0.3), F.lit(1.0))
    mwl = mean_word_len(text)
    shape_score = F.when((mwl >= 3.0) & (mwl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return (
        F.lit(0.4) * length_score + F.lit(0.3) * stop_score + F.lit(0.3) * shape_score
    ).cast("double")


def lang_id(text: Column) -> Column:
    """Heuristic language ID: the language whose stopword list scores the
    most hits; ties and zero hits -> 'und'. Deterministic tie-break by
    language code order."""
    toks = tokens_col(text)
    result = F.lit("und")
    best = F.lit(0)
    # iterate in sorted order with a strict '>' so the alphabetically
    # first language wins ties (mirrored exactly in the SQL oracle)
    for code in sorted(LANG_STOPWORDS):
        hits = F.size(F.filter(toks, lambda t: t.isin(LANG_STOPWORDS[code])))
        result = F.when(hits > best, F.lit(code)).otherwise(result)
        best = F.greatest(hits, best)
    return result


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of NFC-agnostic
    lowercase text (exact-dup key)."""
    return F.md5(F.lower(F.coalesce(text, F.lit(""))))
