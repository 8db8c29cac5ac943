"""Tokenization — the engine's analog of the reference's kuromoji analyzer.

Reference: the Vespa package configures a kuromoji Japanese tokenizer
with ``mode=search`` and ``ignore_case=true``
(/root/reference/search-engine/local/services.xml:7-12) applied to the
``index`` fields at both index time and query time
(/root/reference/search-engine/schemas/spot.sd:9-17).

Our contract (BASELINE.json input_hint): a deterministic, vectorized
tokenizer applied byte-identically to document text at index time and
to query strings at query time. The exact pure function
``tokenize_text`` below is the single source of truth — the brute-force
oracle imports it, the pandas_udf wraps it, and query compilation calls
it on the driver. NFKC + lowercase mirrors ``ignore_case: true``;
``\\w+`` unicode word segmentation is the language-neutral stand-in for
morphological analysis (kuromoji itself is JVM-only and out of scope).
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WORD_RE = re.compile(r"\w+", re.UNICODE)


def tokenize_text(text: str | None) -> list[str]:
    """Deterministic token stream for one document or query string.

    ASCII fast path: NFKC is the identity on ASCII, so skipping the
    normalize call changes nothing (output stays byte-identical)."""
    if text is None:
        return []
    if text.isascii():
        return _WORD_RE.findall(text.lower())
    return _WORD_RE.findall(unicodedata.normalize("NFKC", text).lower())


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) tokenizer; no per-row Spark UDF."""
    return texts.map(tokenize_text)
