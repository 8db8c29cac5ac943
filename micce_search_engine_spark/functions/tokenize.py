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
morphological analysis of segmented scripts.

CJK handling (the kuromoji ``mode=search`` analog): unsegmented
Han/Kana runs carry no whitespace, so ``\\w+`` alone would emit one
giant token per sentence. Inside each ``\\w+`` token, maximal runs of
CJK characters (Hiragana, Katakana + prolonged sound mark, Han incl.
ext-A and compat ideographs, 々/〇) are re-emitted as overlapping
character BIGRAMS (runs of length 1 as the single char) — the standard
dictionary-free recall-preserving segmentation for Japanese/Chinese
(the same n-gram fallback Lucene's CJKAnalyzer uses). Non-CJK
sub-segments of a mixed token are emitted verbatim, in position order.
Applied identically at index and query time, an exact-phrase CJK query
becomes an AND of its bigrams — matching docs contain the phrase's
every bigram. ASCII text (and any text with no CJK) tokenizes exactly
as before.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WORD_RE = re.compile(r"\w+", re.UNICODE)
# Hiragana/Katakana (incl. ー U+30FC), CJK ext-A, unified ideographs,
# compat ideographs, 々 U+3005, 〇 U+3007
_CJK_RE = re.compile(
    r"[々〇぀-ヿ㐀-䶿一-鿿豈-﫿]+"
)


def expand_cjk_token(tok: str) -> list[str]:
    """Split one ``\\w+`` token into CJK bigrams + non-CJK sub-segments.

    Pure function of the token; no-op (returns ``[tok]``) when the
    token contains no CJK characters."""
    if not _CJK_RE.search(tok):
        return [tok]
    out: list[str] = []
    pos = 0
    for m in _CJK_RE.finditer(tok):
        if m.start() > pos:
            out.append(tok[pos : m.start()])
        run = m.group()
        if len(run) == 1:
            out.append(run)
        else:
            out.extend(run[i : i + 2] for i in range(len(run) - 1))
        pos = m.end()
    if pos < len(tok):
        out.append(tok[pos:])
    return out


def tokenize_text(text: str | None) -> list[str]:
    """Deterministic token stream for one document or query string.

    ASCII fast path: NFKC is the identity on ASCII and ASCII contains
    no CJK, so the bigram pass is skipped (output byte-identical to
    the plain ``\\w+`` rule)."""
    if text is None:
        return []
    if text.isascii():
        return _WORD_RE.findall(text.lower())
    s = unicodedata.normalize("NFKC", text).lower()
    toks = _WORD_RE.findall(s)
    if not _CJK_RE.search(s):
        return toks
    return [piece for tok in toks for piece in expand_cjk_token(tok)]


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) tokenizer; no per-row Spark UDF."""
    return texts.map(tokenize_text)
