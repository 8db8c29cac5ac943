"""HTML -> text extraction (vectorized Arrow pass over ``html`` binary).

The canonical input table carries raw ``html:binary`` next to the
already-extracted ``text`` (BASELINE.json input_hint); on a fresh
Common-Crawl dump the pipeline must produce ``text`` itself. This is
the mapInArrow extractor SURVEY.md §2D reserves for that step — a
deterministic, dependency-free rule set (NOT a browser):

  1. drop <script>...</script> and <style>...</style> blocks
     (case-insensitive, dot-matches-newline, lazy);
  2. drop every remaining tag ``<[^>]*>`` (replaced by a space so
     adjacent text nodes don't fuse);
  3. decode the five basic entities (&lt; &gt; &quot; &#39;, with
     &amp; LAST so ``&amp;lt;`` decodes to ``&lt;`` not ``<``);
  4. collapse ASCII whitespace runs to one space and trim.

Every rule is RE2-safe, so the DuckDB oracle reproduces the function
byte-for-byte with regexp_replace — the extraction is oracle-checkable
like every other operator. Inputs are decoded as UTF-8 with
replacement (web reality: mislabeled encodings).
"""

from __future__ import annotations

import re

import numpy as np

_SCRIPT_RE = re.compile(rb"(?is)<script\b.*?</script>")
_STYLE_RE = re.compile(rb"(?is)<style\b.*?</style>")
_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(r"[ \t\r\n\f]+")
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]

EXTRACT_SQL_EXPR = (
    "trim(regexp_replace("
    "replace(replace(replace(replace(replace("
    "regexp_replace(regexp_replace(regexp_replace({col}, "
    "'(?is)<script\\b.*?</script>', ' ', 'g'), "
    "'(?is)<style\\b.*?</style>', ' ', 'g'), "
    "'<[^>]*>', ' ', 'g'), "
    "'&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), '&#39;', ''''), '&amp;', '&'), "
    "'[ \\t\\r\\n\\f]+', ' ', 'g'))"
)
"""DuckDB scalar expression mirroring :func:`extract_text` over a
VARCHAR column ``{col}`` (same rule order, same replacements)."""


def extract_text(html: bytes | None) -> str | None:
    """Pure extraction function — single source of truth (the Arrow
    batch path maps it; unit tests and the oracle contract cite it)."""
    if html is None:
        return None
    b = _SCRIPT_RE.sub(b" ", bytes(html))
    b = _STYLE_RE.sub(b" ", b)
    b = _TAG_RE.sub(b" ", b)
    s = b.decode("utf-8", errors="replace")
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return _WS_RE.sub(" ", s).strip()


def extract_text_map(it):
    """mapInArrow: (url, html binary) batches -> (url, text string)."""
    import pyarrow as pa

    for batch in it:
        urls = batch.column(0)
        htmls = batch.column(1).to_pylist()
        out = np.empty(len(htmls), dtype=object)
        for i, h in enumerate(htmls):
            out[i] = extract_text(h)
        yield pa.RecordBatch.from_arrays(
            [urls, pa.array(out.tolist(), type=pa.string())],
            names=[batch.schema.names[0], "text"],
        )


def extract_text_df(pages, html_col: str = "html", key_col: str = "url"):
    """DataFrame operator: (key, html) -> (key, text); key type preserved."""
    key_type = {f.name: f.dataType.simpleString() for f in pages.schema.fields}[key_col]
    return pages.select(key_col, html_col).mapInArrow(
        extract_text_map, f"{key_col} {key_type}, text string"
    )
