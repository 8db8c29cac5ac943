"""Deterministic synthetic fixtures (FIXTURES.md; seed=42; no external data).

``pages`` is the engine's canonical input table per BASELINE.json
``input_hint``: (url, warc_ts, html, text, lang) — the web-corpus
retarget of the reference's ``spot`` document
(/root/reference/search-engine/schemas/spot.sd:2-33).
``synonyms`` mirrors the reference's 2-column CSV dictionary
(/root/reference/synonym-data-generator/dict/synonym.csv:1-4).
``queries`` mirrors SearchCondition
(/root/reference/search-api/internal/domain/SearchCondition.go:9-21).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

VOCAB_SIZE = 50_000
STOPWORDS = ["the", "a", "of", "to", "in", "and", "is", "for", "on", "with"]
LANGS = ["en", "ja", "ko", "de"]


def _vocab() -> np.ndarray:
    return np.array([f"w{i:06d}" for i in range(VOCAB_SIZE)])


def _zipf_probs(s: float = 1.07, n: int = VOCAB_SIZE) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1, dtype=np.float64) ** s
    return p / p.sum()


def gen_pages(n: int, seed: int = 42, start: int = 0) -> pd.DataFrame:
    """FIXTURES.md §1 generation rules (normative). ``start`` offsets the
    row index i (urls/timestamps/langs) so chunked generation of a large
    corpus keeps urls globally unique."""
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    probs = _zipf_probs()

    i = np.arange(start, start + n)
    url = np.array([f"https://site{k // 10}.example/page{k}" for k in i])
    warc_ts = pd.Timestamp("2024-01-01T00:00:00Z").tz_localize(None) + pd.to_timedelta(
        i * 37, unit="s"
    )
    mod = i % 100
    lang = np.where(mod < 70, "en", np.where(mod < 85, "ja", np.where(mod < 95, "ko", "de")))

    # doc length ~ lognormal(mean=120 tokens, sigma=0.6), clipped 1..2000
    lengths = np.clip(
        np.round(rng.lognormal(mean=np.log(120.0), sigma=0.6, size=n)).astype(int),
        1,
        2000,
    )
    total = int(lengths.sum())
    token_idx = rng.choice(VOCAB_SIZE, size=total, p=probs)
    stop_draw = rng.random(total) < 0.35
    stop_pick = rng.integers(0, len(STOPWORDS), size=total)
    flat = np.where(
        stop_draw, np.array(STOPWORDS)[stop_pick], vocab[token_idx]
    )
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    texts = [" ".join(flat[offsets[k] : offsets[k + 1]]) for k in range(n)]

    # 2% empty, 1% null text
    text_draw = rng.random(n)
    text_col: list[str | None] = []
    for k in range(n):
        if text_draw[k] < 0.02:
            text_col.append("")
        elif text_draw[k] < 0.03:
            text_col.append(None)
        else:
            text_col.append(texts[k])

    html_draw = rng.random(n)
    html_col = [
        None
        if html_draw[k] < 0.05
        else b"<html><body>" + (text_col[k] or "").encode() + b"</body></html>"
        for k in range(n)
    ]

    return pd.DataFrame(
        {
            "url": url,
            "warc_ts": warc_ts,
            "html": html_col,
            "text": text_col,
            "lang": lang,
        }
    )


def gen_synonyms() -> list[tuple[str, str]]:
    """FIXTURES.md §2: 50 rows alias{k} -> w{k:06d}."""
    return [(f"alias{k}", f"w{k:06d}") for k in range(50)]


def gen_queries(seed: int = 42, n: int = 100) -> pd.DataFrame:
    """FIXTURES.md §3: reference query set."""
    rng = np.random.default_rng(seed + 1)
    vocab = _vocab()
    probs = _zipf_probs()
    rows = []
    limits = [5, 10, 20]
    pages_cycle = [1, 2, 3]
    for qid in range(n):
        n_terms = int(rng.integers(1, 5))
        terms = list(vocab[rng.choice(VOCAB_SIZE, size=n_terms, p=probs)])
        # inject stopwords sometimes so queries hit the Zipf head
        for j in range(n_terms):
            if rng.random() < 0.2:
                terms[j] = STOPWORDS[int(rng.integers(0, len(STOPWORDS)))]
        if qid % 10 == 0:
            terms[0] = f"alias{qid % 50}"
        lang_filter = None if rng.random() < 0.6 else LANGS[int(rng.integers(0, 4))]
        rows.append(
            {
                "query_id": qid,
                "query_text": " ".join(terms),
                "lang_filter": lang_filter,
                "limit": limits[qid % 3],
                "page": pages_cycle[qid % 3],
            }
        )
    return pd.DataFrame(rows)


def pages_spark_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), False),
        ]
    )


def write_pages_parquet(spark, out_path: str, n: int, seed: int = 42) -> None:
    """Persist the fixture corpus partitioned the way the 10^12-scale
    Iceberg table would be: days(warc_ts) + bucket(url) — here emulated
    with a derived date partition column (Iceberg jars absent in this
    image; see sources/tables.py)."""
    pdf = gen_pages(n, seed)
    df = spark.createDataFrame(pdf, schema=pages_spark_schema())
    df.write.mode("overwrite").parquet(out_path)
