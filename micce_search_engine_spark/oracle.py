"""Brute-force BM25 oracle — the stand-in for the reference's scorer.

The reference delegates matching + ranking to Vespa (enable-bm25,
/root/reference/search-engine/schemas/spot.sd:10-16), which cannot run
in this sandbox; per SURVEY.md §5.2 this pure-Python/numpy scorer over
the synthetic corpus defines the expected results. The Spark engine
must be rank-identical in (doc_id, score) with scores within 1e-9.

Shared semantics (both this oracle and operators/query.py):
  * tokenizer: functions.tokenize.tokenize_text (one source of truth);
  * N = total rows of pages; avgdl = mean token count over all rows
    (empty/null text counts as length 0);
  * idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)  [Lucene-style, >=0];
  * per-term contribution = floor(idf * wf * 1e9) as int64 FIXED-POINT,
    where wf = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)); doc score =
    sum of contributions / 1e9. Integer accumulation is exact and
    order-independent, so engine scores are bit-identical to this
    oracle under ANY partitioning (round 1 instead forced a sorted
    float accumulation order, whose array aggregates anti-scaled);
  * synonym expansion: exact-key lookup of the RAW query string
    (/root/reference/search-api/internal/repository/vespaRepository.go:22-29);
    a hit adds an OR branch for the synonym value ahead of the original
    (/root/reference/search-api/internal/repository/query/convertSpotNameQuery.go:5-22);
  * a doc is a candidate iff for SOME branch, ALL of that branch's
    tokens occur in the doc (Vespa `contains` AND-within-keyword,
    whereQuery.go:43-57) — then optional exact lang filter
    (category analog, spot.sd:24-28);
  * pagination: limit' = limit*page, offset = limit*(page-1); results =
    ordered[offset:offset+limit]; last_page = total - limit*page <= 0
    (queryBuilder.go:40-41, response.go:40-42);
  * order: score DESC, doc_id ASC.
"""

from __future__ import annotations

import math
from collections import Counter

from micce_search_engine_spark import BM25_B, BM25_K1
from micce_search_engine_spark.functions.tokenize import tokenize_text


def expand_branches(query_text: str, synonyms: dict[str, str]) -> list[list[str]]:
    """OR branches, each an AND list of tokens. Synonym branch first."""
    branches = []
    syn = synonyms.get(query_text)
    if syn is not None:
        toks = tokenize_text(syn)
        if toks:
            branches.append(toks)
    toks = tokenize_text(query_text)
    if toks:
        branches.append(toks)
    return branches


class BruteForceBM25:
    def __init__(self, pages_pdf):
        """pages_pdf: pandas DataFrame with url/text/lang columns."""
        pdf = pages_pdf.sort_values("url").reset_index(drop=True)
        self.urls = list(pdf["url"])
        self.langs = list(pdf["lang"])
        self.tokens = [tokenize_text(t) for t in pdf["text"]]
        self.doc_lens = [len(t) for t in self.tokens]
        self.tfs = [Counter(t) for t in self.tokens]
        self.N = len(pdf)
        self.avgdl = sum(self.doc_lens) / self.N if self.N else 0.0
        self.df: Counter = Counter()
        for c in self.tfs:
            self.df.update(c.keys())

    def idf(self, term: str) -> float:
        d = self.df.get(term, 0)
        return math.log((self.N - d + 0.5) / (d + 0.5) + 1.0)

    def search(
        self,
        query_text: str,
        lang_filter: str | None = None,
        limit: int = 10,
        page: int = 1,
        synonyms: dict[str, str] | None = None,
    ) -> dict:
        branches = expand_branches(query_text, synonyms or {})
        all_terms = sorted({t for b in branches for t in b})
        scored: list[tuple[float, int]] = []
        for doc_id in range(self.N):
            if lang_filter is not None and self.langs[doc_id] != lang_filter:
                continue
            tf = self.tfs[doc_id]
            if not any(all(t in tf for t in b) for b in branches):
                continue
            dl = self.doc_lens[doc_id]
            s_fx = 0
            for t in all_terms:
                f = tf.get(t, 0)
                if f:
                    wf = (
                        f
                        * (BM25_K1 + 1.0)
                        / (f + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / self.avgdl))
                    )
                    s_fx += math.floor(self.idf(t) * wf * 1e9)
            scored.append((s_fx / 1e9, doc_id))
        scored.sort(key=lambda x: (-x[0], x[1]))
        total = len(scored)
        offset = limit * (page - 1)
        window = scored[offset : offset + limit]
        return {
            "total_hits": total,
            "last_page": total - limit * page <= 0,
            "results": [(doc_id, s) for s, doc_id in window],
        }
