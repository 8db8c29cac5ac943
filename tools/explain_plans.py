"""Dump physical plans of the engine's key operators to BENCH/PLANS.md.

Evidence that the plans are the ones you'd want at 100 TB:
  * parquet scans carry PushedFilters / PartitionFilters and pruned
    ReadSchema (no blob columns in metadata-only scans);
  * small sides broadcast (BroadcastHashJoin / BroadcastExchange);
  * aggregates are partial (map-side combine) long-sum HashAggregates
    inside WholeStageCodegen spans — no array buffers;
  * the LSH ANN indexed path shows bucket partition pruning.

Usage: python tools/explain_plans.py [n_docs]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def explain(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    import shutil

    from micce_search_engine_spark.corpus import gen_pages, gen_synonyms, pages_spark_schema
    from micce_search_engine_spark.operators.batch_query import _candidates
    from micce_search_engine_spark.operators.index_build import build_index
    from micce_search_engine_spark.operators.query import SearchEngine
    from micce_search_engine_spark.session import get_spark

    spark = get_spark("plans", master="local[8]", shuffle_partitions=8)
    pdf = gen_pages(n, seed=42)
    idx = "/tmp/mse_plans_idx"
    shutil.rmtree(idx, ignore_errors=True)
    pages = spark.createDataFrame(pdf, schema=pages_spark_schema())
    build_index(
        spark, pages, idx, n_buckets=8, max_postings_per_row=5000,
        with_positions=True,
    )
    syn = dict(gen_synonyms())
    eng = SearchEngine(spark, idx, synonyms=syn)

    sections: list[tuple[str, str, str]] = []

    # single-query scoring plan
    branches = [["the"], ["w000001"]]
    idf = eng.idf_map(["the", "w000001"])
    single = eng._scored(
        eng._postings(["the", "w000001"], mode="score", lang_id=0), idf, branches
    )
    sections.append(
        (
            "Single-query BM25 (decode -> fixed-point hash aggregate)",
            "Look for: PartitionFilters [bucket IN ...] + PushedFilters on term; "
            "ReadSchema WITHOUT unused blob columns; partial_sum(LongType) "
            "HashAggregate in WholeStageCodegen.",
            explain(single),
        )
    )

    # single-TERM query: no aggregate, no shuffle (round-4)
    idf1 = eng.idf_map(["the"])
    sections.append(
        (
            "Single-TERM query (round-4: shuffle-free)",
            "Look for: NO Exchange anywhere — a doc holds exactly one posting "
            "of a term, so scoring is a Project over the decode; the fused "
            "count+top-k then runs as one narrow stage.",
            explain(eng._scored(eng._postings(["the"], mode="score"), idf1, [["the"]])),
        )
    )

    # phrase plan (round-6: fused single decode, rarest-term bounded)
    eng.phrase_block_factor = 0  # force block-selection engagement
    base_p, conds_p = eng._phrase_core({0: ["the", "of"]})
    sections.append(
        (
            "Phrase matching (round-6: fused single decode, rarest-term bound)",
            "Look for: ONE positional scan (ReadSchema WITH pos_blob/"
            "block_pos_off) behind a BroadcastHashJoin against the "
            "rarest-term-derived block selection (term, salt, allowed) — the "
            "frequent terms' streams are never fully decoded in ANY mode "
            "(the only unrestricted decode is the rarest term's cheap "
            "score scan feeding the selection); adjacency is array_intersect "
            "Column math over a per-doc map aggregate — no position explode, "
            "no adjacency shuffle, no window.",
            explain(base_p.filter(conds_p[0]).select("doc_id")),
        )
    )
    eng.phrase_block_factor = SearchEngine.phrase_block_factor

    # serving mode: decoded-postings cache (round-4)
    srv = SearchEngine(spark, idx, synonyms=syn, preload="decoded")
    sections.append(
        (
            "Serving-mode decoded cache (round-4: preload='decoded')",
            "Look for: InMemoryTableScan (no parquet, no MapInArrow) with the "
            "term filter applied against the cached columnar batches; wf "
            "recomputed as Column math.",
            explain(
                srv._scored(
                    srv._postings(["the"], mode="score"), idf1, [["the"]]
                )
            ),
        )
    )
    srv._decoded_cached.unpersist()
    srv._segments_cached.unpersist()

    # batched plan
    specs = [
        {"query_id": 0, "query_text": "the w000002", "lang_filter": "en", "limit": 10, "page": 1},
        {"query_id": 1, "query_text": "alias0", "lang_filter": None, "limit": 5, "page": 2},
    ]
    cand, _, _ = _candidates(eng, specs, with_score=True)
    sections.append(
        (
            "Batched BM25 candidates (N queries, one plan)",
            "Look for (round-6 vectorized plan, batches <= 256 queries): ONE "
            "Exchange hashpartitioning(doc_id) of the decoded postings — no "
            "per-query fan-out join, no (query_id, doc_id) aggregate — then a "
            "single MapInArrow evaluating every query's candidacy + fixed-point "
            "score vectorized per doc chunk.",
            explain(cand),
        )
    )

    # dedup: minhash banding
    from micce_search_engine_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        pdf.head(2000)[["text"]].assign(doc_id=range(2000))[["doc_id", "text"]]
    )
    sections.append(
        (
            "MinHash-LSH near-dup pairs",
            "Look for (round-6): signatures from one codegen explode + "
            "partial-min HashAggregate (no distinct); band-bucket self-join "
            "(never CartesianProduct); verification as array_intersect over "
            "candidate docs' shingle arrays — NO shingle-keyed join anywhere.",
            explain(minhash_lsh_pairs(docs, threshold=0.5)),
        )
    )

    # ANN indexed probe scan
    from micce_search_engine_spark.operators.ann import build_ann_index, lsh_topk_indexed

    emb = spark.createDataFrame(
        [(i, [float((i * j) % 7 - 3) for j in range(16)]) for i in range(1, 400)],
        "vec_id long, embedding array<float>",
    )
    ann_dir = "/tmp/mse_plans_ann"
    shutil.rmtree(ann_dir, ignore_errors=True)
    build_ann_index(emb, ann_dir, dim=16)
    q = [0.5] * 16
    sections.append(
        (
            "Persisted LSH ANN probe scan",
            "Look for: PartitionFilters [bucket IN (...)] — only probe "
            "partitions read; TakeOrderedAndProject for top-k.",
            explain(lsh_topk_indexed(spark, ann_dir, q)),
        )
    )

    # WAND: surviving-block selection joined into the segment scan
    sel = eng._wand_block_selection(
        ["the", "w000001"], idf, k=10, branches=[["the"], ["w000001"]]
    )
    if sel is not None:
        wand = eng._postings(["the", "w000001"], block_join=sel, mode="score")
        sections.append(
            (
                "WAND surviving-block decode (relational selection)",
                "Look for: the (term, salt, allowed) selection joined into the "
                "bucket-pruned segment scan (no driver-side block lists; the "
                "join side is an aggregate Spark can broadcast at runtime); "
                "decode restricted by the allowed column.",
                explain(wand),
            )
        )

    # IVF: trained centroids, persisted list-partitioned index
    from micce_search_engine_spark.operators.ann import (
        build_ivf_index,
        ivf_topk_indexed,
        train_ivf_centroids,
    )

    cents = train_ivf_centroids(emb, dim=16, k=4, iters=2)
    ivf_dir = "/tmp/mse_plans_ivf"
    shutil.rmtree(ivf_dir, ignore_errors=True)
    build_ivf_index(emb, ivf_dir, cents)
    sections.append(
        (
            "Persisted IVF probe scan (trained centroids)",
            "Look for: PartitionFilters [ivf_list IN (...)] — only probe "
            "lists read; TakeOrderedAndProject for top-k.",
            explain(ivf_topk_indexed(spark, ivf_dir, q, n_probes=2)),
        )
    )

    out = ["# Physical plans (evidence of scale-shape)\n"]
    out.append(
        f"Generated by tools/explain_plans.py over a {n:,}-doc index; "
        "plans are data-size-independent modulo AQE coalescing.\n"
    )
    for title, what, plan in sections:
        out.append(f"\n## {title}\n\n{what}\n\n```\n{plan}```\n")
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "w") as f:
        f.write("".join(out))
    print("wrote BENCH/PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
