"""Idempotent document upsert with omit-nil partial-update semantics.

Reference behavior being reproduced set-oriented:
  * ``PUT /document/v1/...?create=true`` — create-if-missing upsert
    (/root/reference/indexer/internal/repository/vespa/vespa_client.go:29-55);
  * nil fields are omitted from the feed body so existing values are
    NOT overwritten (``omitempty`` assigns,
    vespa_client.go:57-118, body.go:3-18);
  * replaying the same update is a no-op (at-least-once safety,
    index_service.go:130-138).

On Iceberg/Delta this is literally ``MERGE INTO pages USING updates ON
url WHEN MATCHED THEN UPDATE SET col = coalesce(u.col, t.col) WHEN NOT
MATCHED THEN INSERT`` — those runtimes aren't in this image, so
``merge_pages`` emulates the same semantics with a full-outer-join
rewrite (equivalent output table; atomic swap by path rename), and
``affected_terms`` computes the index delta: the set of terms whose
posting lists a rebuild must touch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from micce_search_engine_spark.functions.tokenize import tokenize_udf


def merge_pages(target: DataFrame, updates: DataFrame, key: str = "url") -> DataFrame:
    """Omit-nil MERGE: null columns in ``updates`` leave target values
    untouched; unmatched update rows are inserted; re-applying the same
    updates is idempotent."""
    cols = [c for c in target.columns if c != key]
    u = updates.select(
        F.col(key), *[F.col(c).alias(f"_u_{c}") for c in cols if c in updates.columns]
    )
    joined = target.alias("t").join(u, key, "full_outer")
    out_cols = [F.col(key)]
    for c in cols:
        if f"_u_{c}" in u.columns:
            out_cols.append(F.coalesce(F.col(f"_u_{c}"), F.col(f"t.{c}")).alias(c))
        else:
            out_cols.append(F.col(f"t.{c}").alias(c))
    return joined.select(*out_cols)


def affected_terms(old: DataFrame, new: DataFrame, key: str = "url") -> DataFrame:
    """Index-delta scope after an upsert: distinct terms of changed docs
    (old tokens ∪ new tokens for every url whose text changed). The
    delta rebuild re-encodes only these terms' posting rows — the
    set-oriented analog of the reference's per-doc re-feed."""
    o = old.select(key, F.col("text").alias("_old_text"))
    n = new.select(key, F.col("text").alias("_new_text"))
    changed = (
        o.join(n, key, "full_outer")
        .filter(
            ~(
                F.col("_old_text").eqNullSafe(F.col("_new_text"))
            )
        )
    )
    toks = changed.select(
        F.explode(
            F.array_union(
                F.coalesce(tokenize_udf(F.col("_old_text")), F.array()),
                F.coalesce(tokenize_udf(F.col("_new_text")), F.array()),
            )
        ).alias("term")
    )
    return toks.distinct()
