"""Syndication removal (SURVEY.md §2 I11).

Reference: recap-worker pipeline/pulse/syndication.rs:185-326 — three
stacked collapses: canonical-URL dedup, wire-source host filtering, and
title-similarity collapse across hosts.

Composition over new machinery: URL canonicalization is a regexp chain,
canonical dedup reuses the first-wins window, and the title collapse
reuses the SimHash near-dup join from operators.dedup — each stage a
narrow/hash-partitioned plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from alt_spark.operators import dedup

__all__ = ["canonical_url", "remove_syndication"]

# Tracking params the canonicalizer strips (utm_*, fbclid, gclid, ref).
_TRACKING = r"(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*"


def canonical_url(url: Column) -> Column:
    """Normalize: lowercase scheme+host, strip www., default ports,
    tracking params, fragments, trailing slash (syndication.rs:326's
    normalize-before-compare)."""
    c = F.trim(url)
    # lowercase scheme+authority only (path stays case-sensitive)
    c = F.concat(
        F.lower(F.regexp_extract(c, r"^([a-zA-Z]+://[^/]*)", 1)),
        F.regexp_extract(c, r"^[a-zA-Z]+://[^/]*(.*)$", 1),
    )
    c = F.regexp_replace(c, r"^(https?://)www\.", r"$1")
    c = F.regexp_replace(c, r":(80|443)(/|$)", r"$2")
    c = F.regexp_replace(c, _TRACKING, "")
    # collapse separators left behind by stripped params
    c = F.regexp_replace(c, r"\?&+", "?")
    c = F.regexp_replace(c, r"&&+", "&")
    c = F.regexp_replace(c, r"[?&]+(#|$)", r"$1")
    c = F.regexp_replace(c, r"#.*$", "")
    c = F.regexp_replace(c, r"\?$", "")
    return F.regexp_replace(c, r"/$", "")


def remove_syndication(
    df: DataFrame,
    url_col: str = "link",
    title_col: str = "title",
    id_col: str = "article_id",
    wire_hosts: tuple[str, ...] = (),
    collapse_titles: bool = True,
) -> DataFrame:
    """Three-stage syndication collapse; first-wins by id at each stage.

    1. canonical-URL dedup (same story re-posted with tracking params)
    2. wire-source host filter (hosts that only relay agency copy)
    3. cross-host title collapse via SimHash (near-identical headlines)
    """
    canon = df.withColumn("__curl", canonical_url(F.col(url_col)))
    w = Window.partitionBy("__curl").orderBy(id_col)
    stage1 = canon.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    ).drop("__rn")

    host = F.lower(F.regexp_extract(F.col("__curl"), r"^[a-z]+://([^/:]+)", 1))
    stage2 = stage1.filter(~host.isin(list(wire_hosts)) if wire_hosts else F.lit(True))

    if not collapse_titles:
        return stage2.drop("__curl")

    pairs = dedup.simhash_near_dup(
        stage2, text_col=title_col, id_col=id_col, max_hamming=3
    )
    losers = pairs.select(F.col("id2").alias(id_col)).distinct()
    return stage2.join(losers, id_col, "left_anti").drop("__curl")
