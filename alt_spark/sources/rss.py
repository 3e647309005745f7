"""RSS/Atom feed ETL → article rows (SURVEY.md §2.A1).

Reference: the feed ingestion path — pre-processor fetches and parses
feeds into article rows (pre-processor/app/driver/backend_api/
article_driver.go; recap-worker/recap-worker/src/pipeline/fetch.rs).
Fetching is out of engine scope (no network here); the engine contract
starts where fetched XML documents have been landed as files/rows and
must become typed article rows.

Spark-native parse: `from_xml` with a pinned item schema (Spark 4's
built-in XML support) — one declarative plan, per-item explode, RSS and
Atom branches unified by a `when()` on the root element. URL allowlist
guard (B9, knowledge-sovereign projector.go:511-529) applied at the
boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["ARTICLE_SCHEMA", "parse_feeds", "read_rss_dir"]

ARTICLE_SCHEMA = T.StructType(
    [
        T.StructField("feed_url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("link", T.StringType()),
        T.StructField("published", T.StringType()),
        T.StructField("summary", T.StringType()),
    ]
)

# RSS 2.0: <rss><channel><item>...</item></channel></rss>
_RSS_SCHEMA = T.StructType(
    [
        T.StructField(
            "channel",
            T.StructType(
                [
                    T.StructField("title", T.StringType()),
                    T.StructField(
                        "item",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("title", T.StringType()),
                                    T.StructField("link", T.StringType()),
                                    T.StructField("pubDate", T.StringType()),
                                    T.StructField("description", T.StringType()),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        )
    ]
)

# Atom: <feed><entry>...</entry></feed>
_ATOM_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField(
            "entry",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("title", T.StringType()),
                        T.StructField(
                            "link",
                            T.StructType([T.StructField("_href", T.StringType())]),
                        ),
                        T.StructField("updated", T.StringType()),
                        T.StructField("summary", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

_URL_ALLOW = r"^https?://"


def parse_feeds(df: DataFrame, xml_col: str = "xml", url_col: str = "feed_url") -> DataFrame:
    """(feed_url, xml) rows → one article row per item/entry.

    Branches on the root element; items explode laterally (C9); the
    http(s) allowlist rlike guard (B9) drops javascript:/data: links the
    way the projector's URL validation does.
    """
    xml = F.col(xml_col)
    is_atom = xml.rlike(r"<feed[\s>]")

    rss = F.from_xml(xml, _RSS_SCHEMA)
    atom = F.from_xml(xml, _ATOM_SCHEMA)

    rss_rows = (
        df.filter(~is_atom)
        .select(F.col(url_col), F.explode(rss["channel"]["item"]).alias("it"))
        .select(
            F.col(url_col).alias("feed_url"),
            F.col("it.title").alias("title"),
            F.col("it.link").alias("link"),
            F.col("it.pubDate").alias("published"),
            F.col("it.description").alias("summary"),
        )
    )
    atom_rows = (
        df.filter(is_atom)
        .select(F.col(url_col), F.explode(atom["entry"]).alias("it"))
        .select(
            F.col(url_col).alias("feed_url"),
            F.col("it.title").alias("title"),
            F.col("it.link._href").alias("link"),
            F.col("it.updated").alias("published"),
            F.col("it.summary").alias("summary"),
        )
    )
    return rss_rows.unionByName(atom_rows).filter(F.col("link").rlike(_URL_ALLOW))


def read_rss_dir(spark: SparkSession, path: str) -> DataFrame:
    """Landed feed files (wholetext: one XML document per file) → articles."""
    raw = spark.read.format("text").option("wholetext", "true").load(path)
    named = raw.select(
        F.regexp_replace(F.input_file_name(), r"^file:", "").alias("feed_url"),
        F.col("value").alias("xml"),
    )
    return parse_feeds(named)
