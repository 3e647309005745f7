"""`spark.read.format("rss")` — RSS/Atom as a first-class pluggable
source via Spark 4's Python DataSource API (SURVEY.md §2.A1 ⊕).

`sources/rss.py` parses feeds that are already rows; this module makes
feeds a SOURCE: register once per session, then

    spark.dataSource.register(RssDataSource)
    spark.read.format("rss").load("/path/to/feeds") \
         .filter(...).join(...)           # ordinary DataFrame from here

Scale shape: one input partition per feed file (`partitions()` returns
a `FeedPartition` per file), so a directory of N feeds fans out across
min(N, cores) tasks and each task parses only its own file — the same
per-feed parallelism the reference gets from one fetch job per feed
(pre-processor article_driver.go). Parsing inside `read()` is
stdlib-only (`xml.etree`) and emits plain tuples in ARTICLE_SCHEMA
order; Spark handles Arrow transfer and schema enforcement. The
`from_xml` expression path in sources/rss.py stays the declarative
twin — equivalence is test-enforced
(tests/test_sources.py::test_rss_datasource_matches_expression_parser).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from alt_spark.sources.rss import ARTICLE_SCHEMA

__all__ = ["RssDataSource"]

_ALLOWED_SCHEMES = ("http://", "https://")


class FeedPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _text(elem, tag):
    child = elem.find(tag)
    return child.text if child is not None else None


def _strip_ns(root):
    """Drop XML namespaces in-place so RSS and Atom tags address the
    same way regardless of xmlns declarations (feedparser behavior)."""
    for el in root.iter():
        if "}" in el.tag:
            el.tag = el.tag.split("}", 1)[1]
    return root


def _parse_feed(path: str):
    import xml.etree.ElementTree as ET

    try:
        root = _strip_ns(ET.parse(path).getroot())
    except ET.ParseError:
        return  # malformed feed file → zero rows, like the reference's skip
    feed_url = path
    if root.tag == "rss":  # RSS 2.0: rss > channel > item*
        channel = root.find("channel")
        items = channel.findall("item") if channel is not None else []
        for it in items:
            link = _text(it, "link")
            if link and link.startswith(_ALLOWED_SCHEMES):
                yield (
                    feed_url,
                    _text(it, "title"),
                    link,
                    _text(it, "pubDate"),
                    _text(it, "description"),
                )
    elif root.tag == "feed":  # Atom: feed > entry*
        for it in root.findall("entry"):
            link_el = it.find("link")
            link = link_el.get("href") if link_el is not None else None
            if link and link.startswith(_ALLOWED_SCHEMES):
                yield (
                    feed_url,
                    _text(it, "title"),
                    link,
                    _text(it, "updated"),
                    _text(it, "summary"),
                )


class RssReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("rss source requires a path: .load('/dir/of/feeds')")

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith((".xml", ".rss", ".atom"))
            )
        else:
            files = [self.path]
        return [FeedPartition(p) for p in files]

    def read(self, partition):
        yield from _parse_feed(partition.path)


class RssStreamReader(SimpleDataSourceStreamReader):
    """`spark.readStream.format("rss")` — a feed-directory tail.

    The reference polls feeds on a schedule and ingests whatever is new
    (pre-processor's cron fetch); this is that model as a Structured
    Streaming source: the offset is the sorted list of feed files
    already ingested, each micro-batch parses only files that appeared
    since, and replay between committed offsets is deterministic
    (`readBetweenOffsets` re-parses exactly the files in the offset
    delta — landed files are immutable, so recovery is exact).
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("rss source requires a path: .load('/dir/of/feeds')")

    def _list(self):
        if not os.path.isdir(self.path):
            return [self.path] if os.path.exists(self.path) else []
        return sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith((".xml", ".rss", ".atom"))
        )

    def initialOffset(self):
        return {"files": []}

    def read(self, start):
        seen = set(start.get("files", []))
        now = self._list()
        rows = [r for p in now if p not in seen for r in _parse_feed(p)]
        return iter(rows), {"files": now}

    def readBetweenOffsets(self, start, end):
        seen = set(start.get("files", []))
        for p in end.get("files", []):
            if p not in seen:
                yield from _parse_feed(p)


class RssDataSource(DataSource):
    """Register with `spark.dataSource.register(RssDataSource)`."""

    @classmethod
    def name(cls):
        return "rss"

    def schema(self):
        return ARTICLE_SCHEMA

    def reader(self, schema):
        return RssReader(self.options)

    def simpleStreamReader(self, schema):
        return RssStreamReader(self.options)
