"""S5: HTML -> (text, out-links) extraction via Arrow-vectorized
pandas operations inside ``mapInPandas`` — the engine's only Python
hot path, batched per Arrow block (input_hint: "no per-row Python").

Extraction rules (the per-row invariant: byte-identical extracted
text per url vs the generator's independent composition):
* text  = all tag-stripped text nodes, whitespace-normalized to
  single spaces (tags replaced by a space, then split/join);
* links = every ``<a href="...">anchor</a>`` occurrence in order.

At 10^12-doc scale this runs as a straight map over the pages table
(no shuffle); the shuffle begins at the url->id dictionary join
(graph.build.url_dictionary / renumber).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.graph.build import build_graph, renumber, url_dictionary

_TAG = re.compile(r"<[^>]+>")
_LINK = re.compile(r'<a href="([^"]+)">([^<]*)</a>')


def _decode(html: pd.Series) -> pd.Series:
    return html.map(lambda b: b.decode("utf-8", errors="replace"))


def extract_text_series(html: pd.Series) -> pd.Series:
    s = _decode(html)
    stripped = s.str.replace(_TAG, " ", regex=True)
    return stripped.str.split().str.join(" ")


def extract_links_series(html: pd.Series) -> pd.Series:
    """Per row: list of (href, anchor) tuples, document order."""
    return _decode(html).map(_LINK.findall)


def extract_pages(spark: SparkSession, pages: DataFrame) -> DataFrame:
    """(url, text, links array<struct<href string, anchor string>>)."""

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "text": extract_text_series(pdf["html"]),
                    "links": extract_links_series(pdf["html"]).map(
                        lambda ls: [{"href": h, "anchor": a} for h, a in ls]
                    ),
                }
            )

    return pages.select("url", "html").mapInPandas(
        run, schema="url string, text string, links array<struct<href string, anchor string>>"
    )


def page_links(spark: SparkSession, pages: DataFrame) -> DataFrame:
    """Exploded link relation (url, out_url, anchor).

    Links-only extraction: an opaque mapInPandas defeats Spark's
    column pruning (guide §4 — the planner cannot see that downstream
    drops ``text``), so the graph-ingest spine must not compute the
    tag-strip/whitespace-normalize text pass or ship the text column
    through Arrow at all. Same link rows as ``extract_pages`` (the
    regex and row order are shared)."""

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "links": extract_links_series(pdf["html"]).map(
                        lambda ls: [{"href": h, "anchor": a} for h, a in ls]
                    ),
                }
            )

    ex = pages.select("url", "html").mapInPandas(
        run, schema="url string, links array<struct<href string, anchor string>>"
    )
    return ex.select(
        "url", F.explode("links").alias("l")
    ).select("url", F.col("l.href").alias("out_url"), F.col("l.anchor").alias("anchor"))


def pages_to_graph(
    spark: SparkSession, pages: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Full ingest: pages -> (directed_edges, undirected_edges, url_dict).

    Links whose target url never appears as a page url are dropped by
    the dictionary join (dangling-target policy; the reference's
    renumber likewise keeps only nodes present in the graph).
    Duplicate links between the same pair merge with weight = count.
    """
    links = page_links(spark, pages)
    dictionary = url_dictionary(pages.select("url"))
    mapping = dictionary.select(F.col("url").alias("old"), "id")
    raw = links.select(
        F.col("url").alias("src"), F.col("out_url").alias("dst"), F.lit(1.0).alias("weight")
    )
    directed = (
        renumber(raw, mapping)
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )
    undirected = build_graph(directed)
    return directed, undirected, dictionary
