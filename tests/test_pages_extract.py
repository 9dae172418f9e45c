from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.sources.extract import extract_pages, page_links, pages_to_graph
from linkgraph.sources.pages import generate_pages


def test_pages_deterministic_across_partitionings(spark):
    a = generate_pages(spark, 60, seed=42, partitions=1).orderBy("url").collect()
    b = generate_pages(spark, 60, seed=42, partitions=7).orderBy("url").collect()
    assert [(r.url, r.text, bytes(r.html)) for r in a] == [
        (r.url, r.text, bytes(r.html)) for r in b
    ]


def test_extracted_text_byte_identical(spark):
    """The per-row invariant (BASELINE.json input_hint): the extractor's
    tag-stripping output equals the generator's independently composed
    text column, byte for byte, for every url."""
    pages = generate_pages(spark, 200, seed=42)
    joined = (
        extract_pages(spark, pages)
        .withColumnRenamed("text", "extracted")
        .join(pages.select("url", "text"), "url")
    )
    bad = joined.filter(
        F.encode("extracted", "utf-8") != F.encode("text", "utf-8")
    ).count()
    assert bad == 0
    assert joined.count() == 200


def test_links_extracted_in_document_order(spark):
    pages = generate_pages(spark, 50, seed=1)
    links = page_links(spark, pages)
    assert links.count() >= 50  # every page emits >= 1 link
    # all hrefs point at in-domain page urls
    assert links.filter(~F.col("out_url").startswith("https://site")).count() == 0


def test_pages_to_graph_builds_symmetric_edges(spark):
    pages = generate_pages(spark, 120, seed=42)
    directed, undirected, dictionary = pages_to_graph(spark, pages)
    assert dictionary.count() == 120
    fwd = undirected.filter("src != dst").select("src", "dst", "weight")
    rev = fwd.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
    )
    assert fwd.exceptAll(rev).count() == 0
    # hub skew present: max in-degree well above the median
    indeg = directed.groupBy("dst").count()
    stats = indeg.agg(F.max("count").alias("mx"), F.expr("percentile(count, 0.5)").alias("md")).first()
    assert stats["mx"] >= 4 * stats["md"]


def test_pagerank_on_extracted_graph_matches_oracle(spark):
    """End-to-end Stage-0 spine: pages -> extraction -> graph ->
    PageRank@1e-8 vs the NumPy oracle."""
    from linkgraph.operators.pagerank import pagerank
    from tests.oracles import pagerank_oracle

    pages = generate_pages(spark, 150, seed=42)
    directed, _, _ = pages_to_graph(spark, pages)
    edges = [(r.src, r.dst, r.weight) for r in directed.collect()]
    got = {r.id: r.score for r in pagerank(spark, directed, tol=1e-8).collect()}
    want = pagerank_oracle(edges, tol=1e-8)
    assert set(got) == set(want)
    assert all(abs(got[k] - want[k]) < 1e-6 for k in want)
