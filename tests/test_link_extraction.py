"""Crawl link extraction (functions/text.extract_links / resolve_href /
link_edges): href forms, resolution rules, malformed-html safety, and
the composition into pagerank over a tiny synthetic crawl."""

from pyspark.sql import functions as F

from erased_cells_spark.functions.text import extract_links, link_edges, resolve_href

HTML = (
    b"<html><body>"
    b'<a href="https://other.org/x">abs</a>'
    b'<a class="z" href="//cdn.example.org/lib">proto</a>'
    b'<a href="/local/page">root</a>'
    b'<a href="rel/page">rel</a>'
    b'<a href="mailto:a@b.c">mail</a>'
    b'<a href="https://nested.org/"><b>bold</b></a>'
    b"</body></html>"
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html binary")


def test_extract_and_resolve(spark):
    df = _pages(spark, [("https://h1.example.org/p/1", HTML)])
    links = df.select(F.explode(extract_links(F.col("html"))).alias("l")).select(
        "l.href", "l.anchor"
    )
    got = {(r.href, r.anchor) for r in links.collect()}
    # the nested-markup anchor has a '<' right after '>', so [^<]* matches
    # empty but the <a ...> still extracts by href
    assert ("https://other.org/x", "abs") in got
    assert ("//cdn.example.org/lib", "proto") in got
    assert ("/local/page", "root") in got
    assert ("rel/page", "rel") in got
    assert ("mailto:a@b.c", "mail") in got

    edges = link_edges(df)
    dsts = {r.dst for r in edges.collect()}
    assert dsts == {
        "https://other.org/x",
        "https://cdn.example.org/lib",
        "https://h1.example.org/local/page",
        "https://nested.org/",
    }  # rel + mailto dropped


def test_malformed_html_yields_no_links_not_errors(spark):
    rows = [
        ("https://h/1", b"<a href="),          # truncated
        ("https://h/2", b"no links at all"),
        ("https://h/3", b"<a href=''></a>"),   # empty href -> unresolvable
    ]
    assert link_edges(_pages(spark, rows)).count() == 0


def test_self_loops_dropped(spark):
    url = "https://h1.example.org/p/1"
    html = f'<a href="{url}">self</a><a href="https://h2/x">other</a>'.encode()
    rows = [(r.src, r.dst) for r in link_edges(_pages(spark, [(url, html)])).collect()]
    assert rows == [(url, "https://h2/x")]


def test_resolve_href_rules(spark):
    df = spark.createDataFrame(
        [("https://host.org/a/b",)], "base string"
    ).select(
        resolve_href(F.lit("https://x/y"), F.col("base")).alias("abs"),
        resolve_href(F.lit("//c.d/e"), F.col("base")).alias("proto"),
        resolve_href(F.lit("/r"), F.col("base")).alias("root"),
        resolve_href(F.lit("frag#x"), F.col("base")).alias("rel"),
        resolve_href(F.lit("javascript:void(0)"), F.col("base")).alias("js"),
    )
    [r] = df.collect()
    assert r.abs == "https://x/y"
    assert r.proto == "https://c.d/e"
    assert r.root == "https://host.org/r"
    assert r.rel is None
    # javascript: has no '://' so it fails the absolute-URL grammar and
    # resolves to NULL — dropped, which is exactly what a crawler wants
    assert r.js is None


def test_composes_into_pagerank(spark):
    # tiny crawl: ring + one hub
    urls = [f"https://s/{i}" for i in range(5)]
    rows = []
    for i, u in enumerate(urls):
        targets = [urls[(i + 1) % 5], urls[0]]
        html = "".join(f'<a href="{t_}">t</a>' for t_ in targets).encode()
        rows.append((u, html))
    edges = link_edges(_pages(spark, rows)).select("src", "dst").distinct()
    from erased_cells_spark.operators.graph import pagerank

    nodes = spark.createDataFrame([(u,) for u in urls], "id string")
    ranks = {r.id: r.rank for r in pagerank(nodes, edges, n_iter=5, id_col="id").collect()}
    assert len(ranks) == 5
    assert ranks[urls[0]] == max(ranks.values())  # the hub wins
