"""On-page structured data (operators/structured.py): JSON-LD blocks,
meta tags, microdata, HTML tables, Hearst patterns — expectations
hand-written (no generated SQL). The cross-engine value normal form
(numbers re-serialized, escapes decoded, nested objects compacted) is
pinned here because the contract-row hash equality depends on it."""

from pyspark.sql import functions as F

from case_uco_ontology_map_spark.operators.structured import (
    annotation_census,
    hearst_isa,
    html_tables,
    jsonld_blocks,
    jsonld_triples,
    meta_tags,
    meta_triples,
    microdata_items,
    microdata_triples,
    table_triples,
    typed_literals,
)

_HTML = """<html><head>
<meta property="og:title" content="Widget Page">
<meta name="description" content="A widget.">
<meta charset="utf-8">
<script type="application/ld+json">{"@type":"Product","name":"Widget",
 "price": 0.50, "big": 1e3, "inStock":true, "note": null,
 "sameAs":["https://a","https://b"],
 "brand":{"@id":"https://ex.org/b1"},
 "maker":{"name":"no id here"}}</script>
<script type="text/javascript">var x = 1;</script>
<script type="application/ld+json">{"@id":"https://ex.org/p1",
 "@type":"https://schema.org/Person","name":"Ada \\"the first\\""}</script>
<script type="application/ld+json">{this is not json</script>
<script type="application/ld+json">["top-level array"]</script>
</head><body>
<div itemscope itemtype="https://schema.org/Product">
  <meta itemprop="sku" content="SKU-1">
  <span itemprop="name">Gadget <b>Pro</b></span>
  <span itemprop="page">https://ex.org/g</span>
</div>
<div itemscope class="no-type">
  <span itemprop="name">ignored — no itemtype</span>
</div>
<table class="t"><tr><th>Name</th><th> Price (USD) </th></tr>
<tr><td><b>A</b></td><td>3</td></tr>
<tr><td>B</td><td></td></tr></table>
<table><tr><td>no</td><td>header</td></tr></table>
</body></html>"""


def _page(spark, html=_HTML, url="https://h.org/p"):
    return spark.createDataFrame([(url, html)], "url string, html string")


def test_jsonld_blocks_extraction_and_binary(spark):
    df = _page(spark)
    got = jsonld_blocks(df).select("block_idx", "json").collect()
    assert [r.block_idx for r in got] == [0, 1, 2, 3]
    assert got[0].json.startswith('{"@type":"Product"')
    assert got[2].json == "{this is not json"
    # binary html decodes JVM-side identically
    bdf = spark.createDataFrame(
        [("u", _HTML.encode("utf-8"))], "url string, html binary"
    )
    assert jsonld_blocks(bdf).count() == 4


def test_jsonld_triples_semantics(spark):
    got = {
        (r.subj, r.pred, r.obj, r.obj_is_iri)
        for r in jsonld_triples(jsonld_blocks(_page(spark))).collect()
    }
    minted = "https://h.org/p#jsonld-0"
    assert got == {
        # block 0: minted subject, literal normal forms
        (minted, "rdf:type", "schema:Product", True),
        (minted, "schema:name", "Widget", False),
        (minted, "schema:price", "0.5", False),  # 0.50 re-serialized
        (minted, "schema:big", "1000.0", False),  # 1e3 re-serialized
        (minted, "schema:inStock", "true", False),
        (minted, "schema:sameAs", '["https://a","https://b"]', False),
        (minted, "schema:brand", "https://ex.org/b1", True),
        # note:null dropped; maker (object without @id) dropped
        # block 1: @id subject, absolute-IRI type, escaped string
        ("https://ex.org/p1", "rdf:type", "https://schema.org/Person", True),
        ("https://ex.org/p1", "schema:name", 'Ada "the first"', False),
        # blocks 2/3 (malformed, top-level array) dropped entirely
    }


def test_meta_tags_and_triples(spark):
    tags = meta_tags(_page(spark))
    got = {(r.key, r.value) for r in tags.collect()}
    # charset-only meta (no content=) does not match the subset
    assert got == {("og:title", "Widget Page"), ("description", "A widget.")}
    trip = {
        (r.pred, r.obj, r.obj_is_iri)
        for r in meta_triples(tags).collect()
    }
    assert trip == {
        ("og:title", "Widget Page", False),
        ("meta:description", "A widget.", False),
    }
    only = meta_triples(tags, keys=["og:title"]).collect()
    assert len(only) == 1 and only[0].subj == "https://h.org/p"


def test_microdata_items_and_triples(spark):
    items = microdata_items(_page(spark))
    assert items.count() == 2  # typeless block still an itemscope match
    got = {
        (r.subj, r.pred, r.obj, r.obj_is_iri)
        for r in microdata_triples(_page(spark)).collect()
    }
    s = "https://h.org/p#item-0"
    assert got == {
        (s, "rdf:type", "https://schema.org/Product", True),
        (s, "https://schema.org/sku", "SKU-1", False),
        # name span contains markup → outside the tag-free-span subset
        (s, "https://schema.org/page", "https://ex.org/g", True),
    }


def test_html_tables_grid(spark):
    cells = html_tables(_page(spark))
    got = [
        (r.table_idx, r.row_idx, r.col_idx, r.is_header, r.cell)
        for r in cells.orderBy("table_idx", "row_idx", "col_idx").collect()
    ]
    assert got == [
        (0, 0, 0, True, "Name"),
        (0, 0, 1, True, "Price (USD)"),
        (0, 1, 0, False, "A"),  # inline <b> stripped
        (0, 1, 1, False, "3"),
        (0, 2, 0, False, "B"),
        (0, 2, 1, False, ""),
        (1, 0, 0, False, "no"),
        (1, 0, 1, False, "header"),
    ]


def test_table_triples_header_keyed(spark):
    got = {
        (r.subj, r.pred, r.obj)
        for r in table_triples(html_tables(_page(spark))).collect()
    }
    base = "https://h.org/p#table-0"
    assert got == {
        (f"{base}-row-1", "col:name", "A"),
        (f"{base}-row-1", "col:price_usd", "3"),  # slug trims edges
        (f"{base}-row-2", "col:name", "B"),
        # empty cell dropped; headerless table 1 contributes nothing
    }


def test_hearst_patterns(spark):
    text = (
        "Databases such as Postgres, MySQL and SQLite are common. "
        "Tools, including Spark, Flink or Beam, run daily. "
        "Ada is a pioneer. Grace is an admiral. lowercase is a word."
    )
    df = spark.createDataFrame([("u", text)], "url string, text string")
    got = {
        (r.hyponym, r.hypernym, r.pattern)
        for r in hearst_isa(df).collect()
    }
    assert got == {
        ("Postgres", "Databases", "such_as"),
        ("MySQL", "Databases", "such_as"),
        ("SQLite", "Databases", "such_as"),
        ("Spark", "Tools", "including"),
        ("Flink", "Tools", "including"),
        ("Beam", "Tools", "including"),
        ("Ada", "pioneer", "is_a"),
        ("Grace", "admiral", "is_a"),
        # "lowercase is a word" rejected: hyponym must be a proper name
    }


def test_annotation_census_counts(spark):
    rows = [
        # two entities of one class on h1, one asserted twice
        ("https://h1.org/a", "s1", "rdf:type", "schema:Product", True),
        ("https://h1.org/b", "s1", "rdf:type", "schema:Product", True),
        ("https://h1.org/c", "s2", "rdf:type", "schema:Product", True),
        ("https://h2.org/d", "s3", "rdf:type", "schema:Person", True),
        ("https://h1.org/a", "s1", "schema:name", "x", False),
    ]
    df = spark.createDataFrame(
        rows, "url string, subj string, pred string, obj string, "
        "obj_is_iri boolean"
    )
    got = {
        (r.host, r.class_iri, r.n_entities, r.n_assertions)
        for r in annotation_census(df).collect()
    }
    assert got == {
        ("h1.org", "schema:Product", 2, 3),
        ("h2.org", "schema:Person", 1, 1),
    }


def test_typed_literals_inference(spark):
    rows = [
        ("s", "p", "42", False),
        ("s", "p", "-7", False),
        ("s", "p", "3.14", False),
        ("s", "p", "true", False),
        ("s", "p", "2024-01-31", False),
        ("s", "p", "2024-01-31T10:00:00Z", False),
        ("s", "p", "hello", False),
        ("s", "p", "https://iri", True),
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_iri boolean"
    )
    got = {(r.obj, r.dtype) for r in typed_literals(df).collect()}
    assert got == {
        ("42", "xsd:integer"),
        ("-7", "xsd:integer"),
        ("3.14", "xsd:decimal"),
        ("true", "xsd:boolean"),
        ("2024-01-31", "xsd:date"),
        ("2024-01-31T10:00:00Z", "xsd:dateTime"),
        ("hello", "xsd:string"),
        ("https://iri", None),
    }


def test_structured_extractors_stay_jvm_side(spark):
    """Scale guard: the whole extraction family is JVM expressions —
    no Python crossing, and the pre-join extractors have no Exchange."""
    df = _page(spark)
    for frame in (
        jsonld_triples(jsonld_blocks(df)),
        meta_triples(meta_tags(df)),
        microdata_triples(df),
        html_tables(df),
        hearst_isa(
            spark.createDataFrame([("u", "t")], "url string, text string")
        ),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan, plan
        assert "Exchange" not in plan, plan


def test_structured_extraction_stream_equals_batch(spark, tmp_path):
    """ST3 parity for the WDC layer: the extractors are stateless
    projections, so they run unchanged on a file-source stream — the
    streamed triple set must equal the batch run."""
    import os

    pages = [
        (
            f"https://h{i % 3}.org/p{i}",
            '<meta property="og:title" content="T%d">'
            '<script type="application/ld+json">'
            '{"@type":"Thing","name":"E%d","rank":%d}</script>'
            "<table><tr><th>K</th></tr><tr><td>v%d</td></tr></table>"
            % (i, i, i % 7, i),
        )
        for i in range(24)
    ]
    src = str(tmp_path / "pages")
    df = spark.createDataFrame(pages, "url string, html string")
    df.repartition(4).write.parquet(src)

    def extract(frame):
        return (
            jsonld_triples(jsonld_blocks(frame))
            .unionByName(meta_triples(meta_tags(frame)))
            .unionByName(table_triples(html_tables(frame)))
        )

    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", 2
    ).parquet(src)
    out = str(tmp_path / "out")
    q = (
        extract(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        tuple(r)
        for r in spark.read.parquet(out)
        .select("subj", "pred", "obj")
        .collect()
    }
    exp = {
        tuple(r)
        for r in extract(spark.read.parquet(src))
        .select("subj", "pred", "obj")
        .collect()
    }
    # 5 triples per page: 3 jsonld (@type/name/rank) + og:title + 1
    # header-keyed table cell
    assert got == exp and len(exp) == 24 * 5


def test_rdfa_triples(spark):
    from case_uco_ontology_map_spark.operators.structured import (
        rdfa_triples,
    )

    html = (
        '<div vocab="https://schema.org/" typeof="Product">'
        '<meta property="sku" content="R-1">'
        '<span property="name">Item A</span>'
        "</div>"
        # no vocab → default; absolute typeof/property pass through
        '<div typeof="https://ex.org/T">'
        '<span property="https://ex.org/p">v</span>'
        '<span property="plain">w</span>'
        "</div>"
        # typeof-less div is not an RDFa item
        '<div class="x"><span property="ignored">z</span></div>'
    )
    df = spark.createDataFrame(
        [("https://h.org/p", html)], "url string, html string"
    )
    got = {
        (r.subj, r.pred, r.obj, r.obj_is_iri)
        for r in rdfa_triples(df).collect()
    }
    s0 = "https://h.org/p#rdfa-0"
    s1 = "https://h.org/p#rdfa-1"
    assert got == {
        (s0, "rdf:type", "https://schema.org/Product", True),
        (s0, "https://schema.org/sku", "R-1", False),
        (s0, "https://schema.org/name", "Item A", False),
        (s1, "rdf:type", "https://ex.org/T", True),
        (s1, "https://ex.org/p", "v", False),
        (s1, "https://schema.org/plain", "w", False),
    }
    plan = rdfa_triples(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan


def test_extraction_to_canonicalize_composition(spark):
    """The full WDC→KG path: extract JSON-LD entities from pages, then
    canonicalize name variants of the same real-world entity across
    pages with the engine's LSH→CC canonicalizer. Four pages annotate
    two entities under near-duplicate names → two components."""
    from case_uco_ontology_map_spark.operators.canonicalize import (
        canonicalize_entities,
    )

    names = [
        "Acme Corporation",
        "Acme Corporation Inc",
        "Globex Widgets Limited",
        "Globex Widgets Ltd",
    ]
    pages = spark.createDataFrame(
        [
            (
                i,
                f"https://h{i}.org/p",
                '<script type="application/ld+json">'
                '{"@type":"Organization","name":"%s"}</script>' % n,
            )
            for i, n in enumerate(names)
        ],
        "page_id long, url string, html string",
    )
    trip = jsonld_triples(jsonld_blocks(pages))
    ents = (
        trip.where(F.col("pred") == "schema:name")
        .join(pages.select("page_id", "url"), "url")
        .select(
            F.col("page_id").alias("entity_id"),
            F.col("obj").alias("entity_key"),
        )
    )
    out = canonicalize_entities(ents, jaccard_threshold=0.5)
    comp = {r.entity_id: r.canonical_id for r in out.collect()}
    assert comp[0] == comp[1] and comp[2] == comp[3]
    assert comp[0] != comp[2]


def test_table_triples_symbol_only_headers_drop(spark):
    """'#' and '%' headers slug to nothing — their columns must drop
    rather than merge into one shared 'col:' predicate."""
    html = (
        "<table><tr><th>#</th><th>Name</th></tr>"
        "<tr><td>1</td><td>A</td></tr></table>"
    )
    df = spark.createDataFrame(
        [("https://h.org/p", html)], "url string, html string"
    )
    got = {
        (r.pred, r.obj)
        for r in table_triples(html_tables(df)).collect()
    }
    assert got == {("col:name", "A")}
