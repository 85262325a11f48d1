"""S7 HTML DOM-extraction source tests (stdlib parser, mapInPandas)."""

from __future__ import annotations

from utils_infra_spark.sources.html import extract_by_class

PAGE = """
<html><body>
  <div class="header">Power Outages</div>
  <div class="outage-row"><span>Queenstown</span> <b>120</b> customers</div>
  <div class="outage-row nested"><p>Cromwell <i>45</i> customers</p></div>
  <div class="other">ignore me</div>
  <div class="outage-row"></div>
</body></html>
"""
BROKEN = "<div class='outage-row'>unclosed <b>bold"


def test_extract_by_class(spark):
    pages = spark.createDataFrame([(1, PAGE), (2, "<html></html>")], "page_id long, html string")
    rows = extract_by_class(pages, "outage-row").collect()
    by_page = {}
    for r in rows:
        by_page.setdefault(r.page_id, []).append((r.element_index, r.text))
    assert sorted(by_page[1]) == [
        (0, "Queenstown 120 customers"),
        (1, "Cromwell 45 customers"),
        (2, ""),
    ]
    assert 2 not in by_page  # page without matches emits nothing


def test_extract_survives_broken_html(spark):
    pages = spark.createDataFrame([(1, BROKEN), (2, None)], "page_id long, html string")
    rows = extract_by_class(pages, "outage-row").collect()
    # stdlib parser is lenient; broken page yields its text, null page yields nothing
    assert {r.page_id for r in rows} <= {1}


def test_template_compiler(spark):
    from pyspark.sql import functions as F

    from utils_infra_spark.plans.templates import compile_template

    df = spark.createDataFrame(
        [("alpha", 12.345, None), ("bravo", None, "x")], "name string, speed double, note string"
    )
    tpl = compile_template("{{name|upper}}: {{speed|fixed:1}}kn {{note}}")
    out = [r.s for r in df.select(tpl.alias("s")).collect()]
    assert out == ["ALPHA: 12.3kn ", "BRAVO: kn x"]  # nulls render as ''


def test_template_ago_modifier(spark):
    from pyspark.sql import functions as F

    from utils_infra_spark.plans.templates import compile_template

    df = spark.createDataFrame([("2026-02-20 11:30:00",)], "ts string").selectExpr("cast(ts as timestamp) ts")
    now = F.lit("2026-02-20 12:00:00").cast("timestamp")
    out = df.select(compile_template("seen {{ts|ago}}", now=now).alias("s")).first().s
    assert out == "seen 30m ago"


def test_extract_survives_void_elements(spark):
    """<br>/<img> never close; counting them toward depth loses every
    match from the first void tag onward."""
    from utils_infra_spark.sources.html import extract_by_class

    pages = spark.createDataFrame(
        [(1, '<div class="row">Queenstown<br>120 customers</div><div class="row">Cromwell<img src="x.png"></div>')],
        "page_id long, html string",
    )
    got = [r.text for r in extract_by_class(pages, "row").orderBy("element_index").collect()]
    assert got == ["Queenstown 120 customers", "Cromwell"]
