"""Spatial LUT lookup (S8), codecs (C11/C13, S9), quicklook/tilecache
stages (K6), HTML report (K4)."""

from __future__ import annotations

import json
import uuid

from pyspark.sql import functions as F


def test_find_sensor_tiles(spark, roi_df):
    from eodatadown_spark.spatial import find_sensor_tiles

    lut = spark.createDataFrame(
        [
            (201, 24, -6.0, -3.5, 44.0, 46.0),   # overlaps ROI (-5..0.5, 45..50.5)
            (202, 24, -1.0, 1.5, 48.0, 50.0),    # overlaps
            (203, 24, 10.0, 12.0, 48.0, 50.0),   # outside
        ],
        "wrs_path int, wrs_row int, west_lon double, east_lon double,"
        "south_lat double, north_lat double",
    )
    out = find_sensor_tiles(lut, roi_df, ["wrs_path", "wrs_row"])
    assert sorted(r["wrs_path"] for r in out.collect()) == [201, 202]


def test_uuid5_exact(spark):
    from eodatadown_spark.functions.codecs import path_uuid5

    paths = ["/data/ard/scene1", "gs://bucket/x/y.tif", ""]
    df = spark.createDataFrame([(p,) for p in paths], "p string")
    got = [r["u"] for r in df.select(path_uuid5("p").alias("u")).collect()]
    expect = [str(uuid.uuid5(uuid.NAMESPACE_URL, p)) for p in paths]
    assert got == expect


def test_base64_roundtrip(spark):
    from eodatadown_spark.functions.codecs import b64_decode, b64_encode

    df = spark.createDataFrame([("s3cret-pw",)], "p string")
    out = df.select(b64_decode(b64_encode("p")).alias("round")).first()
    assert out["round"] == "s3cret-pw"


def test_md5_file(tmp_path):
    import hashlib

    from eodatadown_spark.functions.codecs import md5_file

    f = tmp_path / "blob.bin"
    f.write_bytes(b"x" * 10000)
    assert md5_file(str(f)) == hashlib.md5(b"x" * 10000).hexdigest()


def test_gzip_json_io(spark, tmp_path):
    import gzip

    from eodatadown_spark.functions.codecs import read_gzip_json, write_gzip_json

    meta = {"a": 1, "b": "two"}
    p = str(tmp_path / "meta.json.gz")
    write_gzip_json(meta, p)
    with gzip.open(p, "rt") as fh:
        assert json.load(fh) == meta

    rows_path = str(tmp_path / "rows.json.gz")
    with gzip.open(rows_path, "wt") as fh:
        fh.write('{"k": 1}\n{"k": 2}\n')
    df = read_gzip_json(spark, rows_path, "k long")
    assert sorted(r["k"] for r in df.collect()) == [1, 2]


def test_quicklook_tilecache_stages(landsat_scenes):
    from eodatadown_spark import pipeline
    from eodatadown_spark.datereports import quicklook_stage, tilecache_stage
    from eodatadown_spark.queries import get_scnlist_quicklook, get_scnlist_tilecache

    patches = quicklook_stage(landsat_scenes)
    assert sorted(r["pid"] for r in patches.collect()) == [1]
    merged = pipeline.merge_extended_info(landsat_scenes, patches)
    assert get_scnlist_quicklook(merged).count() == 0
    # pid 6 keeps its existing quicklook key after the merge machinery
    info6 = json.loads(merged.where(F.col("pid") == 6).first()["extended_info"])
    assert "quicklook" in info6

    patches_tc = tilecache_stage(merged)
    merged = pipeline.merge_extended_info(merged, patches_tc)
    assert get_scnlist_tilecache(merged).count() == 0


def test_render_report_and_pdf_gate(spark):
    from eodatadown_spark.datereports import html_to_pdf, render_date_report_html

    df = spark.createDataFrame(
        [("LandsatGOOG", "LANDSAT_8", "2019-01-05", None)],
        "sensor_id string, platform_id string, obs_date string, overviews string",
    )
    html = render_date_report_html(df, "Report", "LandsatGOOG")
    assert "<h1>Report</h1>" in html and "2019-01-05" in html
    assert html_to_pdf(html, "/tmp/never.pdf") is False  # weasyprint absent → graceful


def test_report_template_matches_reference_sections(spark):
    """Snapshot of the reference's report_scn_date template structure
    (templates/report_scn_date_html.jinja2 + _css.jinja2): page/second
    titles, div#gridimg of <figure> with quicklook img + figcaption
    (date / mapped sensor name / platform), and the A4 @page CSS chrome
    with header/footer content fields."""
    import json as _json

    from eodatadown_spark.datereports import (
        render_date_report_html,
        render_report_css,
    )

    df = spark.createDataFrame(
        [("LandsatGOOG", "LANDSAT_8", "2019-01-05",
          _json.dumps({"250": "/img/ql_250.png", "100": "/img/ql_100.png"}))],
        "sensor_id string, platform_id string, obs_date string, overviews string",
    )
    html = render_date_report_html(df, "Landsat", "LandsatGOOG")
    for section in (
        "<h1>Landsat</h1>",
        "<h2>A report from EODataDown",
        '<div id="gridimg">',
        "<figure>",
        '<img src="/img/ql_250.png" alt="Image for 2019-01-05" />',  # largest overview wins
        "<figcaption>",
        "<p>2019-01-05</p>",
        "<p>Landsat</p>",          # SensorID -> display-name mapping
        "<p>LANDSAT_8</p>",
    ):
        assert section in html, section
    css = render_report_css("EODataDown Report: Landsat",
                            copyright_footer="Copyright 2026")
    for rule in ("@page", "size: A4",
                 'content: "EODataDown Report: Landsat"',
                 'content: "Copyright 2026"',
                 "display: inline-block"):
        assert rule in css, rule


def test_render_report_pdf_builtin(spark, tmp_path):
    """K4 without weasyprint: the built-in writer must emit a structurally
    valid PDF carrying the report content."""
    from eodatadown_spark.datereports import render_date_report_pdf

    df = spark.createDataFrame(
        [("LandsatGOOG", "LANDSAT_8", f"2019-01-{d:02d}", None) for d in range(1, 26)],
        "sensor_id string, platform_id string, obs_date string, overviews string",
    )
    out = str(tmp_path / "report.pdf")
    data = render_date_report_pdf(df, "Obs (Dates) Report", "LandsatGOOG", out)
    assert data.startswith(b"%PDF-1.4")
    assert data.rstrip().endswith(b"%%EOF")
    # startxref points at the xref table
    tail = data.rstrip().rsplit(b"startxref", 1)[1]
    xref_at = int(tail.split(b"%%EOF")[0].strip())
    assert data[xref_at : xref_at + 4] == b"xref"
    # every xref offset lands on its object header
    import re

    entries = re.findall(rb"(\d{10}) 00000 n", data)
    for i, off in enumerate(entries, start=1):
        assert data[int(off) : int(off) + len(f"{i} 0 obj")] == f"{i} 0 obj".encode()
    # content is present (streams are uncompressed) with parens escaped
    assert b"(Obs \\(Dates\\) Report) Tj" in data
    assert b"2019-01-25" in data and b"LANDSAT_8" in data
    with open(out, "rb") as fh:
        assert fh.read() == data


def test_minipdf_multipage_and_escaping(tmp_path):
    from eodatadown_spark.functions.minipdf import write_pdf

    data = write_pdf(
        [f"line {i} (with) \\ parens" for i in range(100)],
        str(tmp_path / "m.pdf"),
        title="T",
    )
    assert data.count(b"/Type /Page ") == 3  # 100 lines @ ~44/page
    assert b"/Count 3" in data
    assert rb"(line 7 \(with\) \\ parens) Tj" in data


def test_json_field_variant_and_classic(spark):
    """Typed JSON getter: variant and classic paths agree on hits, missing
    paths, type mismatches, and malformed JSON (NULL, never an error)."""
    from eodatadown_spark.functions.codecs import json_field

    df = spark.createDataFrame(
        [(1, '{"k": 87, "s": "x"}'), (2, '{"other": 1}'),
         (3, 'not json'), (4, None), (5, '{"k": "notnum"}')],
        "i long, props string",
    )
    for use_variant in (True, False):
        got = {r["i"]: (r["k"], r["s"]) for r in df.select(
            "i",
            json_field("props", "$.k", "long", use_variant).alias("k"),
            json_field("props", "$.s", "string", use_variant).alias("s"),
        ).collect()}
        assert got[1] == (87, "x")
        assert got[2] == (None, None)
        assert got[3] == (None, None)
        assert got[4] == (None, None)
        assert got[5][0] is None   # type mismatch -> NULL
