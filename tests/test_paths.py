"""Path/string scalar functions (C8/C10/C18)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eodatadown_spark.functions.paths import (
    path_basename,
    path_splitext,
    remove_punctuation,
    reproject_bbox,
    rewrite_path_prefixes,
)


def test_basename_splitext(spark):
    df = spark.createDataFrame(
        [("/data/ard/scene.kea",), ("gs://b/x/archive.tar.gz",), ("noext",), ("/dir/",)],
        "p string",
    ).select(
        path_basename("p").alias("b"), path_splitext("p").alias("se")
    )
    rows = df.collect()
    assert [r["b"] for r in rows] == ["scene.kea", "archive.tar.gz", "noext", ""]
    assert rows[0]["se"]["stem"] == "scene" and rows[0]["se"]["ext"] == ".kea"
    assert rows[1]["se"]["stem"] == "archive.tar" and rows[1]["se"]["ext"] == ".gz"
    assert rows[2]["se"]["ext"] == ""


def test_rewrite_prefixes(spark):
    df = spark.createDataFrame([("/old/a/f.tif",), ("/other/f.tif",)], "p string")
    out = [r["q"] for r in df.select(
        rewrite_path_prefixes("p", {"/old": "/new", "/other": "/moved"}).alias("q")
    ).collect()]
    assert out == ["/new/a/f.tif", "/moved/f.tif"]


def test_remove_punctuation(spark):
    df = spark.createDataFrame([("a,b.c!d?e(f)g-h",)], "s string")
    assert df.select(remove_punctuation("s").alias("o")).first()["o"] == "abcdefgh"


def test_reproject_identity():
    assert reproject_bbox(0, 50, 2, 52, 4326, 4326) == (0, 50, 2, 52)


def test_utm_forward_published_vector():
    """CN Tower (43.642566N, 79.387139W) is the widely published UTM example
    630084 E / 4833438 N in zone 17N — sub-meter agreement required."""
    from eodatadown_spark.functions.tmerc import utm_forward

    e, n = utm_forward(43.642566, -79.387139, 17, True)
    assert abs(float(e) - 630084.0) < 1.0
    assert abs(float(n) - 4833438.0) < 1.0


def test_utm_invariants_and_roundtrip():
    import numpy as np

    from eodatadown_spark.functions.tmerc import utm_forward, utm_inverse

    # central meridian → E exactly 500000; equator (north) → N exactly 0
    e, n = utm_forward(0.0, -81.0, 17, True)
    assert float(e) == 500000.0 and abs(float(n)) < 1e-6
    # southern false northing
    _, n_s = utm_forward(0.0, -81.0, 17, False)
    assert abs(float(n_s) - 10000000.0) < 1e-6
    # forward∘inverse identity across the zone and both hemispheres:
    # the inverse uses independent series (β, δ) against the forward's
    # EXACT conformal mapping, so machine-precision agreement here
    # validates both expansions
    lat = np.linspace(-79, 79, 40)
    lon = -81.0 + np.linspace(-2.9, 2.9, 40)
    la, lo = np.meshgrid(lat, lon)
    for northern in (True, False):
        e, n = utm_forward(la.ravel(), lo.ravel(), 17, northern)
        la2, lo2 = utm_inverse(e, n, 17, northern)
        assert np.abs(la2 - la.ravel()).max() < 1e-9
        assert np.abs(lo2 - lo.ravel()).max() < 1e-9


def test_reproject_bbox_both_directions():
    # 4326 → UTM 30N over the reference's Iberia-ish ROI, then back
    w, s, e, n = reproject_bbox(-5.0, 40.0, -1.0, 43.0, 4326, 32630)
    assert 150000 < w < 500000 and 500000 < e < 850000
    assert 4400000 < s < 4800000 and s < n
    w2, s2, e2, n2 = reproject_bbox(w, s, e, n, 32630, 4326)
    # densified reprojection can only GROW the bbox; it must cover the
    # original ROI and stay within a sane margin
    assert w2 <= -5.0 + 1e-6 and e2 >= -1.0 - 1e-6
    assert s2 <= 40.0 + 1e-6 and n2 >= 43.0 - 1e-6
    assert w2 > -6.0 and e2 < 0.0 and s2 > 39.0 and n2 < 44.0


def test_reproject_unsupported_crs_raises():
    with pytest.raises(ValueError, match="EPSG"):
        reproject_bbox(0, 50, 2, 52, 4326, 3857)


def test_reproject_matches_pyproj_when_available():
    pyproj = pytest.importorskip("pyproj")
    import numpy as np

    from eodatadown_spark.functions.tmerc import utm_forward

    t = pyproj.Transformer.from_crs(4326, 32617, always_xy=True)
    lons = np.linspace(-83.9, -78.1, 20)
    lats = np.linspace(-75.0, 80.0, 20)
    e_ref, n_ref = t.transform(lons, lats)
    e_got, n_got = utm_forward(lats, lons, 17, True)
    assert np.abs(np.asarray(e_ref) - e_got).max() < 1e-3
    assert np.abs(np.asarray(n_ref) - n_got).max() < 1e-3


def test_reproject_points_udf(spark):
    from eodatadown_spark.functions.tmerc import reproject_points_udf, utm_forward

    df = spark.createDataFrame(
        [(-79.387139, 43.642566), (-81.0, 0.0)], "lon double, lat double"
    )
    out = df.select(
        reproject_points_udf(4326, 32617)(F.col("lon"), F.col("lat")).alias("p")
    ).collect()
    e, n = utm_forward(43.642566, -79.387139, 17, True)
    assert abs(out[0]["p"]["x"] - float(e)) < 1e-6
    assert abs(out[0]["p"]["y"] - float(n)) < 1e-6
    assert abs(out[1]["p"]["x"] - 500000.0) < 1e-6
