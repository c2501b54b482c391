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


def test_reproject_identity_and_gate():
    assert reproject_bbox(0, 50, 2, 52, 4326, 4326) == (0, 50, 2, 52)
    try:
        import pyproj  # noqa: F401
        has_pyproj = True
    except ImportError:
        has_pyproj = False
    if not has_pyproj:
        with pytest.raises(NotImplementedError, match="pyproj"):
            reproject_bbox(0, 50, 2, 52, 4326, 32630)
