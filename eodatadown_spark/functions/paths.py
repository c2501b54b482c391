"""Path/string scalar functions (C7/C8/C10, C18 gate)."""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def _regex_literal(s: str) -> str:
    """Escape a literal for use inside a Java regex pattern."""
    return re.escape(s)


def _replacement_literal(s: str) -> str:
    r"""Escape `\` and `$` so a replacement string is taken literally."""
    return s.replace("\\", "\\\\").replace("$", "\\$")


def path_basename(col: Column | str) -> Column:
    """C8: basename (ref eodatadownutils.py:449-481)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.element_at(F.split(c, "/"), -1)


def path_splitext(col: Column | str) -> Column:
    """C8: struct(stem, ext) of the basename; ext includes the dot, empty
    when no extension (os.path.splitext semantics)."""
    base = path_basename(col)
    ext = F.regexp_extract(base, r"(\.[^./]+)$", 1)
    stem = F.when(ext == "", base).otherwise(
        base.substr(F.lit(1), F.length(base) - F.length(ext))
    )
    return F.struct(stem.alias("stem"), ext.alias("ext"))


def rewrite_path_prefixes(col: Column | str, replace: dict[str, str]) -> Column:
    """C8: path-prefix rewrite from a dict (ref eodatadownutils.py:429-447)."""
    c = F.col(col) if isinstance(col, str) else col
    out = c
    for old, new in replace.items():
        out = F.regexp_replace(out, "^" + _regex_literal(old), _replacement_literal(new))
    return out


def remove_punctuation(col: Column | str) -> Column:
    """C10 (ref eodatadownutils.py:483-497)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[!\"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]", "")


def reproject_bbox(west, south, east, north, src_epsg: int, dst_epsg: int):
    """C18: bbox reprojection (ref eodatadownlandsatgoogsensor.py:723-725).

    pyproj isn't in this image; identity transform for matching EPSG, else
    NotImplementedError at call time — the ROI path that needs it is
    driver-side and small, so a real deployment plugs pyproj in here.
    """
    if src_epsg == dst_epsg:
        return west, south, east, north
    try:
        from pyproj import Transformer
    except ImportError as exc:  # pragma: no cover - env without pyproj
        raise NotImplementedError(
            f"bbox reprojection {src_epsg}->{dst_epsg} requires pyproj"
        ) from exc
    t = Transformer.from_crs(src_epsg, dst_epsg, always_xy=True)
    x1, y1 = t.transform(west, south)
    x2, y2 = t.transform(east, north)
    return min(x1, x2), min(y1, y2), max(x1, x2), max(y1, y2)
