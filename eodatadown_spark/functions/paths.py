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


def update_overview_file_paths(
    overviews: list[str] | None, replace: dict[str, str] | None
) -> list[str] | None:
    """Driver-side overview-path rewrite (ref eodatadownsensor.py:838-851
    — a concrete base-class helper over small per-obs-date lists, so it
    stays a plain Python function; the COLUMNAR bulk rewrite is
    :func:`rewrite_path_prefixes` / pipeline M5).  ``replace=None``
    returns the list unchanged, mirroring the reference."""
    if replace is None or overviews is None:
        return overviews
    out = []
    for p in overviews:
        for old, new in replace.items():
            if p.startswith(old):
                p = new + p[len(old):]
                break
        out.append(p)
    return out


def remove_punctuation(col: Column | str) -> Column:
    """C10 (ref eodatadownutils.py:483-497)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[!\"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]", "")


def reproject_bbox(
    west, south, east, north, src_epsg: int, dst_epsg: int, densify: int = 21
):
    """C18: bbox reprojection (ref eodatadownlandsatgoogsensor.py:723-725).

    Self-contained: uses the built-in Karney-series transverse-Mercator
    kernel (functions/tmerc.py) — no pyproj required.  Supported CRS are
    EPSG:4326 and the UTM zones (326xx/327xx), which covers the reference's
    Landsat/Sentinel ROI paths; tests cross-check against pyproj when it
    happens to be installed.

    The four edges are densified (``densify`` points per edge) before taking
    the min/max: projected edges of a geographic rectangle are curves, so
    corner-only transforms (what the reference does) under-cover the true
    extent — up to hundreds of meters across a UTM zone.

    CRS pairs outside 4326/UTM (e.g. 3857 web-mercator, national grids)
    fall back to pyproj when installed — the pre-tmerc capability is kept,
    not narrowed; without pyproj such pairs raise with both reasons.
    """
    import numpy as np

    from eodatadown_spark.functions.tmerc import transform_points

    if src_epsg == dst_epsg:
        return west, south, east, north
    xs = np.linspace(west, east, densify)
    ys = np.linspace(south, north, densify)
    edge_x = np.concatenate([xs, xs, np.full(densify, west), np.full(densify, east)])
    edge_y = np.concatenate([np.full(densify, south), np.full(densify, north), ys, ys])
    try:
        ox, oy = transform_points(edge_x, edge_y, src_epsg, dst_epsg)
    except ValueError as exc:
        try:
            from pyproj import Transformer
        except ImportError:
            raise ValueError(
                f"{exc}; pyproj (which would handle arbitrary CRS) is not installed"
            ) from exc
        t = Transformer.from_crs(src_epsg, dst_epsg, always_xy=True)
        ox, oy = t.transform(edge_x, edge_y)
        ox, oy = np.asarray(ox), np.asarray(oy)
        # pyproj returns inf (errcheck=False default) for points outside the
        # target CRS domain (e.g. lat ±90 → 3857); a non-finite bound is
        # garbage downstream, so fail loudly instead
        if not (np.isfinite(ox).all() and np.isfinite(oy).all()):
            raise ValueError(
                f"bbox reprojection {src_epsg}->{dst_epsg} produced non-finite "
                "coordinates — input extends outside the target CRS domain"
            )
    return float(ox.min()), float(oy.min()), float(ox.max()), float(oy.max())
