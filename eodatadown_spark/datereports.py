"""Date reports (K4) and quicklook/tilecache stages (K6).

The reference renders jinja2 HTML+CSS then shells out weasyprint for PDF
(eodatadowndatereports.py:134-258).  The engine computes the report data as
a DataFrame (reports.get_obs_scns), renders HTML driver-side with jinja2,
and gates the PDF conversion behind an import-try (weasyprint isn't in this
image).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eodatadown_spark.sinks import bounded_collect

# Section structure mirrors the reference's report_scn_date_html.jinja2
# (templates/report_scn_date_html.jinja2): h1 page_title, h2 second_title,
# a div#gridimg of <figure> per scene (quicklook img + figcaption with
# date / sensor / platform).  The trailing data table is an engine addition
# (the tabular view the CLI and tests consume) — the reference sections
# come first and unchanged.
_TEMPLATE = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8"><title>{{ page_title }}</title>
</head>
<body>
<h1>{{ page_title }}</h1>
<h2>{{ second_title }}</h2>

<div id="gridimg">

    {% for row in rows %}
    <figure>
        <img src="{{ row.qklk_image }}" alt="Image for {{ row.date_str }}" />
        <figcaption>
            <p>{{ row.date_str }}</p>
            <p>{{ row.sensor }}</p>
            <p>{{ row.platform }}</p>
        </figcaption>
    </figure>
    {% endfor %}

</div>

<table border="1">
<tr><th>Date</th><th>Platform</th><th>Overviews</th></tr>
{% for row in rows -%}
<tr><td>{{ row.date_str }}</td><td>{{ row.platform }}</td><td>{{ row.overviews or "" }}</td></tr>
{% endfor -%}
</table>
</body>
</html>
"""

# Mirrors report_scn_date_css.jinja2: A4 @page with header_title top-left,
# info_footer bottom-left, copyright_footer bottom-right, and the
# Arial h1/h2 + inline-block figure grid styling.
_CSS_TEMPLATE = """@page
{
    size: A4;
    margin: 1cm;
    @top-left { content: "{{ header_title }}"; font-size: 0.8em; }
    @bottom-left { content: "{{ info_footer }}"; font-size: 0.8em; }
    @bottom-right { content: "{{ copyright_footer }}"; font-size: 0.8em; }
}

h1 { font-family: Arial, Helvetica, sans-serif; }
h2 { font-family: Arial, Helvetica, sans-serif; }

figure
{
  margin: 5px;
  margin-top: 15px;
  margin-bottom: 15px;
  display: inline-block;
  vertical-align: top;
}
"""

# the reference's SensorID -> display-name mapping
# (eodatadowndatereports.py:195-202); unknown sensors pass through rather
# than raising — the report is a sink, not a validator
_SENSOR_DISPLAY = {
    "LandsatGOOG": "Landsat",
    "Sentinel2GOOG": "Sentinel-2",
    "Sentinel1ASF": "Sentinel-1",
}


def _report_rows(obs_scns: DataFrame) -> list[dict]:
    rows = []
    for r in bounded_collect(obs_scns, "render_date_report"):
        d = r.asDict()
        ov = d.get("overviews")
        qklk = ""
        if ov:
            try:  # overviews is {size_px: img_path}; largest size wins
                parsed = json.loads(ov)
                if parsed:
                    qklk = parsed[max(parsed, key=lambda k: int(k))]
            except (ValueError, TypeError):
                qklk = str(ov)
        rows.append(
            {
                "date_str": str(d.get("obs_date", "")),
                "platform": str(d.get("platform_id", "")),
                "sensor": _SENSOR_DISPLAY.get(
                    d.get("sensor_id"), str(d.get("sensor_id", ""))
                ),
                "qklk_image": qklk,
                "overviews": ov,
            }
        )
    return rows


def render_date_report_html(
    obs_scns: DataFrame,
    title: str,
    sensor: str,
    out_file: str | None = None,
    second_title: str | None = None,
) -> str:
    """K4: render the date report HTML from the (small, already filtered)
    obs-date query result, in the reference's section structure (figure
    grid per scene + the engine's data table).  Returns the HTML; writes it
    if out_file given."""
    import jinja2

    rows = _report_rows(obs_scns)
    html = jinja2.Template(_TEMPLATE).render(
        page_title=title,
        second_title=second_title
        or f"A report from EODataDown for {sensor} ({len(rows)} observation dates).",
        rows=rows,
    )
    if out_file:
        with open(out_file, "w", encoding="utf-8") as fh:
            fh.write(html)
    return html


def render_report_css(
    header_title: str,
    info_footer: str = "See the project site for background.",
    copyright_footer: str = "",
) -> str:
    """K4: the print stylesheet with the reference's @page chrome fields
    (header_title / info_footer / copyright_footer), for the weasyprint
    path of :func:`html_to_pdf`."""
    import jinja2

    return jinja2.Template(_CSS_TEMPLATE).render(
        header_title=header_title,
        info_footer=info_footer,
        copyright_footer=copyright_footer,
    )


def html_to_pdf(html: str, out_pdf: str) -> bool:
    """K4 PDF step — weasyprint if importable, else report unavailable
    (ref shells `weasyprint` as a subprocess).  For guaranteed PDF output
    without weasyprint use :func:`render_date_report_pdf`."""
    try:
        import weasyprint  # noqa: F401
    except ImportError:
        return False
    weasyprint.HTML(string=html).write_pdf(out_pdf)
    return True


def render_date_report_pdf(
    obs_scns: DataFrame, title: str, sensor: str, out_pdf: str
) -> bytes:
    """K4 end-to-end PDF: the same report content as the HTML path, emitted
    as real PDF bytes by the built-in writer (functions/minipdf.py) — no
    external rendering stack.  When weasyprint IS available, prefer
    render_date_report_html + html_to_pdf for full CSS typography."""
    from eodatadown_spark.functions.minipdf import write_pdf

    rows = bounded_collect(obs_scns, "render_date_report_pdf")
    lines = [f"Sensor: {sensor} - {len(rows)} observation dates", ""]
    lines.append(f"{'Date':<14} {'Platform':<16} Overviews")
    lines.append("-" * 60)
    for r in rows:
        d = r.asDict()
        lines.append(
            f"{str(d['obs_date']):<14} {str(d['platform_id']):<16} "
            f"{d.get('overviews') or ''}"
        )
    return write_pdf(lines, out_pdf, title=title)


# ---------------------------------------------------------------------------
# K6: quicklook / tilecache stages as task fan-out + JSON merge
# ---------------------------------------------------------------------------

def quicklook_stage(scenes: DataFrame, image_fn=None) -> DataFrame:
    """K6: run the quicklook step for every scheduled scene and return
    extended_info patches for ONE batched merge_extended_info (M3).

    `image_fn(scene_dict) -> path` is the external visualisation tool
    (rsgislib in the reference, eodatadownlandsatgoogsensor.py:1341-1413);
    defaults to a deterministic fake path so the stage is testable without
    the geospatial stack.
    """
    from eodatadown_spark.pipeline import run_scene_tasks
    from eodatadown_spark.queries import get_scnlist_quicklook

    todo = scenes.join(get_scnlist_quicklook(scenes), "pid", "left_semi").select(
        "pid", "ardproduct_path"
    )
    fn = image_fn or (lambda s: f"{s['ardproduct_path']}/quicklook_{s['pid']}.jpg")

    def task(scene: dict) -> dict:
        path = fn(scene)
        return {
            "pid": scene["pid"],
            "extended_info_patch": json.dumps(
                {"quicklook": {"quicklookpath": path, "quicklookimgs": [path]}}
            ),
        }

    return run_scene_tasks(todo, task, "pid long, extended_info_patch string")


def tilecache_stage(scenes: DataFrame, tile_fn=None) -> DataFrame:
    """K6: tilecache step (ref :1474-1543) — same fan-out + M3 patch shape."""
    from eodatadown_spark.pipeline import run_scene_tasks
    from eodatadown_spark.queries import get_scnlist_tilecache

    todo = scenes.join(get_scnlist_tilecache(scenes), "pid", "left_semi").select(
        "pid", "ardproduct_path"
    )
    fn = tile_fn or (lambda s: f"{s['ardproduct_path']}/tiles_{s['pid']}")

    def task(scene: dict) -> dict:
        path = fn(scene)
        return {
            "pid": scene["pid"],
            "extended_info_patch": json.dumps(
                {"tilecache": {"tilecachepath": path, "visgtiff": path + "/vis.tif"}}
            ),
        }

    return run_scene_tasks(todo, task, "pid long, extended_info_patch string")
