"""Transport seam for the remote-index adapters (S3/S4/S5).

The reference issues live HTTP requests with per-service request cycles:
the NASA CMR ``page_size``/``page_num`` loop
(ref eodatadownICESAT2sensor.py:556-717), the ASF one-request-per-ROI cycle
with in-run ``product_file_id`` dedup (ref eodatadownsentinel1asf.py:392-520)
and the LPDAAC gedifinder per-(product, bbox) requests
(ref eodatadownGEDIsensor.py:357-437).

This module reproduces those request cycles over an injectable ``Transport``
so the full ``check_new_scns`` path — build request from watermark → fetch
(paged) → normalize (sources/index_adapters.py) → watermark-filtered upsert —
runs end-to-end:

- :class:`HttpTransport` — stdlib urllib with retry/backoff (the live path;
  unusable in an air-gapped sandbox, so tests don't touch it);
- :class:`FixtureTransport` — serves canned JSON payloads keyed by the
  canonicalized request, used by tests and offline replays.  ``store()``
  writes fixtures; requests with no fixture raise loudly (a paging loop that
  silently saw "no results" would truncate ingests).

Transport is deliberately DRIVER-side: index payloads are index-sized
(thousands of rows, not scenes' pixel data), and the reference's own cycle
is a serial session loop.  The executor-scale work starts after
normalization, on the DataFrame plans.
"""

from __future__ import annotations

import json
import time
import hashlib
import urllib.parse
import urllib.request
from pathlib import Path
from typing import Iterable, Mapping, Protocol, Sequence


def canonical_request(url: str, params: Mapping[str, object] | None) -> str:
    """Stable string identity of a GET request: url + sorted query params."""
    items = sorted((str(k), str(v)) for k, v in (params or {}).items())
    return url + "?" + urllib.parse.urlencode(items)


class Transport(Protocol):
    def get(self, url: str, params: Mapping[str, object] | None = None): ...


class HttpTransport:
    """Live HTTP GET with bounded retry/backoff (stdlib only).

    ``auth=(user, password)`` adds basic auth (the ASF path); responses must
    be JSON.
    """

    def __init__(
        self,
        auth: tuple[str, str] | None = None,
        user_agent: str = "eodatadown-spark/1.0",
        timeout: float = 60.0,
        retries: int = 3,
        backoff: float = 2.0,
    ):
        self.auth = auth
        self.user_agent = user_agent
        self.timeout = timeout
        self.retries = retries
        self.backoff = backoff

    def get(self, url: str, params: Mapping[str, object] | None = None):
        full = canonical_request(url, params)
        req = urllib.request.Request(full, headers={"User-Agent": self.user_agent})
        if self.auth:
            import base64

            tok = base64.b64encode(f"{self.auth[0]}:{self.auth[1]}".encode()).decode()
            req.add_header("Authorization", f"Basic {tok}")
        last_exc: Exception | None = None
        for attempt in range(self.retries + 1):
            try:
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    return json.loads(resp.read().decode("utf-8"))
            except Exception as exc:  # pragma: no cover - live-network path
                last_exc = exc
                if attempt < self.retries:
                    time.sleep(self.backoff * (2**attempt))
        raise ConnectionError(f"GET {full} failed after {self.retries + 1} attempts") from last_exc


class FixtureTransport:
    """Serves JSON payloads from a fixture directory keyed by request.

    Layout: ``<root>/index.json`` maps the canonical request string to a
    payload file name (human-auditable); payload files hold raw JSON.
    ``store()`` builds fixtures (tests, or recording a live session for
    replay).  Every served request is appended to ``self.log`` so tests can
    assert the paging cycle actually happened.
    """

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self._index_path = self.root / "index.json"
        self._index: dict[str, str] = (
            json.loads(self._index_path.read_text()) if self._index_path.exists() else {}
        )
        self.log: list[str] = []

    def store(self, url: str, params: Mapping[str, object] | None, payload) -> None:
        key = canonical_request(url, params)
        fname = hashlib.md5(key.encode()).hexdigest() + ".json"
        (self.root / fname).write_text(json.dumps(payload))
        self._index[key] = fname
        self._index_path.write_text(json.dumps(self._index, indent=1, sort_keys=True))

    def get(self, url: str, params: Mapping[str, object] | None = None):
        key = canonical_request(url, params)
        self.log.append(key)
        fname = self._index.get(key)
        if fname is None:
            raise LookupError(
                f"no fixture for request {key!r} — a silent empty response "
                "here would truncate the ingest; record the page with store()"
            )
        return json.loads((self.root / fname).read_text())


# ---------------------------------------------------------------------------
# Per-service request cycles (reference parity)
# ---------------------------------------------------------------------------

CMR_GRANULE_URL = "https://cmr.earthdata.nasa.gov/search/granules"
ASF_BASE_URL = "https://api.daac.asf.alaska.edu/services/search/param"
GEDI_FINDER_URL = "https://lpdaacsvc.cr.usgs.gov/services/gedifinder"


def cmr_fetch_granules(
    transport: Transport,
    short_name: str,
    version: str,
    temporal: str,
    bounding_box: str,
    page_size: int = 100,
    base_url: str = CMR_GRANULE_URL,
    max_pages: int = 1000,
) -> list[dict]:
    """The CMR ``page_num`` loop (ref eodatadownICESAT2sensor.py:601-712):
    GET pages of ``feed.entry`` until a page is missing or empty; the params
    dict mutates ``page_num`` in place exactly like the reference."""
    search_params: dict[str, object] = {
        "short_name": short_name,
        "version": version,
        "temporal": temporal,
        "page_size": page_size,
        "page_num": 1,
        "bounding_box": bounding_box,
    }
    entries: list[dict] = []
    for _ in range(max_pages):
        payload = transport.get(base_url, search_params)
        feed = payload.get("feed") if isinstance(payload, dict) else None
        page = feed.get("entry") if isinstance(feed, dict) else None
        if not page:
            return entries
        entries.extend(page)
        search_params["page_num"] = int(search_params["page_num"]) + 1
    raise RuntimeError(
        f"CMR paging did not terminate within {max_pages} pages for "
        f"{short_name} v{version} — raise max_pages or narrow the query"
    )


def asf_fetch_scenes(
    transport: Transport,
    polygons: Sequence[str],
    start: str,
    end: str,
    platform: str = "SA,SB",
    processing_level: str = "GRD_HD",
    base_url: str = ASF_BASE_URL,
) -> list[dict]:
    """The ASF per-ROI cycle (ref eodatadownsentinel1asf.py:433-520): one
    request per ROI polygon, payload is a single-element array wrapping the
    scene list (``response.json()[0]``); scenes already seen in THIS run are
    dropped by ``product_file_id`` (the reference's in-run dedup dict —
    cross-run dedup is the catalog upsert's job)."""
    seen: set[str] = set()
    out: list[dict] = []
    for poly in polygons:
        params = {
            "polygon": poly,
            "platform": platform,
            "processingLevel": processing_level,
            "start": start,
            "end": end,
            "output": "json",
        }
        payload = transport.get(base_url, params)
        scenes = payload[0] if isinstance(payload, list) and payload else []
        for scn in scenes:
            pfid = scn.get("product_file_id")
            if pfid is None or pfid in seen:
                continue
            seen.add(pfid)
            out.append(scn)
    return out


def gedi_fetch_urls(
    transport: Transport,
    products: Sequence[Mapping[str, str]],
    bboxes: Sequence[str],
    base_url: str = GEDI_FINDER_URL,
) -> list[str]:
    """The gedifinder per-(product, bbox) cycle
    (ref eodatadownGEDIsensor.py:386-401): payload ``{"data": [urls...]}``;
    missing ``data`` means zero results for that request."""
    urls: list[str] = []
    for prod in products:
        for bbox in bboxes:
            params = {
                "output": "json",
                "product": prod["product"],
                "version": prod["version"],
                "bbox": bbox,
            }
            payload = transport.get(base_url, params)
            if isinstance(payload, dict) and "data" in payload:
                urls.extend(payload["data"])
    return urls


# ---------------------------------------------------------------------------
# Fetched payload → raw DataFrames (input shape of sources/index_adapters)
# ---------------------------------------------------------------------------

# CMR granule entries as the cmr_granules adapter expects them; extra keys in
# the payload are ignored, absent keys become NULL.
CMR_RAW_SCHEMA = (
    "producer_granule_id string, id string, title string, time_start string, "
    "time_end string, updated string, original_format string, "
    "online_access_flag boolean, granule_size double, "
    "boxes array<string>, polygons array<string>, links array<struct<type: string, href: string>>"
)

ASF_RAW_SCHEMA = (
    "sceneId string, productName string, product_file_id string, "
    "absoluteOrbit string, relativeOrbit string, doppler string, "
    "flightDirection string, granuleName string, granuleType string, "
    "incidenceAngle string, lookDirection string, platform string, "
    "polarization string, processingDate string, processingDescription string, "
    "processingLevel string, processingType string, processingTypeDisplay string, "
    "sceneDate string, sensor string, startTime string, stopTime string, "
    "stringFootprint string, downloadUrl string, fileName string, "
    "md5sum string, sizeMB string"
)


def _rows_df(spark, rows: Iterable[Mapping], schema: str):
    """dict rows → DataFrame with an explicit schema (missing keys → NULL).

    CMR ``polygons`` arrive nested (list of rings per granule,
    ref :628-651 iterates both levels); they flatten to the adapter's
    array<string> by concatenation."""
    from pyspark.sql.types import StructType

    struct: StructType = StructType.fromDDL(schema)
    names = struct.fieldNames()
    prepared = []
    for r in rows:
        d = {}
        for n in names:
            v = r.get(n)
            if n == "polygons" and v:
                v = [s for ring in v for s in (ring if isinstance(ring, list) else [ring])]
            if n == "links" and v:
                v = [{"type": lk.get("type"), "href": lk.get("href")} for lk in v]
            d[n] = v
        prepared.append(d)
    return spark.createDataFrame(prepared, struct)


def cmr_granules_df(spark, transport: Transport, **kw):
    """Fetch (paged) + lift to the raw CMR frame for
    :func:`eodatadown_spark.sources.index_adapters.cmr_granules`."""
    return _rows_df(spark, cmr_fetch_granules(transport, **kw), CMR_RAW_SCHEMA)


def asf_scenes_df(spark, transport: Transport, **kw):
    return _rows_df(spark, asf_fetch_scenes(transport, **kw), ASF_RAW_SCHEMA)


def gedi_urls_df(spark, transport: Transport, **kw):
    urls = gedi_fetch_urls(transport, **kw)
    return _rows_df(spark, [{"url": u} for u in urls], "url string")
