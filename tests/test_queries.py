"""Query-surface semantics: inclusive date bounds, strict bbox, F9 JSON
filters, J2 anti-join scheduling — reference parity per SURVEY.md §2.2."""

from __future__ import annotations

from eodatadown_spark import queries as Q


def pids(df):
    return sorted(r["pid"] for r in df.select("pid").collect())


def test_date_range_inclusive(landsat_scenes):
    # start = most recent bound; inclusive both ends (F1)
    out = Q.query_scn_records_date(
        landsat_scenes, start_date="2019-03-15", end_date="2019-02-10", valid=False
    )
    assert pids(out) == [1, 2]


def test_valid_and_cloud_filters(landsat_scenes):
    out = Q.query_scn_records_date(
        landsat_scenes, "2019-12-31", "2019-01-01", valid=True, cloud_thres=30.0
    )
    # S5 (pid 4) invalid; cloud<=30 drops pid 1 (80) and pid 3 (50)
    assert pids(out) == [0, 2, 5, 6]


def test_pagination_slice(landsat_scenes):
    page = Q.query_scn_records_date(
        landsat_scenes, "2019-12-31", "2019-01-01", valid=False,
        start_rec=1, n_recs=2,
    )
    # order: date_acquired DESC, pid ASC → [6,4,3,2,1,0,5]; slice [1:3] = [4,3]
    assert pids(page) == [3, 4]


def test_keyset_pagination_walk_matches_offset(landsat_scenes):
    """Walking pages by cursor reproduces the OFFSET slices exactly, asc
    and desc, for tuple cursors and derived one-row DataFrame cursors."""
    from pyspark.sql import functions as F

    base = Q.query_scn_records_date(
        landsat_scenes, "2019-12-31", "2019-01-01", valid=False
    )
    ordered = [
        (r["date_acquired"], r["pid"])
        for r in base.select("date_acquired", "pid")
        .orderBy("date_acquired", "pid")
        .collect()
    ]
    # asc walk with tuple cursors: page size 3 → [0:3], [3:6], [6:]
    cursor = None
    seen = []
    while True:
        page = Q.paginate_keyset(
            base, ["date_acquired", "pid"], after=cursor, n_recs=3
        ).collect()
        if not page:
            break
        seen += [(r["date_acquired"], r["pid"]) for r in page]
        cursor = (page[-1]["date_acquired"], page[-1]["pid"])
    assert seen == ordered

    # desc page 2 via a DERIVED DataFrame cursor == OFFSET page 2
    keys = ["date_acquired", "pid"]
    p1 = Q.paginate_keyset(base, keys, n_recs=3, descending=True)
    cur = p1.agg(F.min(F.struct(*[F.col(k) for k in keys])).alias("c")).select(
        "c.date_acquired", "c.pid"
    )
    p2 = Q.paginate_keyset(base, keys, after=cur, n_recs=3, descending=True)
    got = [(r["date_acquired"], r["pid"]) for r in p2.collect()]
    assert got == list(reversed(ordered))[3:6]

    # facade binding filters like the OFFSET twin
    out = Q.query_scn_records_date_keyset(
        landsat_scenes, "2019-12-31", "2019-01-01", valid=True, n_recs=100
    )
    assert pids(out) == [0, 1, 2, 3, 5, 6]


def test_bbox_strict_inequality(landsat_scenes):
    # bbox (w,e,s,n) touching pid0's east edge exactly → strict '>' excludes
    out = Q.query_scn_records_date_bbox(
        landsat_scenes, "2019-12-31", "2019-01-01", bbox=(2.0, 4.0, 50.0, 52.0),
        valid=False,
    )
    assert 0 not in pids(out)  # east_lon == 2.0 == bbox west → not >
    assert 6 in pids(out)


def test_bbox_count(landsat_scenes):
    n = Q.query_scn_records_date_count(
        landsat_scenes, "2019-12-31", "2019-01-01", valid=True
    ).first()["n_scenes"]
    assert n == 6  # all but invalid pid 4


def test_unique_platforms_and_dates(landsat_scenes):
    plats = [r["spacecraft_id"] for r in Q.find_unique_platforms(landsat_scenes).collect()]
    assert plats == ["LANDSAT_8"]
    dates = [str(r["obs_date"]) for r in Q.find_unique_scn_dates(landsat_scenes).collect()]
    assert dates[0] == "2019-06-30"  # desc default
    assert "2019-05-25" not in dates  # invalid-only date excluded


def test_scns_for_date(landsat_scenes):
    out = Q.get_scns_for_date(landsat_scenes, "2019-01-05")
    assert pids(out) == [0, 5]


def test_scns_for_date_full_filter_set(landsat_scenes):
    """Reference parity for the valid/ard_prod/platform parameters
    (eodatadownlandsatgoogsensor.py:2300-2348's 8-way filter matrix)."""
    # ard_prod drops pid 5 (ardproduct=False)
    assert pids(Q.get_scns_for_date(landsat_scenes, "2019-01-05", ard_prod=True)) == [0]
    # valid gate: 2019-05-25 only has the invalid pid 4
    assert pids(Q.get_scns_for_date(landsat_scenes, "2019-05-25")) == []
    assert pids(Q.get_scns_for_date(landsat_scenes, "2019-05-25", valid=False)) == [4]
    # platform filter
    assert pids(Q.get_scns_for_date(
        landsat_scenes, "2019-01-05", platform="LANDSAT_8")) == [0, 5]
    assert pids(Q.get_scns_for_date(
        landsat_scenes, "2019-01-05", platform="LANDSAT_7")) == []


def test_scn_pids_for_date(landsat_scenes):
    """PID projection (abstract surface eodatadownsensor.py:399)."""
    out = Q.get_scn_pids_for_date(landsat_scenes, "2019-01-05", ard_prod=True)
    assert out.columns == ["pid"]
    assert [r["pid"] for r in out.collect()] == [0]


def test_scnlist_stage_filters(landsat_scenes):
    assert pids(Q.get_scnlist_download(landsat_scenes)) == [3, 5]
    assert pids(Q.get_scnlist_con2ard(landsat_scenes)) == [2]
    assert pids(Q.get_scnlist_datacube(landsat_scenes)) == [1, 6]
    # quicklook missing where extended_info null or key absent (F9)
    assert pids(Q.get_scnlist_quicklook(landsat_scenes)) == [1]
    assert pids(Q.get_scnlist_tilecache(landsat_scenes)) == [1, 6]


def test_usr_analysis_anti_join(landsat_scenes, plugin_results_df):
    out = Q.get_scnlist_usr_analysis(
        landsat_scenes, plugin_results_df, ["PlgA", "PlgB"]
    )
    # ard scenes: 0,1,6. pid0 completed PlgA but not PlgB → included;
    # pid1 PlgA incomplete → included; pid6 nothing → included
    assert pids(out) == [0, 1, 6]
