"""Hand-computed golden cases for the pure-Python oracle (FIXTURES §3
cases A–G in miniature).  The oracle must be right BEFORE it is used to
judge the engine."""

from osm_conflate_spark.config import ConflateConfig
from osm_conflate_spark import reference_model as rm
from osm_conflate_spark.gen import offset_meters

CFG = ConflateConfig()


def sp(i, lat, lon, tags=None, **kw):
    return rm.SourcePoint(i, lat, lon, tags or {}, **kw)


def op(i, lat, lon, tags=None, typ="node", ver=1):
    return rm.OSMPoint(typ, i, ver, lat, lon, tags or {})


def off(lat, lon, m, bearing=0.0):
    la, lo = offset_meters(
        __import__("numpy").array([lat]), __import__("numpy").array([lon]),
        m, bearing,
    )
    return float(la[0]), float(lo[0])


def test_case_a_simple_matching():
    ds, osm = [], []
    for i, m in enumerate([10, 30, 50, 70, 90]):
        lat, lon = 52.0 + i * 0.01, 13.0
        ds.append(sp(f"d{i}", lat, lon, {"name": f"P{i}"}))
        ola, olo = off(lat, lon, m)
        osm.append(op(i + 1, ola, olo, {"name": "old"}))
    # one pair beyond radius -> create + (no ref => untouched unless vicinity retag)
    ds.append(sp("d9", 53.0, 13.0, {"name": "far"}))
    ola, olo = off(53.0, 13.0, 150.0)
    osm.append(op(99, ola, olo, {"name": "faraway"}))
    res = rm.conflate(ds, osm, CFG)
    matched = {m["dataset_id"]: m["osm_key"] for m in res["matched_pairs"]}
    assert matched == {f"d{i}": f"n{i + 1}" for i in range(5)}
    actions = sorted(c["action"] for c in res["changes"])
    # 5 modify (name is master -> overwritten + moved) + 1 create; far osm has
    # no ref and no amenity -> untouched
    assert actions == ["create"] + ["modify"] * 5
    for c in res["changes"]:
        if c["action"] == "modify":
            assert c["tags"]["name"].startswith("P")
            assert c["tags"]["ref:test"] == c["dataset_id"]
            # moved to dataset coords
            assert any(
                abs(c["lat"] - p.lat) < 1e-12 and abs(c["lon"] - p.lon) < 1e-12
                for p in ds
            )


def test_case_b_greedy_contention():
    # one osm node between two dataset points at 30 m and 40 m
    lat, lon = 48.0, 11.0
    o_lat, o_lon = lat, lon
    d1 = off(lat, lon, 30.0, 1.0)
    d2 = off(lat, lon, 40.0, 4.0)
    ds = [sp("a", *d1), sp("b", *d2)]
    osm = [op(7, o_lat, o_lon, {"x": "1"})]
    res = rm.conflate(ds, osm, CFG)
    m = res["matched_pairs"]
    assert len(m) == 1 and m[0]["dataset_id"] == "a" and m[0]["osm_key"] == "n7"
    assert {c["action"] for c in res["changes"]} == {"modify", "create"}


def test_case_b_tie_break():
    lat, lon = 48.0, 11.0
    d1 = off(lat, lon, 35.0, 0.0)
    d2 = off(lat, lon, 35.0, 3.14159)
    # distances not bit-equal due to bearing, so force exact tie via symmetry:
    # both at same north/south offset
    d2 = (2 * lat - d1[0], lon)
    ds = [sp("b", *d1), sp("a", *d2)]
    osm = [op(7, lat, lon)]
    res = rm.conflate(ds, osm, CFG)
    # equal distance -> dataset_id ascending wins
    assert res["matched_pairs"][0]["dataset_id"] == "a"


def test_case_c_tag_conflation():
    lat, lon = 40.0, -74.0
    ola, olo = off(lat, lon, 5.0)
    ds = [sp("c1", lat, lon, {"name": "New", "amenity": "cafe", "website": "w"})]
    osm = [
        op(3, ola, olo, {"name": "Old", "amenity": "restaurant", "wheelchair": "yes"})
    ]
    res = rm.conflate(ds, osm, CFG)
    c = res["changes"][0]
    assert c["action"] == "modify"
    t = c["tags"]
    assert t["name"] == "New"            # master tag overwritten
    assert t["amenity"] == "restaurant"  # non-master, OSM wins
    assert t["website"] == "w"           # absent on OSM -> filled
    assert t["wheelchair"] == "yes"      # preserved
    assert t["ref:test"] == "c1"
    assert c["match_dist"] > 0


def test_case_c_no_change():
    lat, lon = 40.0, -74.0
    ola, olo = off(lat, lon, 0.05)  # below position_tolerance
    tags = {"name": "Same", "ref:test": "c1"}
    ds = [sp("c1", lat, lon, {"name": "Same"})]
    osm = [op(3, ola, olo, dict(tags))]
    res = rm.conflate(ds, osm, CFG)
    assert res["matched_pairs"]
    assert res["changes"] == []  # no tag change, no move -> no action


def test_case_d_ref_dedup():
    ds = [sp("x", 1, 1), sp("x", 2, 2), sp("y", 3, 3)]
    res = rm.conflate(ds, [], CFG)
    assert res["dropped_dup_ids"] == ["x"]
    assert len(res["changes"]) == 2  # two creates


def test_case_e_spatial_duplicates():
    lat, lon = 55.0, 37.0
    la2, lo2 = off(lat, lon, 0.5)
    ds = [sp("b2", lat, lon), sp("a1", la2, lo2)]
    res = rm.conflate(ds, [], CFG)
    assert res["dropped_spatial_ids"] == ["b2"]  # a1 < b2 kept
    assert [c["dataset_id"] for c in res["changes"]] == ["a1"]


def test_case_f_audit():
    lat, lon = 50.0, 8.0
    ola, olo = off(lat, lon, 10.0)
    ds = [sp("s1", lat, lon, {"name": "n"})]
    osm = [op(5, ola, olo, {"name": "n", "ref:test": "s1"})]
    # skip: pair unmatched -> create + delete
    res = rm.conflate(ds, osm, CFG, audit={"s1": {"skip": True}})
    assert not res["matched_pairs"]
    assert sorted(c["action"] for c in res["changes"]) == ["create", "delete"]
    # skip + keep: the delete is kept back
    res = rm.conflate(ds, osm, CFG, audit={"s1": {"skip": True, "keep": True}})
    assert sorted(c["action"] for c in res["changes"]) == ["create"]
    # move=False: matched, tags merged, coords unchanged
    ds2 = [sp("s1", lat, lon, {"name": "better"})]
    res = rm.conflate(ds2, osm, CFG, audit={"s1": {"move": False}})
    c = res["changes"][0]
    assert c["action"] == "modify" and c["lat"] == ola and c["lon"] == olo


def test_case_g_delete_vicinity_retag():
    cfg = CFG
    ds = [sp("g1", 35.0, 139.0, {"name": "x"})]
    # unmatched osm WITH ref -> delete
    o1 = op(1, 10.0, 10.0, {"amenity": "cafe", "ref:test": "gone1"})
    # unmatched osm w/o ref near dataset (within 100 m) -> retag
    la, lo = off(35.0, 139.0, 95.0, 2.0)
    o2 = op(2, la, lo, {"amenity": "cafe"})
    # far-away osm w/o ref -> untouched
    o3 = op(3, -20.0, 30.0, {"amenity": "cafe"})
    res = rm.conflate(ds, [o1, o2, o3], cfg)
    by_action = {}
    for c in res["changes"]:
        by_action.setdefault(c["action"], []).append(c)
    assert [c["osm_id"] for c in by_action["delete"]] == [1]
    # o2 within 100m of g1 -> it MATCHES g1 instead (nearest). Place it as
    # the only candidate: g1 matches o2, so no retag. Rework: add a closer twin.
    assert "retag" not in by_action or all(
        c["osm_id"] != 3 for c in by_action["retag"]
    )


def test_case_g_retag_exact():
    # dataset point with a CLOSE twin (matches) + second osm in vicinity
    lat, lon = 35.0, 139.0
    t_la, t_lo = off(lat, lon, 5.0)
    v_la, v_lo = off(lat, lon, 80.0, 1.5)
    ds = [rm.SourcePoint("g1", lat, lon, {"name": "x"})]
    osm = [
        rm.OSMPoint("node", 1, 1, t_la, t_lo, {"name": "x"}),
        rm.OSMPoint("node", 2, 1, v_la, v_lo, {"amenity": "cafe"}),
        rm.OSMPoint("node", 3, 1, -20.0, 30.0, {"amenity": "cafe"}),
    ]
    res = rm.conflate(ds, osm, CFG)
    retags = [c for c in res["changes"] if c["action"] == "retag"]
    assert [c["osm_id"] for c in retags] == [2]
    assert retags[0]["tags"] == {"disused:amenity": "cafe"}
