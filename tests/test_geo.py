"""Geo family (r13, r12 verdict stretch #9): haversine / geohash /
bbox column algebra, the geo_distance + geo_bounding_box DSL leaves,
the geohash_grid aggregation, and the named 400s for shape topology.

Reference surface: the reference forwards search bodies verbatim to a
real ES 8.11 (/root/reference/src/search_api.py:38-46) whose geo query
family was the one wholly-absent class here (r12 verdict missing #4).
"""

from __future__ import annotations

import json
import math
import os

import pytest

from pyspark.sql import functions as F


def _geo_table(service, spark, name="data_lake_geo"):
    # city-ish points: id, name, loc_lat/loc_lon pair (the
    # parquet-native geo_point encoding the DSL resolves)
    rows = [
        (1, "berlin", 52.52, 13.405),
        (2, "paris", 48.8566, 2.3522),
        (3, "newyork", 40.7128, -74.006),
        (4, "sydney", -33.8688, 151.2093),
        (5, "fiji", -17.7134, 178.065),
        (6, "samoa", -13.759, -172.1046),
        (7, "nulls", None, None),
    ]
    spark.createDataFrame(
        rows, "id long, city string, loc_lat double, loc_lon double"
    ).write.parquet(os.path.join(service.lake_dir, name))
    return name


def test_geohash_column_matches_reference(spark):
    """The column-algebra geohash equals both the driver-side twin and
    published reference hashes."""
    from sql_database_to_elastic_datalake_spark.functions.geo import (
        geohash,
        geohash_py,
    )

    pts = [(57.64911, 10.40744), (42.605, -5.603), (52.52, 13.405),
           (-33.8688, 151.2093), (0.0, 0.0), (89.99, 179.99),
           (-90.0, -180.0)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    for p in (1, 2, 5, 8):
        got = [r[0] for r in df.select(
            geohash(F.col("lat"), F.col("lon"), p)).collect()]
        want = [geohash_py(lat, lon, p) for lat, lon in pts]
        assert got == want, (p, got, want)
    # published references
    assert geohash_py(57.64911, 10.40744, 5) == "u4pru"
    assert geohash_py(42.605, -5.603, 5) == "ezs42"


def test_haversine_known_distances(spark):
    """Haversine against well-known city distances (±0.5%)."""
    from sql_database_to_elastic_datalake_spark.functions.geo import (
        haversine_km,
    )

    df = spark.createDataFrame(
        [(52.52, 13.405, 48.8566, 2.3522),   # berlin-paris ~878 km
         (40.7128, -74.006, 51.5074, -0.1278)],  # nyc-london ~5570 km
        "a double, b double, c double, d double")
    got = [r[0] for r in df.select(haversine_km(
        F.col("a"), F.col("b"), F.col("c"), F.col("d"))).collect()]
    assert abs(got[0] - 878) / 878 < 0.005
    assert abs(got[1] - 5570) / 5570 < 0.005


def test_geo_distance_and_bbox_dsl(service, spark):
    name = _geo_table(service, spark)
    # 1000 km around paris: paris + berlin (878 km), not nyc
    out = service.advanced_search(name, {"geo_distance": {
        "distance": "1000km",
        "loc": {"lat": 48.8566, "lon": 2.3522}}}, k=10)
    ids = sorted(h["_source"]["id"] for h in out["hits"]["hits"])
    assert ids == [1, 2]
    # metres + array point form
    out = service.advanced_search(name, {"geo_distance": {
        "distance": 1_000_000, "loc": [2.3522, 48.8566]}}, k=10)
    assert sorted(h["_source"]["id"]
                  for h in out["hits"]["hits"]) == [1, 2]
    # bounding box crossing the antimeridian: fiji + samoa only
    out = service.advanced_search(name, {"geo_bounding_box": {"loc": {
        "top_left": {"lat": 0.0, "lon": 170.0},
        "bottom_right": {"lat": -30.0, "lon": -170.0}}}}, k=10)
    assert sorted(h["_source"]["id"]
                  for h in out["hits"]["hits"]) == [5, 6]
    # edge-name form, normal box: europe
    out = service.advanced_search(name, {"geo_bounding_box": {"loc": {
        "top": 60.0, "left": 0.0, "bottom": 40.0, "right": 20.0}}},
        k=10)
    assert sorted(h["_source"]["id"]
                  for h in out["hits"]["hits"]) == [1, 2]
    # composes inside bool like any leaf
    out = service.advanced_search(name, {"bool": {
        "must": [{"geo_distance": {"distance": "1000km",
                                   "loc": "48.8566,2.3522"}}],
        "must_not": [{"term": {"city": "paris"}}]}}, k=10)
    assert [h["_source"]["id"] for h in out["hits"]["hits"]] == [1]


def test_geo_named_400s(service, spark):
    from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
        DslError,
    )

    name = _geo_table(service, spark, "data_lake_geo4")
    with pytest.raises(DslError, match="geo_shape"):
        service.advanced_search(name, {"geo_shape": {"loc": {}}})
    with pytest.raises(DslError, match="geo_polygon"):
        service.advanced_search(name, {"geo_polygon": {"loc": {}}})
    with pytest.raises(DslError, match="distance"):
        service.advanced_search(name, {"geo_distance": {
            "loc": {"lat": 0, "lon": 0}}})
    with pytest.raises(DslError, match="malformed distance"):
        service.advanced_search(name, {"geo_distance": {
            "distance": "10 parsecs", "loc": {"lat": 0, "lon": 0}}})
    with pytest.raises(DslError, match="distance_type"):
        service.advanced_search(name, {"geo_distance": {
            "distance": "1km", "distance_type": "plane",
            "loc": {"lat": 0, "lon": 0}}})
    with pytest.raises(DslError, match="unknown geo field"):
        service.advanced_search(name, {"geo_distance": {
            "distance": "1km", "nowhere": {"lat": 0, "lon": 0}}})
    with pytest.raises(DslError, match="malformed geo point"):
        service.advanced_search(name, {"geo_distance": {
            "distance": "1km", "loc": "u4pru"}})
    with pytest.raises(DslError, match="geo_bounding_box"):
        service.advanced_search(name, {"geo_bounding_box": {
            "loc": {"top_left": {"lat": 0, "lon": 0}}}})


def test_geohash_grid_agg(service, spark):
    from sql_database_to_elastic_datalake_spark.functions.geo import (
        geohash_py,
    )
    from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
        DslError,
    )

    name = _geo_table(service, spark, "data_lake_geo5")
    out = service.advanced_search(
        name, {"match_all": {}}, k=0,
        aggs={"cells": {"geohash_grid": {"field": "loc",
                                         "precision": 2}}})
    buckets = out["aggregations"]["cells"]["buckets"]
    # 6 non-null points; berlin+paris could share only at precision 1
    want: dict = {}
    for lat, lon in [(52.52, 13.405), (48.8566, 2.3522),
                     (40.7128, -74.006), (-33.8688, 151.2093),
                     (-17.7134, 178.065), (-13.759, -172.1046)]:
        h = geohash_py(lat, lon, 2)
        want[h] = want.get(h, 0) + 1
    assert {b["key"]: b["doc_count"] for b in buckets} == want
    # doc_count desc, key asc ordering
    counts = [b["doc_count"] for b in buckets]
    assert counts == sorted(counts, reverse=True)
    # size caps buckets; precision/size validation 400s by name
    out = service.advanced_search(
        name, {"match_all": {}}, k=0,
        aggs={"cells": {"geohash_grid": {"field": "loc",
                                         "precision": 2, "size": 3}}})
    assert len(out["aggregations"]["cells"]["buckets"]) == 3
    with pytest.raises(DslError, match="precision"):
        service.advanced_search(
            name, {"match_all": {}}, k=0,
            aggs={"c": {"geohash_grid": {"field": "loc",
                                         "precision": 12}}})
    with pytest.raises(DslError, match="sub-aggregations"):
        service.advanced_search(
            name, {"match_all": {}}, k=0,
            aggs={"c": {"geohash_grid": {"field": "loc"},
                        "aggs": {"m": {"avg": {"field": "id"}}}}})


def test_geo_rest_route(client, service, spark):
    name = _geo_table(service, spark, "data_lake_geo6")
    r = client.post("/search/advanced", data=json.dumps({
        "table": name,
        "query": {"geo_distance": {"distance": "1000km",
                                   "loc": {"lat": 48.8566,
                                           "lon": 2.3522}}}}),
        content_type="application/json")
    assert r.status_code == 200
    assert r.get_json()["hits"]["total"]["value"] == 2
    r = client.post("/search/advanced", data=json.dumps({
        "table": name, "query": {"geo_shape": {"loc": {}}}}),
        content_type="application/json")
    assert r.status_code == 400


@pytest.fixture()
def service(spark, tmp_path):
    from sql_database_to_elastic_datalake_spark.api import LakeService

    return LakeService(spark, str(tmp_path))


@pytest.fixture()
def client(service):
    flask = pytest.importorskip("flask")  # noqa: F841
    from sql_database_to_elastic_datalake_spark.api import create_app

    app = create_app(service)
    app.testing = True
    return app.test_client()


def test_parse_distance_units():
    from sql_database_to_elastic_datalake_spark.functions.geo import (
        parse_distance_km,
    )

    assert parse_distance_km("10km") == 10.0
    assert parse_distance_km("500m") == 0.5
    assert parse_distance_km(1000) == 1.0  # bare number = metres
    assert abs(parse_distance_km("1mi") - 1.609344) < 1e-12
    assert abs(parse_distance_km("1nmi") - 1.852) < 1e-12
    for bad in ("fast", "10 parsecs", True, "km"):
        with pytest.raises(ValueError):
            parse_distance_km(bad)


def test_bbox_wrap_math(spark):
    from sql_database_to_elastic_datalake_spark.functions.geo import (
        bbox_predicate,
    )

    df = spark.createDataFrame(
        [(0.0, 175.0), (0.0, -175.0), (0.0, 0.0)],
        "lat double, lon double")
    got = [r[0] for r in df.select(bbox_predicate(
        F.col("lat"), F.col("lon"), 10.0, 170.0, -10.0, -170.0)
    ).collect()]
    assert got == [True, True, False]


def test_geo_distance_sort(service, spark):
    """r13: the ES ``_geo_distance`` sort — hits ordered by haversine
    to the point, sort values carrying the distance in the requested
    unit; named 400s for mode/plane/multi-field."""
    from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
        DslError,
    )

    name = _geo_table(service, spark, "data_lake_geos")
    out = service.advanced_search(
        name, {"exists": {"field": "loc_lat"}}, k=3,
        sort=[{"_geo_distance": {"loc": {"lat": 48.8566, "lon": 2.3522},
                                 "order": "asc", "unit": "km"}}])
    hits = out["hits"]["hits"]
    # nearest to paris: paris (0), berlin (~878), newyork (~5837)
    assert [h["_source"]["id"] for h in hits] == [2, 1, 3]
    assert hits[0]["sort"][0] < 1e-9
    assert abs(hits[1]["sort"][0] - 878) / 878 < 0.005
    # default unit is metres
    out = service.advanced_search(
        name, {"exists": {"field": "loc_lat"}}, k=2,
        sort=[{"_geo_distance": {"loc": [2.3522, 48.8566]}}])
    assert abs(out["hits"]["hits"][1]["sort"][0] - 878_000) < 5000
    # desc order works; secondary tie-break clause composes
    out = service.advanced_search(
        name, {"exists": {"field": "loc_lat"}}, k=1,
        sort=[{"_geo_distance": {"loc": "48.8566,2.3522",
                                 "order": "desc", "unit": "km"}},
              {"id": "asc"}])
    assert out["hits"]["hits"][0]["_source"]["id"] == 4  # sydney
    for bad, frag in [
        ({"_geo_distance": {"loc": {"lat": 0, "lon": 0},
                            "mode": "min"}}, "mode"),
        ({"_geo_distance": {"loc": {"lat": 0, "lon": 0},
                            "distance_type": "plane"}},
         "distance_type"),
        ({"_geo_distance": {"loc": {"lat": 0, "lon": 0},
                            "unit": "parsec"}}, "unit"),
        ({"_geo_distance": {"loc": {"lat": 0, "lon": 0},
                            "other": {"lat": 1, "lon": 1}}},
         "exactly one"),
    ]:
        with pytest.raises(DslError, match=frag):
            service.advanced_search(name, {"match_all": {}}, k=1,
                                    sort=[bad])


def test_geo_agg_family(service, spark):
    """r13 late: geotile_grid / geo_distance rings (with metric subs)
    / geo_bounds (wrap choice) / geo_centroid through the aggs
    pipeline, plus the named 400s for result-changing options."""
    from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
        DslError,
    )

    name = _geo_table(service, spark, "data_lake_geoagg")
    out = service.advanced_search(name, {"match_all": {}}, k=0, aggs={
        "tiles": {"geotile_grid": {"field": "loc", "precision": 2}},
        "rings": {"geo_distance": {
            "field": "loc", "origin": {"lat": 48.8566, "lon": 2.3522},
            "ranges": [{"to": 1000}, {"from": 1000, "to": 7000},
                       {"from": 7000}],
            "unit": "km"},
            "aggs": {"ids": {"sum": {"field": "id"}}}},
        "box": {"geo_bounds": {"field": "loc"}},
        "c": {"geo_centroid": {"field": "loc"}},
    })
    aggs = out["aggregations"]
    tiles = {b["key"]: b["doc_count"] for b in aggs["tiles"]["buckets"]}
    # paris+berlin share z2 tile 2/2/1; fiji 2/3/2, samoa 2/0/2
    assert tiles["2/2/1"] == 2 and tiles["2/0/2"] == 1
    rings = aggs["rings"]["buckets"]
    # <1000 km of paris: paris + berlin (sum ids 3); null point in NO
    # band (haversine null regression — least() must not clamp null)
    assert [b["doc_count"] for b in rings] == [2, 1, 3]
    assert rings[0]["ids"]["value"] == 3
    assert sum(b["doc_count"] for b in rings) == 6
    # fiji(178.065) + samoa(-172.1) make the wrapped box smaller:
    # bounds still unwrapped here (newyork/sydney dominate) — so
    # check wrap explicitly on the pacific pair
    b = aggs["box"]["bounds"]
    assert b["top_left"]["lat"] == 52.52
    assert b["bottom_right"]["lat"] == -33.8688
    assert aggs["c"]["count"] == 6
    assert abs(aggs["c"]["location"]["lat"]
               - (52.52 + 48.8566 + 40.7128 - 33.8688 - 17.7134
                  - 13.759) / 6) < 1e-9

    # dateline pair alone: the wrapped box crosses (left 178.065,
    # right -172.1046); wrap_longitude false gives the unwrapped box
    spark.createDataFrame(
        [(1, 10.0, 178.065), (2, -5.0, -172.1046)],
        "id long, p_lat double, p_lon double",
    ).write.parquet(os.path.join(service.lake_dir, "data_lake_geodl"))
    outs = [service.advanced_search(
        "data_lake_geodl", {"match_all": {}}, k=0,
        aggs={"b": {"geo_bounds": {"field": "p",
                                   "wrap_longitude": w}}})
        for w in (True, False)]
    bw = outs[0]["aggregations"]["b"]["bounds"]
    assert (bw["top_left"]["lon"], bw["bottom_right"]["lon"]) \
        == (178.065, -172.1046)
    bn = outs[1]["aggregations"]["b"]["bounds"]
    assert (bn["top_left"]["lon"], bn["bottom_right"]["lon"]) \
        == (-172.1046, 178.065)

    # named 400s: geotile bounds (result-changing, unlisted key),
    # bad precision, geo_distance plane, unknown unit
    for bad in [
        {"t": {"geotile_grid": {"field": "loc",
                                "bounds": {"top_left": "u"}}}},
        {"t": {"geotile_grid": {"field": "loc", "precision": 30}}},
        {"r": {"geo_distance": {"field": "loc", "origin": "0,0",
                                "ranges": [{"to": 1}],
                                "distance_type": "plane"}}},
        {"r": {"geo_distance": {"field": "loc", "origin": "0,0",
                                "ranges": [{"to": 1}],
                                "unit": "parsec"}}},
        {"b": {"geo_bounds": {"field": "loc",
                              "wrap_longitude": "yes"}}},
        {"c": {"geo_centroid": {"field": "loc", "extra": 1}}},
    ]:
        with pytest.raises(DslError):
            service.advanced_search(name, {"match_all": {}}, k=0,
                                    aggs=bad)


def test_haversine_null_stays_null(spark):
    """Regression (r13 late): F.least ignores nulls, so the sqrt-arg
    clamp used to turn a NULL coordinate into the antipodal max
    distance. Null in → null out."""
    from sql_database_to_elastic_datalake_spark.functions.geo import (
        haversine_km,
    )

    df = spark.createDataFrame(
        [(None, None), (0.0, 0.0)], "lat double, lon double")
    got = [r[0] for r in df.select(haversine_km(
        F.col("lat"), F.col("lon"), F.lit(0.0), F.lit(0.0))).collect()]
    assert got[0] is None and abs(got[1]) < 1e-9


def test_geotile_matches_reference(spark):
    """geotile column vs the driver-side twin vs a published OSM tile
    (paris z10 = 10/518/352), incl. the ±85.05° mercator clamp."""
    from sql_database_to_elastic_datalake_spark.functions.geo import (
        geotile,
        geotile_py,
    )

    pts = [(48.8566, 2.3522), (0.0, 0.0), (89.9, 179.99),
           (-89.9, -180.0), (-33.8688, 151.2093), (85.0512, 0.0)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    for z in (0, 1, 7, 10):
        got = [r[0] for r in df.select(
            geotile(F.col("lat"), F.col("lon"), z)).collect()]
        want = [geotile_py(lat, lon, z) for lat, lon in pts]
        assert got == want, (z, got, want)
    assert geotile_py(48.8566, 2.3522, 10) == "10/518/352"


def test_geo_distance_feature(service, spark):
    """r13 late: distance_feature over a geo field — ES's "boost
    nearby" leaf. Top-level ranked page orders by proximity; inside a
    bool should it contributes its decay score (not a constant)."""
    name = _geo_table(service, spark, "data_lake_geodf")
    body = {"distance_feature": {
        "field": "loc", "origin": {"lat": 48.8566, "lon": 2.3522},
        "pivot": "1000km"}}
    out = service.advanced_search(name, body, k=3)
    hits = out["hits"]["hits"]
    # nearest to paris first: paris, berlin, newyork
    assert [h["_source"]["id"] for h in hits] == [2, 1, 3]
    # paris is the origin: score == boost * pivot/(pivot+0) == 1
    assert abs(hits[0]["_score"] - 1.0) < 1e-9
    # berlin ~878 km: pivot/(pivot+878)
    assert abs(hits[1]["_score"] - 1000.0 / 1878.0) < 1e-2
    # null-point doc is not a member
    assert out["hits"]["total"]["value"] == 6

    # inside a bool should: decay score rides the sum (match_all
    # contributes 1.0; paris beats sydney)
    out = service.advanced_search(name, {"bool": {
        "must": [{"match_all": {}}],
        "should": [body["distance_feature"] and body]}}, k=2)
    hits = out["hits"]["hits"]
    assert hits[0]["_source"]["id"] == 2
    assert abs(hits[0]["_score"] - 2.0) < 1e-9

    # named 400s: malformed pivot, missing origin
    from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
        DslError,
    )
    with pytest.raises(DslError, match="pivot"):
        service.advanced_search(name, {"distance_feature": {
            "field": "loc", "origin": "0,0",
            "pivot": "wat"}}, k=1)


def test_geo_polygon_shape_grid(service, spark):
    """r13 late: geo_polygon (ray cast), geo_shape over point docs
    (envelope/circle/polygon/point × relations), geo_grid cell
    membership (geohash + geotile) — and their named 400s."""
    from sql_database_to_elastic_datalake_spark.functions.geo import (
        geohash_py,
        geotile_py,
    )
    from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
        DslError,
    )

    name = _geo_table(service, spark, "data_lake_geoshape")

    def ids(q, **kw):
        out = service.advanced_search(name, q, k=10,
                                      sort=[{"id": "asc"}], **kw)
        return [h["_source"]["id"] for h in out["hits"]["hits"]]

    # polygon around western europe: berlin + paris in, rest out
    eu = {"points": [{"lat": 60.0, "lon": -10.0},
                     {"lat": 60.0, "lon": 20.0},
                     {"lat": 40.0, "lon": 20.0},
                     {"lat": 40.0, "lon": -10.0}]}
    assert ids({"geo_polygon": {"loc": eu}}) == [1, 2]

    # geo_shape envelope (GeoJSON corner order) — same box
    env = {"type": "envelope",
           "coordinates": [[-10.0, 60.0], [20.0, 40.0]]}
    assert ids({"geo_shape": {"loc": {"shape": env}}}) == [1, 2]
    # within == intersects for point docs; disjoint = the rest
    # (null-point doc 7 matches neither)
    assert ids({"geo_shape": {"loc": {"shape": env,
                                      "relation": "within"}}}) == [1, 2]
    assert ids({"geo_shape": {"loc": {"shape": env,
                                      "relation": "disjoint"}}}) \
        == [3, 4, 5, 6]
    # circle: 1000 km around paris
    circ = {"type": "circle", "coordinates": [2.3522, 48.8566],
            "radius": "1000km"}
    assert ids({"geo_shape": {"loc": {"shape": circ}}}) == [1, 2]
    # polygon shape (GeoJSON ring, lon-lat order, explicit close)
    ring = {"type": "polygon", "coordinates": [[
        [-10.0, 60.0], [20.0, 60.0], [20.0, 40.0], [-10.0, 40.0],
        [-10.0, 60.0]]]}
    assert ids({"geo_shape": {"loc": {"shape": ring}}}) == [1, 2]
    # point shape: exact match; contains holds only for point shapes
    pt = {"type": "point", "coordinates": [13.405, 52.52]}
    assert ids({"geo_shape": {"loc": {"shape": pt}}}) == [1]
    assert ids({"geo_shape": {"loc": {"shape": pt,
                                      "relation": "contains"}}}) == [1]

    # geo_grid: berlin's geohash-2 cell and geotile z4 tile
    cell = geohash_py(52.52, 13.405, 2)
    got = ids({"geo_grid": {"loc": {"geohash": cell}}})
    assert 1 in got and 3 not in got
    tile = geotile_py(52.52, 13.405, 4)
    got = ids({"geo_grid": {"loc": {"geotile": tile}}})
    assert 1 in got and 4 not in got

    # named 400s
    for bad, frag in [
        ({"geo_polygon": {"loc": {"points": [{"lat": 0, "lon": 0}]}}},
         "at least 3"),
        ({"geo_shape": {"loc": {"indexed_shape": {"id": "x"}}}},
         "indexed_shape"),
        ({"geo_shape": {"loc": {"shape": env, "relation": "wat"}}},
         "relation"),
        ({"geo_shape": {"loc": {"shape": ring,
                                "relation": "contains"}}}, "contains"),
        ({"geo_shape": {"loc": {"shape": {
            "type": "multipolygon", "coordinates": []}}}},
         "multi-geometries"),
        ({"geo_shape": {"loc": {"shape": {
            "type": "polygon",
            "coordinates": [[[0.0, 0.0], [1.0, 1.0], [0.0, 1.0],
                             [0.0, 0.0]], [[0.1, 0.1], [0.2, 0.2],
                                           [0.1, 0.2], [0.1, 0.1]]]}}}},
         "holes"),
        ({"geo_grid": {"loc": {"geohex": "8a1"}}}, "geohex"),
        ({"geo_grid": {"loc": {"geotile": "4/2"}}}, "z/x/y"),
        ({"geo_grid": {"loc": {"geohash": "a" * 9}}}, "1-8"),
    ]:
        with pytest.raises(DslError, match=frag):
            service.advanced_search(name, bad, k=1)


def test_geo_decay_function_score(service, spark):
    """r13 late: function_score gauss/exp/linear decay over a GEO
    field — haversine distance, ES distance-grammar scale/offset;
    null points decay to the neutral 1.0 like missing fields."""
    name = _geo_table(service, spark, "data_lake_geodecay")
    out = service.advanced_search(name, {"function_score": {
        "query": {"match_all": {}},
        "functions": [{"gauss": {"loc": {
            "origin": {"lat": 48.8566, "lon": 2.3522},
            "scale": "2000km"}}}],
        "boost_mode": "replace",
    }}, k=7)
    hits = out["hits"]["hits"]
    scores = {h["_source"]["id"]: h["_score"] for h in hits}
    # paris at the origin scores exactly 1.0; berlin (~878 km) decays
    # by gauss: exp(-d^2/(2*sigma^2)), sigma^2 = -scale^2/(2 ln 0.5)
    assert abs(scores[2] - 1.0) < 1e-9
    sigma_sq = -(2000.0 ** 2) / (2.0 * math.log(0.5))
    import math as _m
    assert abs(scores[1] - _m.exp(-(878.4 ** 2) / (2 * sigma_sq))) < 2e-3
    # the null-point doc scores the neutral 1.0 (missing-field rule)
    assert abs(scores[7] - 1.0) < 1e-9
    # ordering: paris/nulls at 1.0, then berlin, then the far cities
    assert scores[1] > scores[3] > scores[4]
    # linear decay hits exactly 0 beyond s = scale/(1-decay)
    out = service.advanced_search(name, {"function_score": {
        "query": {"match_all": {}},
        "functions": [{"linear": {"loc": {
            "origin": "48.8566,2.3522", "scale": "100km",
            "offset": "900km", "decay": 0.5}}}],
        "boost_mode": "replace",
    }}, k=7)
    s2 = {h["_source"]["id"]: h["_score"]
          for h in out["hits"]["hits"]}
    assert s2[2] == 1.0 and s2[4] == 0.0  # paris inside offset; sydney far
    # named 400: malformed geo scale
    from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
        DslError,
    )
    with pytest.raises(DslError, match="decay"):
        service.advanced_search(name, {"function_score": {
            "query": {"match_all": {}},
            "functions": [{"gauss": {"loc": {
                "origin": "0,0", "scale": "parsecs"}}}],
        }}, k=1)


def test_geo_line_agg(service, spark):
    """r13 late: geo_line — points connected into a GeoJSON
    LineString in sort order; truncation flags complete=false; docs
    missing point or sort are excluded."""
    from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
        DslError,
    )

    spark.createDataFrame(
        [(1, 3, 10.0, 1.0), (2, 1, 30.0, 3.0), (3, 2, 20.0, 2.0),
         (4, 4, None, None), (5, None, 40.0, 4.0)],
        "id long, seq long, p_lat double, p_lon double",
    ).write.parquet(os.path.join(service.lake_dir, "data_lake_track"))
    out = service.advanced_search("data_lake_track", {"match_all": {}},
                                  k=0, aggs={"trk": {"geo_line": {
                                      "point": {"field": "p"},
                                      "sort": {"field": "seq"},
                                      "include_sort": True}}})
    trk = out["aggregations"]["trk"]
    assert trk["geometry"]["type"] == "LineString"
    # seq order 1,2,3 -> coords [lon, lat]; ids 4 (null point) and 5
    # (null sort) excluded
    assert trk["geometry"]["coordinates"] == [
        [3.0, 30.0], [2.0, 20.0], [1.0, 10.0]]
    assert trk["properties"] == {"complete": True,
                                 "sort_values": [1, 2, 3]}
    # desc + size truncation flags complete False
    out = service.advanced_search("data_lake_track", {"match_all": {}},
                                  k=0, aggs={"trk": {"geo_line": {
                                      "point": {"field": "p"},
                                      "sort": {"field": "seq"},
                                      "sort_order": "desc",
                                      "size": 2}}})
    trk = out["aggregations"]["trk"]
    assert trk["geometry"]["coordinates"] == [[1.0, 10.0], [2.0, 20.0]]
    assert trk["properties"]["complete"] is False
    # named 400s: missing sort, bad size, subs
    for bad in [
        {"trk": {"geo_line": {"point": {"field": "p"}}}},
        {"trk": {"geo_line": {"point": {"field": "p"},
                              "sort": {"field": "seq"},
                              "size": 20000}}},
        {"trk": {"geo_line": {"point": {"field": "p"},
                              "sort": {"field": "seq"}},
                 "aggs": {"m": {"avg": {"field": "seq"}}}}},
    ]:
        with pytest.raises(DslError):
            service.advanced_search("data_lake_track",
                                    {"match_all": {}}, k=0, aggs=bad)


def test_geo_centroid_under_distance_rings(service, spark):
    """r13 late lock-in: geo metric aggs ride the per-band recursion —
    a geo_distance ring with a geo_centroid/geo_bounds sub gives the
    per-ring centroid/box (the Kibana Maps drill-down shape)."""
    name = _geo_table(service, spark, "data_lake_georings2")
    out = service.advanced_search(name, {"match_all": {}}, k=0, aggs={
        "rings": {"geo_distance": {
            "field": "loc", "origin": {"lat": 48.8566, "lon": 2.3522},
            "ranges": [{"to": 1000}, {"from": 1000}], "unit": "km"},
            "aggs": {"c": {"geo_centroid": {"field": "loc"}},
                     "b": {"geo_bounds": {"field": "loc"}}}},
    })
    rings = out["aggregations"]["rings"]["buckets"]
    near, far = rings[0], rings[1]
    # near ring = paris + berlin
    assert near["doc_count"] == 2 and near["c"]["count"] == 2
    assert abs(near["c"]["location"]["lat"]
               - (48.8566 + 52.52) / 2) < 1e-9
    assert near["b"]["bounds"]["top_left"]["lat"] == 52.52
    # far ring holds the other four real points
    assert far["doc_count"] == 4 and far["c"]["count"] == 4


def test_geohash_geotile_null_propagation(spark):
    """r14 (ADVICE): null lat/lon gives a NULL cell key — the
    least/greatest clamps IGNORE nulls, so without propagation a doc
    missing the field would collapse into the edge/corner cell
    (all-ones geohash, tile row 0) and spuriously match a geo_grid
    query on that cell."""
    from sql_database_to_elastic_datalake_spark.functions.geo import (
        geohash,
        geotile,
    )

    df = spark.createDataFrame(
        [(52.52, 13.405), (None, 13.405), (52.52, None), (None, None)],
        "lat double, lon double")
    got = df.select(
        geohash(F.col("lat"), F.col("lon"), 5).alias("h"),
        geotile(F.col("lat"), F.col("lon"), 7).alias("t")).collect()
    assert got[0]["h"] is not None and got[0]["t"] is not None
    for r in got[1:]:
        assert r["h"] is None and r["t"] is None


def test_geo_grid_query_never_matches_null_coords(service, spark):
    """r14 (ADVICE): the geo_grid query leaf must not match docs whose
    geo field is absent — pre-fix, a null coordinate clamped to the
    all-ones geohash / max tile cell and matched queries on that
    cell."""
    rows = [(1, 89.999, 179.999),   # the real corner-cell resident
            (2, None, None)]        # absent field
    spark.createDataFrame(
        rows, "id long, loc_lat double, loc_lon double"
    ).write.parquet(os.path.join(service.lake_dir, "data_lake_geoz"))
    from sql_database_to_elastic_datalake_spark.functions.geo import (
        geohash_py,
        geotile_py,
    )

    corner_hash = geohash_py(89.999, 179.999, 5)
    assert corner_hash == "zzzzz"  # the cell nulls used to clamp into
    out = service.advanced_search("data_lake_geoz", {"geo_grid": {
        "loc": {"geohash": corner_hash}}})
    ids = sorted(h["_source"]["id"] for h in out["hits"]["hits"])
    assert ids == [1]
    corner_tile = geotile_py(89.999, 179.999, 6)
    out = service.advanced_search("data_lake_geoz", {"geo_grid": {
        "loc": {"geotile": corner_tile}}})
    ids = sorted(h["_source"]["id"] for h in out["hits"]["hits"])
    assert ids == [1]


def test_geo_filter_on_non_geo_column_named_400(service, spark):
    """r14 (ADVICE): the FILTER path (no aggs/sort involved) now
    carries the schema, so a geo leaf naming an existing non-geo
    column is the named 'not a geo_point' 400 — not an
    AnalysisException-shaped 500."""
    from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
        GeoResolutionError,
    )

    name = _geo_table(service, spark, "data_lake_geobad")
    with pytest.raises(GeoResolutionError, match="not a geo_point"):
        service.advanced_search(name, {"geo_distance": {
            "distance": "10km", "city": {"lat": 1.0, "lon": 2.0}}})
    with pytest.raises(GeoResolutionError, match="unknown geo field"):
        service.advanced_search(name, {"geo_distance": {
            "distance": "10km", "nosuch": {"lat": 1.0, "lon": 2.0}}})


def test_percolator_put_tolerates_geo_leaves(client, service, spark):
    """r14 (ADVICE): storing a percolator query with a geo leaf is
    accepted (field resolution is a match-time concern); matching
    still works against a geo table and stays a named 400 against a
    non-geo one."""
    r = client.put("/percolator/geo1", data=json.dumps({
        "query": {"geo_distance": {"distance": "1000km",
                                   "loc": {"lat": 48.8566,
                                           "lon": 2.3522}}}}),
        content_type="application/json")
    assert r.status_code == 200, r.get_json()
    # a malformed geo leaf still 400s at PUT (grammar, not resolution)
    r = client.put("/percolator/geo2", data=json.dumps({
        "query": {"geo_distance": {"distance": "not-a-distance",
                                   "loc": {"lat": 0.0, "lon": 0.0}}}}),
        content_type="application/json")
    assert r.status_code == 400
    name = _geo_table(service, spark, "data_lake_geoperc")
    from sql_database_to_elastic_datalake_spark.plans.percolate import (
        percolate_corpus,
    )

    df = spark.read.parquet(os.path.join(service.lake_dir, name))
    out = percolate_corpus(df, {"geo1": service.percolator_queries[
        "geo1"]}, id_cols=["id"])
    ids = sorted(r["id"] for r in out.collect())
    assert ids == [1, 2]  # berlin + paris within 1000km of paris
