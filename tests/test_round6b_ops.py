"""Round-6b operator units: the clamped-cumsum / CUSUM sequential
recurrence vs a pure-Python replay, grid-blocked geo radius join vs
the brute-force cross join, and the distributed 2-D skyline vs the
quadratic dominance definition."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# sequential.clamped_cumsum


def _replay(xs, floor, cap, init=0.0):
    s, out = init, []
    for x in xs:
        s = s + x
        if floor is not None and s < floor:
            s = floor
        if cap is not None and s > cap:
            s = cap
        out.append(s)
    return out


@pytest.mark.parametrize("floor,cap", [(0.0, 100.0), (None, 50.0), (-10.0, None), (None, None)])
def test_clamped_cumsum_matches_python_replay(spark, floor, cap):
    from jibaro_spark.operators.sequential import clamped_cumsum

    rng = random.Random(7)
    rows = [
        (k, i, float(rng.randint(-30, 30)))
        for k in ("a", "b", "c")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "k string, i int, x double")
    got = {
        (r["k"], r["i"]): r["s"]
        for r in clamped_cumsum(
            df, keys=["k"], order_by=["i"], value_col="x",
            floor=floor, cap=cap, out_col="s",
        ).collect()
    }
    for k in ("a", "b", "c"):
        xs = [x for kk, _, x in rows if kk == k]
        want = _replay(xs, floor, cap)
        for i, w in enumerate(want):
            assert got[(k, i)] == w, (k, i)


def test_clamped_cumsum_rejects_bad_bounds(spark):
    from jibaro_spark.operators.sequential import clamped_cumsum

    df = spark.createDataFrame([("a", 1, 1.0)], "k string, i int, x double")
    with pytest.raises(ValueError):
        clamped_cumsum(df, keys=["k"], order_by=["i"], value_col="x", floor=5.0, cap=1.0)
    with pytest.raises(ValueError):
        clamped_cumsum(df, keys=[], order_by=["i"], value_col="x")
    with pytest.raises(ValueError):
        clamped_cumsum(df, keys=["k"], order_by=[], value_col="x")


def test_cusum_is_floor_clamped_deviation_sum(spark):
    from jibaro_spark.operators.sequential import cusum

    rows = [("a", i, float(v)) for i, v in enumerate([5, 5, 9, 9, 9, 2, 5])]
    df = spark.createDataFrame(rows, "k string, i int, x double")
    got = {
        r["i"]: r["cusum"]
        for r in cusum(df, keys=["k"], order_by=["i"], value_col="x",
                       target=5.0, slack=0.5).collect()
    }
    want = _replay([v - 5.0 - 0.5 for _, _, v in rows], 0.0, None)
    assert got == {i: w for i, w in enumerate(want)}
    # the operator's scratch deviation column must not leak
    out = cusum(df, keys=["k"], order_by=["i"], value_col="x", target=5.0)
    assert "__cusum_dev" not in out.columns


# ---------------------------------------------------------------------------
# geo.haversine_km / geo_radius_join


def _hav(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = math.radians(lat2 - lat1)
    dl = math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * 6371.0 * math.asin(math.sqrt(a))


def test_haversine_known_distances(spark):
    from jibaro_spark.operators.geo import haversine_km

    # London -> Paris great-circle is ~343-344 km on the sphere
    df = spark.createDataFrame(
        [(51.5074, -0.1278, 48.8566, 2.3522)], "a double, b double, c double, d double"
    )
    got = df.select(
        haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("km")
    ).first()["km"]
    assert abs(got - _hav(51.5074, -0.1278, 48.8566, 2.3522)) < 1e-9
    assert 340 < got < 347


def test_geo_radius_join_matches_bruteforce(spark):
    from jibaro_spark.operators.geo import geo_radius_join

    rng = random.Random(11)
    left = [(i, rng.uniform(-60, 60), rng.uniform(-180, 180)) for i in range(80)]
    right = [(j, rng.uniform(-60, 60), rng.uniform(-180, 180)) for j in range(60)]
    ldf = spark.createDataFrame(left, "lid int, lat double, lon double")
    rdf = spark.createDataFrame(right, "rid int, rlat double, rlon double")
    got = {
        (r["lid"], r["rid"])
        for r in geo_radius_join(
            ldf, rdf, radius_km=1500.0,
            left_coords=("lat", "lon"), right_coords=("rlat", "rlon"),
            max_abs_lat=60.0,
        ).collect()
    }
    want = {
        (i, j)
        for i, la, lo in left
        for j, ra, ro in right
        if _hav(la, lo, ra, ro) <= 1500.0
    }
    assert got == want


def test_geo_radius_join_rejects_lossy_cell(spark):
    from jibaro_spark.operators.geo import geo_radius_join, min_cell_deg

    ldf = spark.createDataFrame([(1, 0.0, 0.0)], "lid int, lat double, lon double")
    with pytest.raises(ValueError):
        geo_radius_join(ldf, ldf.selectExpr("lid rid", "lat rlat", "lon rlon"),
                        radius_km=1000.0, right_coords=("rlat", "rlon"),
                        cell_deg=min_cell_deg(1000.0, 60.0) * 0.5)
    with pytest.raises(ValueError):
        min_cell_deg(100.0, 89.0)


# ---------------------------------------------------------------------------
# relational.skyline_2d


def _brute_skyline(pts):
    out = []
    for a in pts:
        dominated = any(
            (b[1] < a[1] and b[2] >= a[2]) or (b[1] <= a[1] and b[2] > a[2])
            for b in pts
        )
        if not dominated:
            out.append(a[0])
    return sorted(out)


def test_skyline_matches_bruteforce_with_ties_and_chunks(spark):
    from jibaro_spark.operators.relational import skyline_2d

    rng = random.Random(3)
    # duplicated (price,size) points and prices straddling many chunks
    pts = [(i, float(rng.randint(0, 40)) * 7.5, rng.randint(1, 25)) for i in range(200)]
    pts += [(1000 + i, pts[i][1], pts[i][2]) for i in range(10)]  # exact dup points
    df = spark.createDataFrame(pts, "id int, price double, size int")
    got = sorted(
        r["id"]
        for r in skyline_2d(df, "price", "size", chunk_width=20.0).collect()
    )
    assert got == _brute_skyline(pts)


def test_skyline_single_point_and_all_dominated(spark):
    from jibaro_spark.operators.relational import skyline_2d

    df = spark.createDataFrame([(1, 5.0, 3)], "id int, price double, size int")
    assert [r["id"] for r in skyline_2d(df, "price", "size").collect()] == [1]
    # a strictly better point dominates everything else
    df2 = spark.createDataFrame(
        [(1, 1.0, 10), (2, 2.0, 9), (3, 3.0, 5)], "id int, price double, size int"
    )
    assert sorted(
        r["id"] for r in skyline_2d(df2, "price", "size", chunk_width=1.0).collect()
    ) == [1]


# ---------------------------------------------------------------------------
# graph.sssp


def _dijkstra(edges, src):
    import heapq

    adj = {}
    for a, b, w in edges:
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    dist = {src: 0}
    pq = [(0, src)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def test_sssp_matches_dijkstra(spark):
    from jibaro_spark.operators.graph import sssp

    rng = random.Random(5)
    nodes = list(range(30))
    edges = [
        (a, b, rng.randint(1, 9))
        for a in nodes
        for b in nodes
        if a < b and rng.random() < 0.15
    ]
    edf = spark.createDataFrame(edges, "src int, dst int, weight int")
    sdf = spark.createDataFrame([(0,)], "node int")
    got = {r["node"]: r["dist"] for r in sssp(edf, sdf).collect()}
    assert got == _dijkstra(edges, 0)


def test_sssp_label_correction_beats_greedy_hops(spark):
    from jibaro_spark.operators.graph import sssp

    # 0-1 (10) vs 0-2-1 (2+2): the 2-hop path must override the
    # earlier 1-hop label — the label-correcting case BFS cannot do
    edf = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 2), (2, 1, 2)], "src int, dst int, weight int"
    )
    sdf = spark.createDataFrame([(0,)], "node int")
    got = {r["node"]: r["dist"] for r in sssp(edf, sdf).collect()}
    assert got == {0: 0, 1: 4, 2: 2}


def test_sssp_rejects_negative_weights(spark):
    from jibaro_spark.operators.graph import sssp

    edf = spark.createDataFrame([(0, 1, -1)], "src int, dst int, weight int")
    sdf = spark.createDataFrame([(0,)], "node int")
    with pytest.raises(ValueError):
        sssp(edf, sdf)


# ---------------------------------------------------------------------------
# sequential.next_greater


def test_next_greater_matches_quadratic_definition(spark):
    from jibaro_spark.operators.sequential import next_greater

    rng = random.Random(13)
    rows = [(k, i, rng.randint(0, 10)) for k in ("a", "b") for i in range(60)]
    df = spark.createDataFrame(rows, "k string, i int, v int")
    got = {
        (r["k"], r["i"]): r["next_ord"]
        for r in next_greater(df, keys=["k"], order_col="i", value_col="v").collect()
    }
    for k, i, v in rows:
        later = [j for kk, j, w in rows if kk == k and j > i and w > v]
        want = min(later) if later else None
        assert got[(k, i)] == want, (k, i, v)


def test_next_greater_monotone_runs(spark):
    from jibaro_spark.operators.sequential import next_greater

    # strictly decreasing: nothing resolves; strictly increasing:
    # every row resolves to its immediate successor
    dec = spark.createDataFrame(
        [("d", i, 10 - i) for i in range(5)], "k string, i int, v int"
    )
    inc = spark.createDataFrame(
        [("u", i, i) for i in range(5)], "k string, i int, v int"
    )
    gd = {r["i"]: r["next_ord"] for r in next_greater(dec, ["k"], "i", "v").collect()}
    gi = {r["i"]: r["next_ord"] for r in next_greater(inc, ["k"], "i", "v").collect()}
    assert gd == {i: None for i in range(5)}
    assert gi == {0: 1, 1: 2, 2: 3, 3: 4, 4: None}
