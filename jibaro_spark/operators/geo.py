"""Geospatial primitives: haversine distance and grid-blocked radius
joins — entirely native Spark expressions (no Python in the hot path).

The scale problem: "all pairs of points within R km" is a cross join
if written naively.  The standard fix is spatial blocking: bucket
points into square grid cells of side >= R, replicate ONE side into
its 3x3 neighborhood of cells, and equi-join on the cell id — every
true pair shares a cell with the replicated side, so the join is
lossless while candidate volume drops from |L|x|R| to the local
density.  This is the same inverted-index shape the dedup operators
use (minhash bands, q-gram signatures), applied to 2-D coordinates.

Cell sizing must be LOSSLESS, and the naive planar bound
``R / (111 * cos(lat))`` is not: two points at the same high latitude
take the poleward great-circle shortcut, so their longitude span for
a given distance EXCEEDS the planar estimate.  From the haversine
identity, two points with |lat| <= L at distance d have

    Δφ  <=  d / R_earth                       (latitude, radians)
    Δλ  <=  2·asin( sin(d / (2·R_earth)) / cos(L) )   (longitude)

``min_cell_deg`` returns the max of the two (degrees) and
``geo_radius_join`` enforces it given ``max_abs_lat`` (default 60°).
Longitude additionally WRAPS at ±180°: cells are therefore laid out
as ``ncx = floor(360 / cell_deg)`` UNIFORM cells of width
``360 / ncx >= cell_deg`` and neighbor offsets are taken modulo
``ncx`` (deduplicated when ncx < 3), so antimeridian-straddling pairs
land in adjacent cells like any others.  Poleward of ~85° grid
blocking degenerates (cells become slivers); data there should be
handled with a polar-cap partition — out of scope for the synthetic
fixtures here.

At 100 TB: the join shuffles both sides once on (cell_x, cell_y); the
x9 replication multiplies only the smaller (replicated) side; skewed
dense cells are ordinary join skew, handled by AQE skew-join splits.
Distance math is all whole-stage-codegen trig — no UDFs.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0
KM_PER_DEG_LAT = 111.045


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (haversine, spherical earth R=6371).

    Pure native expression; write the oracle SQL with the *same*
    formula text so both engines evaluate the identical IEEE-double
    expression tree.
    """
    phi1, phi2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1)
    dlam = F.radians(lon2 - lon1)
    a = (
        F.sin(dphi / 2) * F.sin(dphi / 2)
        + F.cos(phi1) * F.cos(phi2) * F.sin(dlam / 2) * F.sin(dlam / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def grid_cell(lat: Column, lon: Column, cell_deg: float) -> "tuple[Column, Column]":
    """(cell_x, cell_y) integer grid coordinates for a cell of side
    ``cell_deg`` degrees."""
    return (
        F.floor(lon / F.lit(float(cell_deg))).cast("long"),
        F.floor(lat / F.lit(float(cell_deg))).cast("long"),
    )


def min_cell_deg(radius_km: float, max_abs_lat: float) -> float:
    """Smallest lossless cell side (degrees) for a 3x3-neighborhood
    radius join at latitudes up to ``max_abs_lat`` — the exact
    spherical worst case, not the planar approximation (see module
    docstring)."""
    if not 0 <= max_abs_lat < 85:
        raise ValueError("max_abs_lat must be in [0, 85) for grid blocking")
    dphi = math.degrees(radius_km / EARTH_RADIUS_KM)
    s = math.sin(radius_km / (2.0 * EARTH_RADIUS_KM)) / math.cos(
        math.radians(max_abs_lat)
    )
    dlam = 360.0 if s >= 1.0 else math.degrees(2.0 * math.asin(s))
    return max(dphi, dlam)


def geo_radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    left_coords: "tuple[str, str]" = ("lat", "lon"),
    right_coords: "tuple[str, str]" = ("lat", "lon"),
    max_abs_lat: float = 60.0,
    cell_deg: float | None = None,
    dist_col: str = "dist_km",
) -> DataFrame:
    """All (left, right) pairs within ``radius_km``, grid-blocked.

    The RIGHT side is replicated into its 3x3 cell neighborhood (pick
    the smaller side as ``right``); the join is an equi-join on the
    cell id followed by the exact haversine filter, so the result is
    identical to the cross-join-and-filter answer.  Output columns:
    all of ``left``, all of ``right`` (caller must pre-alias any
    collisions), plus ``dist_col``.
    """
    if radius_km <= 0:
        raise ValueError("radius_km must be positive")
    floor_deg = min_cell_deg(radius_km, max_abs_lat)
    if cell_deg is None:
        cell_deg = floor_deg
    elif cell_deg < floor_deg:
        raise ValueError(
            f"cell_deg {cell_deg} < lossless floor {floor_deg:.6f} for "
            f"radius {radius_km} km at |lat|<={max_abs_lat}"
        )
    llat, llon = left_coords
    rlat, rlon = right_coords

    # uniform longitude cells with modular (antimeridian-wrapping)
    # adjacency; plain floor cells in latitude (no wrap)
    ncx = max(1, int(math.floor(360.0 / cell_deg)))
    lon_w = 360.0 / ncx

    def cells(lat: str, lon: str) -> "tuple[Column, Column]":
        cx = F.pmod(
            F.floor((F.col(lon) + F.lit(180.0)) / F.lit(lon_w)).cast("long"),
            F.lit(ncx),
        )
        cy = F.floor(F.col(lat) / F.lit(float(cell_deg))).cast("long")
        return cx, cy

    lx, ly = cells(llat, llon)
    l = left.withColumn("__cx", lx).withColumn("__cy", ly)

    rx, ry = cells(rlat, rlon)
    dxs = sorted({d % ncx for d in (-1, 0, 1)})  # distinct offsets mod ncx
    off = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx in dxs
                for dy in (-1, 0, 1)
            ]
        )
    )
    r = (
        right.withColumn("__o", off)
        .withColumn("__cx", F.pmod(rx + F.col("__o.dx"), F.lit(ncx)))
        .withColumn("__cy", ry + F.col("__o.dy"))
        .drop("__o")
    )
    dist = haversine_km(F.col(llat), F.col(llon), F.col(rlat), F.col(rlon))
    return (
        l.join(r, on=["__cx", "__cy"])
        .withColumn(dist_col, dist)
        .filter(F.col(dist_col) <= F.lit(float(radius_km)))
        .drop("__cx", "__cy")
    )


def geo_nearest_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_coords: "tuple[str, str]" = ("lat", "lon"),
    right_coords: "tuple[str, str]" = ("lat", "lon"),
    start_radius_km: float = 250.0,
    max_radius_km: float = 20040.0,
    max_abs_lat: float = 60.0,
    dist_col: str = "dist_km",
) -> DataFrame:
    """Nearest ``right`` point per ``left`` point via progressive
    radius refinement — the NN-only escape from the radius join's
    density² term (the documented-but-unimplemented scale path from
    the round-6b BASELINE note).

    ``geo_radius_join(r)`` pays for EVERY pair within ``r``: its
    output (and the work after the cell equi-join) grows with
    density² · r².  When only the single nearest neighbor is wanted,
    that is waste — so this escalates coarse-to-fine instead:

    1. round k blocks the still-unresolved left points against
       ``right`` at radius ``r_k = start · 2^k`` (3×3 lossless cells);
    2. each left point takes its candidate argmin (dist, right_id);
       the argmin is the TRUE global nearest iff its distance
       ≤ ``r_k`` — the neighborhood provably contains every point
       within ``r_k``, so nothing closer can be hiding outside it;
    3. points whose best candidate is farther than ``r_k`` (or who
       found none) escalate to ``2·r_k`` — but dense regions resolve
       in the cheap early rounds, so the expensive large-radius
       rounds run over ONLY the isolated points.  Density² applies
       where density is low; per-round join volume is
       |unresolved_k| · (local density at r_k), and |unresolved_k|
       shrinks geometrically wherever data is clustered.

    O(log2(max/start)) rounds, each one keyed equi-join + one
    map-combined argmin aggregate — no windows over pair volume, no
    cross join ever.  Per-round results are pinned with
    ``localCheckpoint`` (same frontier discipline as the BFS operator)
    so the unresolved anti-join does not recompute a deepening chain.
    Left points with no right point within ``max_radius_km`` are
    dropped (the default covers the half-circumference ⇒ total).

    Returns ``(left_id, right_id, dist_col)`` — one row per resolved
    left point; ties at equal distance break on the smaller
    ``right_id``.

    The two sides' id and coordinate column names must be DISJOINT
    (pre-alias before calling — same contract as
    :func:`geo_radius_join`, enforced here because the default
    ``("lat", "lon")`` on both sides would otherwise fail deep inside
    the join with an ambiguous-reference error).
    """
    if start_radius_km <= 0 or max_radius_km < start_radius_km:
        raise ValueError(
            "need 0 < start_radius_km <= max_radius_km "
            f"(got {start_radius_km}, {max_radius_km})"
        )
    overlap = ({left_id, *left_coords}) & ({right_id, *right_coords})
    if overlap:
        raise ValueError(
            f"geo_nearest_join: sides share column names {sorted(overlap)}; "
            "alias the id/coordinate columns apart before calling"
        )
    llat, llon = left_coords
    rlat, rlon = right_coords
    unresolved = left.select(left_id, llat, llon)
    resolved: DataFrame | None = None
    r = float(start_radius_km)
    while True:
        r = min(r, float(max_radius_km))
        cand = geo_radius_join(
            unresolved,
            right.select(right_id, rlat, rlon),
            radius_km=r,
            left_coords=left_coords,
            right_coords=right_coords,
            max_abs_lat=max_abs_lat,
            dist_col="__d",
        )
        # argmin by (dist, right_id): struct min is lexicographic, so
        # the right_id tie-break is total; one map-combined aggregate,
        # never a window over the candidate volume.  Every candidate
        # already satisfies dist <= r (geo_radius_join filters), and
        # the 3x3 neighborhood provably contains every point within r
        # — so ANY argmin here is the global nearest (step 2 above);
        # points with zero candidates simply produce no row and
        # escalate.
        won = cand.groupBy(left_id).agg(
            F.min(F.struct(F.col("__d"), F.col(right_id))).alias("__b")
        ).select(
            left_id,
            F.col(f"__b.{right_id}").alias(right_id),
            F.col("__b.__d").alias(dist_col),
        )
        # r13 NOTE (measured, rejected): LAZY per-round pins — folding
        # the round's 3 driver actions (won job, unresolved job,
        # isEmpty) into one isEmpty cascade — ABAB'd 3.262 vs 2.979 s
        # (9% WORSE, steal 0.02%).  isEmpty only computes the anti-
        # join's first partition, so the lazily-pinned remainder
        # re-runs its shuffle inside the NEXT round's radius join —
        # the same "eager blocks make follow-ups nearly free" result
        # as the r12 bfs-family lazy experiment.  Eager stays.
        won = won.localCheckpoint(eager=True)
        resolved = won if resolved is None else resolved.unionByName(won)
        if r >= max_radius_km:
            return resolved
        unresolved = unresolved.join(
            won.select(left_id), on=left_id, how="left_anti"
        ).localCheckpoint(eager=True)
        if unresolved.isEmpty():
            return resolved
        r *= 2.0
