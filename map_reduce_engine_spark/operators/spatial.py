"""Spatial operators: grid-bucketed radius joins on point data.

The reference framework has no spatial capability at all (its jobs are
line-oriented text MapReduce, ``framework-src``); a production analytics
engine needs at least the radius self-join — "which point pairs lie within
d km of each other" — without the O(n²) cartesian Spark would naively plan
for a non-equi distance predicate.

The classic distributed recipe, implemented here:

1. snap every point to a grid cell at least ``radius`` wide in both axes
   (so any pair within ``radius`` sits in the same or an adjacent cell);
2. explode ONE side to its 3×3 cell neighborhood (a fixed 9× fan-out,
   independent of data size) and equi-join on the other side's actual
   cell — each qualifying pair is produced exactly once, because the join
   key is the right side's unique home cell;
3. evaluate the exact haversine distance only on co-cell candidates.

Scale shape: one shuffle on cell id; candidate count is bounded by local
point density (the premise of every spatial index), never n².  The same
plan holds for grid sizes tuned to any radius.

Haversine is evaluated in an explicitly-ordered arithmetic expression so a
DuckDB oracle replays the identical IEEE operations (see the engine-parity
conventions in queries/base.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (haversine), double precision."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2.0
    dlon = F.radians(lon2 - lon1) / 2.0
    hav = F.sin(dlat) * F.sin(dlat) + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon)
    return 2.0 * EARTH_RADIUS_KM * F.asin(F.sqrt(hav))


def grid_radius_pairs(
    df: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_km: float,
    cell_deg: float,
) -> DataFrame:
    """(id1, id2, dist_km) for all pairs within ``radius_km`` (id1 < id2).

    ``cell_deg`` must be >= the radius expressed in degrees along BOTH
    axes over the data's latitude band (1 deg latitude = 111 km; 1 deg
    longitude = 111*cos(lat) km) — the caller picks it because only the
    caller knows the band.  ``dist_km`` is rounded to 4 decimals and the
    radius filter applies to the ROUNDED value, making the output set
    engine-portable.
    """
    pts = df.select(
        F.col(id_col).alias("id"),
        F.col(lat_col).alias("lat"),
        F.col(lon_col).alias("lon"),
        F.floor(F.col(lat_col) / cell_deg).alias("cy"),
        F.floor(F.col(lon_col) / cell_deg).alias("cx"),
    )
    probe = (
        pts.select(
            "id", "lat", "lon",
            F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("dy"), "cy", "cx",
        )
        .select(
            "id", "lat", "lon", (F.col("cy") + F.col("dy")).alias("cy"),
            F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("dx"), "cx",
        )
        .select("id", "lat", "lon", "cy", (F.col("cx") + F.col("dx")).alias("cx"))
    )
    a, b = probe.alias("a"), pts.alias("b")
    dist = haversine_km(
        F.col("a.lat"), F.col("a.lon"), F.col("b.lat"), F.col("b.lon")
    )
    # The rounded distance is both an output column and the radius filter.
    # A plain alias would let Catalyst push the filter into the JOIN
    # CONDITION by substitution, evaluating the haversine TWICE per
    # surviving pair (once in the condition, again in the projection —
    # measured in the plan). Emitting it through inline() puts a Generate
    # between the join and the filter: the filter references the generator
    # OUTPUT attribute, cannot be pushed through, and the trig expression
    # runs exactly once per candidate.
    return (
        a.join(b, ["cy", "cx"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.inline(F.array(F.struct(F.round(dist, 4).alias("dist_km")))),
        )
        .where(F.col("dist_km") <= radius_km)
    )
