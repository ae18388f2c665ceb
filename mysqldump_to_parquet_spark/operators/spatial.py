"""Grid-blocked spatial join — proximity matching at scale.

"Which suppliers sit within D km of each customer" is the spatial
workhorse (store catchments, courier assignment, geo dedup).  The naive
formulation is a cross join with a distance predicate — O(N·M) and
unshardable.  The scale shape here is the standard grid-blocking
rewrite, the spatial sibling of the interval join's bin blocking
(relational.py) and MinHash's band buckets (llm/dedup.py):

1. assign every point to a (lat_band, lon_cell) grid cell sized so that
   any two points within D km are in the SAME or ADJACENT cells;
2. explode one side (the small one) to its 3×3 cell neighborhood;
3. equi-join on the cell id — a plain hash shuffle, co-partitioned;
4. verify candidates with the exact haversine predicate.

Correctness of the blocking: latitude degrees are a constant 111 km, so
``Δlat = D/111`` bands with ±1 neighbors cover every pair.  Longitude
degrees shrink with cos(lat), so each band's cell width uses the band's
WORST-CASE (smallest) cosine — cells are conservatively wide near the
poles, never too narrow (the fixture synthesizes |lat| ≤ 85°, keeping
the cosine bounded away from 0; a production build would union a polar
bucket).  The verify step makes the result exactly the cross-join
semantics — blocking only prunes, never decides.

Fixture coordinates are the same deterministic synthesis as
``functions/scalar.py::fn_geo`` (the tables carry no real geography);
the DuckDB twin runs the NAIVE cross-join formulation, so the oracle
independently proves the blocking loses no pairs.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

#: Match radius (km) and the derived latitude band height in degrees.
RADIUS_KM = 450.0
LAT_DEG_KM = 111.0
BAND_DEG = RADIUS_KM / LAT_DEG_KM  # ≈ 4.05°

#: Coordinates are synthesized within |lat| ≤ 85°.
MAX_ABS_LAT = 85.0

_DEG = 3.141592653589793 / 180.0


def _synth_coords(key: Column) -> tuple[Column, Column]:
    """Deterministic lat/lon from an integer key (fn_geo's formula)."""
    lat = ((key * 7919) % 1700) / F.lit(10.0) - 85.0
    lon = ((key * 104729) % 3600) / F.lit(10.0) - 180.0
    return lat, lon


def _haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    dlat_h = (lat2 - lat1) * _DEG / 2
    dlon_h = (lon2 - lon1) * _DEG / 2
    a = (
        F.sin(dlat_h) * F.sin(dlat_h)
        + F.cos(lat1 * _DEG) * F.cos(lat2 * _DEG) * F.sin(dlon_h) * F.sin(dlon_h)
    )
    return 2 * 6371.0 * F.asin(F.sqrt(a))


def _band(lat: Column) -> Column:
    return F.floor(lat / BAND_DEG).cast("int")


def _lon_step(band: Column) -> Column:
    """Longitude cell width (degrees) for a band: D km at the worst-case
    (largest |lat|) cosine over the band AND its ±1 neighbors — a
    matching pair's other endpoint may sit one band away at a higher
    latitude, and the step must stay ≥ that pair's true Δlon bound."""
    edge_lo = F.abs((band.cast("double") - 1) * BAND_DEG)
    edge_hi = F.abs((band.cast("double") + 2) * BAND_DEG)
    worst = F.least(
        F.cos(
            F.least(F.greatest(edge_lo, edge_hi), F.lit(MAX_ABS_LAT)) * _DEG
        ),
        F.lit(1.0),
    )
    return F.lit(RADIUS_KM) / (F.lit(LAT_DEG_KM) * worst)


def _ncells(band: Column) -> Column:
    """Longitude cells per band: uniform width ≥ the band's step (a
    remainder-width seam cell would break ±1 adjacency), and the cell
    id is taken modulo this so the ±180° meridian wraps — a pair
    straddling the antimeridian is 0.2° apart, not 359.8°."""
    return F.greatest(
        F.floor(F.lit(360.0) / _lon_step(band)), F.lit(1)
    ).cast("int")


def _lon_cell(lon: Column, band: Column) -> Column:
    n = _ncells(band)
    width = F.lit(360.0) / n.cast("double")
    return F.pmod(F.floor((lon + 180.0) / width).cast("int"), n)


def join_spatial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_join_spatial: customers matched to all suppliers within
    RADIUS_KM, with match count and nearest distance — via the 3×3
    grid-blocked equi-join + exact haversine verify described in the
    module docstring.  The supplier side (the small one) explodes to
    its neighborhood; the customer side shuffles once on the cell key.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey")

    clat, clon = _synth_coords(F.col("c_custkey"))
    cband = _band(clat)
    cust = c.select(
        "c_custkey",
        clat.alias("clat"),
        clon.alias("clon"),
        cband.alias("band"),
        _lon_cell(clon, cband).alias("lcell"),
    )

    slat, slon = _synth_coords(F.col("s_suppkey"))
    supp = s.select(
        "s_suppkey", slat.alias("slat"), slon.alias("slon")
    )
    # explode the supplier to its 3 neighbor bands; cell ids are computed
    # per PROBE band, so both sides derive identical (band, lcell) keys
    nb = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("db")
    supp_b = supp.select("*", nb).select(
        "s_suppkey",
        "slat",
        "slon",
        (_band(F.col("slat")) + F.col("db")).alias("band"),
    )
    nl = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dl")
    supp_cells = supp_b.select("*", nl).select(
        "s_suppkey",
        "slat",
        "slon",
        "band",
        F.pmod(
            _lon_cell(F.col("slon"), F.col("band")) + F.col("dl"),
            _ncells(F.col("band")),
        ).alias("lcell"),
    )

    dist = _haversine_km(
        F.col("clat"), F.col("clon"), F.col("slat"), F.col("slon")
    )
    pairs = (
        cust.join(supp_cells, ["band", "lcell"])
        .select("c_custkey", "s_suppkey", dist.alias("km"))
        .where(F.col("km") <= RADIUS_KM)
    )
    return pairs.groupBy("c_custkey").agg(
        F.count(F.lit(1)).alias("n_within"),
        F.round(F.min("km"), 4).alias("nearest_km"),
    )


# The oracle is the NAIVE cross-join formulation — independently proving
# the grid blocking prunes candidates without losing pairs.
JOIN_SPATIAL_SQL = f"""
WITH cust AS (
  SELECT c_custkey,
         CAST((c_custkey * 7919) % 1700 AS DOUBLE) / 10.0 - 85.0  AS clat,
         CAST((c_custkey * 104729) % 3600 AS DOUBLE) / 10.0 - 180.0 AS clon
  FROM customer
), supp AS (
  SELECT s_suppkey,
         CAST((s_suppkey * 7919) % 1700 AS DOUBLE) / 10.0 - 85.0  AS slat,
         CAST((s_suppkey * 104729) % 3600 AS DOUBLE) / 10.0 - 180.0 AS slon
  FROM supplier
), pairs AS (
  SELECT c_custkey, s_suppkey,
         2 * 6371.0 * asin(sqrt(
           sin((slat - clat) * ({_DEG}) / 2) * sin((slat - clat) * ({_DEG}) / 2)
           + cos(clat * ({_DEG})) * cos(slat * ({_DEG}))
             * sin((slon - clon) * ({_DEG}) / 2)
             * sin((slon - clon) * ({_DEG}) / 2)
         )) AS km
  FROM cust CROSS JOIN supp
)
SELECT c_custkey,
       COUNT(*) AS n_within,
       ROUND(MIN(km), 4) AS nearest_km
FROM pairs
WHERE km <= {RADIUS_KM}
GROUP BY c_custkey
"""


QUERIES = {
    "q_join_spatial": join_spatial,
}

ORACLE = {
    "q_join_spatial": JOIN_SPATIAL_SQL,
}
