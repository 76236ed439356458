"""Geospatial operators — grid-blocked proximity join and broadcast
nearest-neighbor over synthesized coordinates.

The TPC-H-ish testdata has no native lat/lon, so coordinates are
DERIVED deterministically from integer keys (modular hash → quasi-
uniform points on the ±60° latitude band) with the identical integer
expression on both engines — the geometry is synthetic, the OPERATORS
are the real thing: the blocked spatial join is the standard
scale-out layout (S2/H3/geohash cell → neighbor-cell probe →
exact-distance verify) and the oracle brute-forces all pairs to prove
blocking does not change the answer, exactly like the fuzzy-join's
PassJoin gate (linkage.py).

Latitudes are clamped to ±60° so longitude cell width is bounded
(1° lon ≥ 55.66 km there); with 500 km radius, 5°×10° cells and a
3×3 neighbor probe are provably sufficient: max Δlat = 4.52° < 5°,
max Δlon = 9.0° < 10° (haversine bound at φ = 60°), so a qualifying
pair never crosses more than one cell boundary per axis.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recommendation_system_big_data_spark.catalog import load
from recommendation_system_big_data_spark.registry import register

#: Earth mean radius (IUGG), km — same constant in both engines.
_R_KM = 6371.0088

#: Proximity-join radius (km) and the provably-sufficient cell grid.
_RADIUS_KM = 500.0
_CELL_LAT = 5.0
_CELL_LON = 10.0
_N_LON_CELLS = 36  # 360 / _CELL_LON: longitude cells wrap at ±180°


def _lat_expr(key: str) -> Column:
    """Deterministic quasi-uniform latitude in [-60, 60)."""
    return (F.col(key) * 7919 % 12000) / 100.0 - 60.0


def _lon_expr(key: str) -> Column:
    """Deterministic quasi-uniform longitude in [-180, 180)."""
    return (F.col(key) * 104729 % 36000) / 100.0 - 180.0


_LAT_SQL = "(({k} * 7919) % 12000) / 100.0 - 60.0"
_LON_SQL = "(({k} * 104729) % 36000) / 100.0 - 180.0"


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance, km. The expression tree is written once
    and mirrored verbatim in the oracles — cross-engine drift is the
    usual last-ulp libm noise, far below the ROUND(, 3) boundary."""
    dphi = F.radians(lat2 - lat1) / 2
    dlmb = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlmb)
        * F.sin(dlmb)
    )
    return 2 * _R_KM * F.asin(F.sqrt(a))


_HAVERSINE_SQL = (
    "2 * {r} * asin(sqrt("
    "sin(radians(({lat2}) - ({lat1})) / 2) * sin(radians(({lat2}) - ({lat1})) / 2)"
    " + cos(radians({lat1})) * cos(radians({lat2}))"
    " * sin(radians(({lon2}) - ({lon1})) / 2) * sin(radians(({lon2}) - ({lon1})) / 2)"
    "))"
)


def _prox_oracle() -> str:
    d = _HAVERSINE_SQL.format(
        r=_R_KM, lat1="c.lat", lon1="c.lon", lat2="s.lat", lon2="s.lon"
    )
    return f"""
WITH c AS (
    SELECT c_custkey, {_LAT_SQL.format(k='c_custkey')} AS lat,
           {_LON_SQL.format(k='c_custkey')} AS lon
    FROM customer
), s AS (
    SELECT s_suppkey, {_LAT_SQL.format(k='s_suppkey')} AS lat,
           {_LON_SQL.format(k='s_suppkey')} AS lon
    FROM supplier
)
SELECT c.c_custkey, s.s_suppkey, ROUND({d}, 3) AS dist_km
FROM c CROSS JOIN s
WHERE ROUND({d}, 3) <= {_RADIUS_KM}
"""


@register("geo_proximity_join_blocked", oracle=_prox_oracle(), tags=("geo",))
def geo_proximity_join_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All (customer, supplier) pairs within 500 km — the blocked
    spatial join: each point gets a 5°×10° grid cell, the probe side
    explodes its 3×3 cell neighborhood (longitude wraps at the
    antimeridian via modular cell ids), candidates meet in an EQUI-join
    on the cell key, and the exact haversine predicate keeps only true
    neighbors. The oracle brute-forces every pair — blocking must not
    change the answer (cell sizing proof in the module docstring).

    Scale shape: candidates ≈ density × 9 cells per probe row instead
    of |C|·|S|; the cell key is uniformly distributed by construction
    (modular-hash coordinates), and real-world hot cells (cities) are
    exactly what AQE skew-join splits. 9× probe fan-out is the price of
    equi-join blocking — the same trade as the LSH band explode."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        _lat_expr("c_custkey").alias("lat"),
        _lon_expr("c_custkey").alias("lon"),
    )
    supp = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        _lat_expr("s_suppkey").alias("slat"),
        _lon_expr("s_suppkey").alias("slon"),
    )
    s_cells = supp.select(
        "s_suppkey",
        "slat",
        "slon",
        F.floor((F.col("slat") + 60.0) / _CELL_LAT).alias("cell_lat"),
        F.floor((F.col("slon") + 180.0) / _CELL_LON).alias("cell_lon"),
    )
    probes = (
        cust.select(
            "c_custkey",
            "lat",
            "lon",
            F.floor((F.col("lat") + 60.0) / _CELL_LAT).alias("base_lat"),
            F.floor((F.col("lon") + 180.0) / _CELL_LON).alias("base_lon"),
        )
        .select(
            "*", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dlat")
        )
        .select(
            "*", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dlon")
        )
        .select(
            "c_custkey",
            "lat",
            "lon",
            (F.col("base_lat") + F.col("dlat")).alias("cell_lat"),
            (
                (F.col("base_lon") + F.col("dlon") + _N_LON_CELLS)
                % _N_LON_CELLS
            ).alias("cell_lon"),
        )
    )
    d = haversine_km(F.col("lat"), F.col("lon"), F.col("slat"), F.col("slon"))
    return (
        probes.join(s_cells, ["cell_lat", "cell_lon"])
        .select("c_custkey", "s_suppkey", F.round(d, 3).alias("dist_km"))
        .filter(F.col("dist_km") <= _RADIUS_KM)
    )


def _hub_oracle() -> str:
    d = _HAVERSINE_SQL.format(
        r=_R_KM, lat1="c.lat", lon1="c.lon", lat2="h.lat", lon2="h.lon"
    )
    return f"""
WITH c AS (
    SELECT c_custkey, {_LAT_SQL.format(k='c_custkey')} AS lat,
           {_LON_SQL.format(k='c_custkey')} AS lon
    FROM customer
), h AS (
    SELECT n_nationkey, {_LAT_SQL.format(k='n_nationkey')} AS lat,
           {_LON_SQL.format(k='n_nationkey')} AS lon
    FROM nation
)
SELECT c_custkey, n_nationkey AS hub_nation, ROUND(dk, 3) AS dist_km
FROM (
    SELECT c.c_custkey, h.n_nationkey, {d} AS dk,
           ROW_NUMBER() OVER (
               PARTITION BY c.c_custkey
               ORDER BY ROUND({d}, 6) ASC, h.n_nationkey ASC
           ) AS rn
    FROM c CROSS JOIN h
) WHERE rn = 1
"""


@register("geo_nearest_hub", oracle=_hub_oracle(), tags=("geo",))
def geo_nearest_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-hub assignment: every customer mapped to the closest of
    the 25 nation 'hub' points — the broadcast small-side NN pattern
    (hub table ≪ memory, so the argmin is a broadcast join + per-key
    top-1 window, zero shuffle of the big side beyond the rank). Ranks
    on the ROUNDED distance (6 dp) with hub-id tiebreak so last-ulp
    libm differences cannot flip the argmin at the boundary, same
    discipline as sim_topk_bruteforce."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        _lat_expr("c_custkey").alias("lat"),
        _lon_expr("c_custkey").alias("lon"),
    )
    hubs = load(spark, sf_dir, "nation").select(
        "n_nationkey",
        _lat_expr("n_nationkey").alias("hlat"),
        _lon_expr("n_nationkey").alias("hlon"),
    )
    d = haversine_km(F.col("lat"), F.col("lon"), F.col("hlat"), F.col("hlon"))
    w = Window.partitionBy("c_custkey").orderBy(
        F.asc("d6"), F.asc("n_nationkey")
    )
    return (
        cust.join(F.broadcast(hubs))
        .select(
            "c_custkey",
            "n_nationkey",
            d.alias("dk"),
            F.round(d, 6).alias("d6"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_custkey",
            F.col("n_nationkey").alias("hub_nation"),
            F.round("dk", 3).alias("dist_km"),
        )
    )


#: Region rectangles for the containment join: centered on the nation
#: 'hub' points with deterministic half-extents (3-7° lat, 6-12° lon).
_RLAT_SQL = "3.0 + (n_nationkey % 5)"
_RLON_SQL = "6.0 + ((n_nationkey * 3) % 7)"

#: Longitude wrap to (-180, 180]: containment must hold across the
#: antimeridian, so deltas are compared after modular recentering.
_WRAP_SQL = "((({x}) % 360.0 + 540.0) % 360.0 - 180.0)"


def _pir_oracle() -> str:
    wrap = _WRAP_SQL.format(x="c.lon - r.clon")
    return f"""
WITH c AS (
    SELECT c_custkey, {_LAT_SQL.format(k='c_custkey')} AS lat,
           {_LON_SQL.format(k='c_custkey')} AS lon
    FROM customer
), r AS (
    SELECT n_nationkey, {_LAT_SQL.format(k='n_nationkey')} AS clat,
           {_LON_SQL.format(k='n_nationkey')} AS clon,
           {_RLAT_SQL} AS dlat, {_RLON_SQL} AS dlon
    FROM nation
)
SELECT c.c_custkey,
       MIN(r.n_nationkey) AS region_nation,
       CAST(COUNT(*) AS BIGINT) AS n_regions
FROM c JOIN r
  ON ABS(c.lat - r.clat) <= r.dlat
 AND ABS({wrap}) <= r.dlon
GROUP BY c.c_custkey
"""


@register("geo_point_in_region", oracle=_pir_oracle(), tags=("geo",))
def geo_point_in_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial containment join: each customer point assigned to the
    lowest-id nation rectangle containing it (rectangles overlap; the
    min-id rule is the deterministic tiebreak), plus the count of
    containing regions. Points inside no rectangle are absent — both
    engines agree by construction.

    The plan is the MILLIONS-OF-REGIONS layout, not the 25-region
    shortcut: every region explodes to the grid cells its rectangle
    overlaps (≤ ~16 cells at these extents), points key to their single
    cell, candidates meet in an EQUI-join on the cell id, and the exact
    containment predicate (latitude band + modularly-recentered
    longitude delta, so rectangles straddling the antimeridian still
    contain correctly) filters in codegen. With 25 regions Spark
    broadcasts the exploded side automatically; with millions the same
    plan becomes a shuffle-partitioned equi-join on cell — that
    continuity is why the cell explode is the right shape. Latitude
    cells use a +90 basis here (region rectangles can dip below the
    ±60° point band; indexes stay non-negative)."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        _lat_expr("c_custkey").alias("lat"),
        _lon_expr("c_custkey").alias("lon"),
    )
    points = cust.select(
        "c_custkey",
        "lat",
        "lon",
        F.floor((F.col("lat") + 90.0) / _CELL_LAT).alias("cell_lat"),
        F.floor((F.col("lon") + 180.0) / _CELL_LON).alias("cell_lon"),
    )
    regions = load(spark, sf_dir, "nation").select(
        "n_nationkey",
        _lat_expr("n_nationkey").alias("clat"),
        _lon_expr("n_nationkey").alias("clon"),
        F.expr(_RLAT_SQL).alias("dlat"),
        F.expr(_RLON_SQL).alias("dlon"),
    )
    r_cells = (
        regions.select(
            "*",
            F.explode(
                F.sequence(
                    F.floor((F.col("clat") - F.col("dlat") + 90.0) / _CELL_LAT),
                    F.floor((F.col("clat") + F.col("dlat") + 90.0) / _CELL_LAT),
                )
            ).alias("cell_lat"),
        )
        .select(
            "*",
            F.explode(
                F.sequence(
                    F.floor(
                        (F.col("clon") - F.col("dlon") + 180.0) / _CELL_LON
                    ),
                    F.floor(
                        (F.col("clon") + F.col("dlon") + 180.0) / _CELL_LON
                    ),
                )
            ).alias("raw_lon"),
        )
        .withColumn(
            "cell_lon",
            (F.col("raw_lon") + _N_LON_CELLS) % _N_LON_CELLS,
        )
        .drop("raw_lon")
    )
    wrapped = (F.col("lon") - F.col("clon")) % 360.0
    lon_delta = (wrapped + 540.0) % 360.0 - 180.0
    return (
        points.join(r_cells, ["cell_lat", "cell_lon"])
        .filter(
            (F.abs(F.col("lat") - F.col("clat")) <= F.col("dlat"))
            & (F.abs(lon_delta) <= F.col("dlon"))
        )
        .groupBy("c_custkey")
        .agg(
            F.min("n_nationkey").alias("region_nation"),
            F.count(F.lit(1)).cast("long").alias("n_regions"),
        )
    )
