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


_GI_ORACLE = """
WITH pts AS (
    SELECT ((c_custkey * 7919) % 12000) // 500 AS r,
           ((c_custkey * 104729) % 36000) // 1000 AS c
    FROM customer
), counts AS (
    SELECT r, c, CAST(COUNT(*) AS BIGINT) AS x FROM pts GROUP BY r, c
), grid AS (
    SELECT g1.range AS r, g2.range AS c
    FROM range(0, 24) g1, range(0, 36) g2
), full_grid AS (
    SELECT grid.r, grid.c, COALESCE(counts.x, 0) AS x
    FROM grid LEFT JOIN counts ON grid.r = counts.r AND grid.c = counts.c
), offsets AS (
    SELECT o1.range AS dr, o2.range AS dc
    FROM range(-1, 2) o1, range(-1, 2) o2
), nb AS (
    SELECT f.r + o.dr AS r, (f.c + o.dc + 36) % 36 AS c,
           CAST(SUM(f.x) AS BIGINT) AS s_i,
           CAST(COUNT(*) AS BIGINT) AS n_i
    FROM full_grid f, offsets o
    WHERE f.r + o.dr BETWEEN 0 AND 23
    GROUP BY 1, 2
), stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(SUM(x * x) AS BIGINT) AS sxx
    FROM full_grid
)
SELECT f.r AS cell_row, f.c AS cell_col, f.x AS n_points,
       nb.s_i AS nb_sum, nb.n_i AS n_nb,
       CASE WHEN CAST(st.sxx AS DOUBLE) / st.n
                 - (CAST(st.sx AS DOUBLE) / st.n)
                   * (CAST(st.sx AS DOUBLE) / st.n) = 0 THEN NULL
            ELSE ROUND(
           (CAST(nb.s_i AS DOUBLE)
            - CAST(st.sx AS DOUBLE) / st.n * nb.n_i)
           / (SQRT(CAST(st.sxx AS DOUBLE) / st.n
                   - (CAST(st.sx AS DOUBLE) / st.n)
                     * (CAST(st.sx AS DOUBLE) / st.n))
              * SQRT((CAST(st.n AS DOUBLE) * nb.n_i
                      - CAST(nb.n_i AS DOUBLE) * nb.n_i)
                     / (CAST(st.n AS DOUBLE) - 1.0))),
           4) END AS gi_z
FROM full_grid f
JOIN nb ON f.r = nb.r AND f.c = nb.c
CROSS JOIN stats st
"""


@register("geo_hotspot_gi_star", oracle=_GI_ORACLE, tags=("geo",))
def geo_hotspot_gi_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis–Ord Gi* hotspot detection over the customer point cloud on
    the fixed 24×36 (5°×10°) grid: for every cell, the z-score of its
    3×3-neighborhood count sum against the all-grid distribution — the
    standard local spatial autocorrelation statistic (Getis & Ord 1992;
    what "crime hotspot" and "demand hotspot" maps actually compute).
    Z > ~2 marks a statistically hot neighborhood, not just a full
    cell; the neighborhood sum is what separates a lone dense cell
    from a genuine cluster.

    Exactness: cell assignment is pure INTEGER arithmetic on the same
    key-derived centidegrees the geo family shares (non-negative before
    every `div`/`//`, so truncation agrees cross-engine), counts /
    neighbor sums / ΣX / ΣX² are exact integers over the FIXED 864-cell
    grid (empty cells included — dropping them biases x̄ upward), and
    Gi* exits through one shared double expression, ROUND(4).
    Longitude neighbors wrap at ±180°; latitude rows clip at the ±60°
    band, so edge cells carry n_i < 9 and the variance term accounts
    for it per cell.

    Scale shape: one scan folds points to ≤864 cell rows (map-side
    combine — the ONLY data-sized stage); the 9-offset explode,
    neighbor fold, and z algebra run on the constant-size grid. At
    100 TB this plan is scan-bound, full stop."""
    pts = load(spark, sf_dir, "customer").select(
        F.expr("((c_custkey * 7919) % 12000) div 500").alias("r"),
        F.expr("((c_custkey * 104729) % 36000) div 1000").alias("c"),
    )
    counts = pts.groupBy("r", "c").agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    grid = (
        spark.range(24)
        .select(F.col("id").alias("r"))
        .crossJoin(spark.range(36).select(F.col("id").alias("c")))
    )
    full_grid = grid.join(counts, ["r", "c"], "left").select(
        "r", "c", F.coalesce("x", F.lit(0)).alias("x")
    )
    offsets = (
        spark.range(-1, 2)
        .select(F.col("id").alias("dr"))
        .crossJoin(spark.range(-1, 2).select(F.col("id").alias("dc")))
    )
    nb = (
        full_grid.crossJoin(F.broadcast(offsets))
        .where(F.expr("r + dr BETWEEN 0 AND 23"))
        .groupBy(
            F.expr("r + dr").alias("r"),
            F.expr("(c + dc + 36) % 36").alias("c"),
        )
        .agg(
            F.sum("x").cast("long").alias("s_i"),
            F.count(F.lit(1)).cast("long").alias("n_i"),
        )
    )
    stats = full_grid.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    return (
        full_grid.join(nb, ["r", "c"])
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("r").alias("cell_row"),
            F.col("c").alias("cell_col"),
            F.col("x").alias("n_points"),
            F.col("s_i").alias("nb_sum"),
            F.col("n_i").alias("n_nb"),
            # All-identical cell counts (e.g. an empty customer table →
            # all-zero cells) zero the global variance term: ANSI Spark
            # raises DIVIDE_BY_ZERO where DuckDB NULLs — pin NULL gi_z on
            # both engines. The guard compares the SAME double expression
            # both engines evaluate from identical exact integers (sx,
            # sxx, n), so it trips identically. The per-cell
            # (n·n_i − n_i²) term needs no guard: 0 < n_i ≤ 9 < n = 864.
            F.expr(
                "CASE WHEN CAST(sxx AS DOUBLE) / n"
                " - (CAST(sx AS DOUBLE) / n)"
                " * (CAST(sx AS DOUBLE) / n) = 0 THEN NULL"
                " ELSE ROUND("
                "(CAST(s_i AS DOUBLE)"
                " - CAST(sx AS DOUBLE) / n * n_i)"
                " / (SQRT(CAST(sxx AS DOUBLE) / n"
                "         - (CAST(sx AS DOUBLE) / n)"
                "           * (CAST(sx AS DOUBLE) / n))"
                "    * SQRT((CAST(n AS DOUBLE) * n_i"
                "            - CAST(n_i AS DOUBLE) * n_i)"
                "           / (CAST(n AS DOUBLE) - 1.0)))"
                ", 4) END"
            ).alias("gi_z"),
        )
    )


#: Grid-DBSCAN parameters: 30°×30° cells over the synthetic point field
#: (integer centi-degree grid — the cell assignment is EXACT integer
#: arithmetic, no float boundary anywhere), density threshold MINPTS.
_DBSCAN_CELL = 1000  # centi-degrees
_DBSCAN_MINPTS = 4
_DBSCAN_ORACLE = f"""
WITH RECURSIVE pts AS (
    SELECT ((c_custkey * 7919) % 12000) // {_DBSCAN_CELL} AS cy,
           ((c_custkey * 104729) % 36000) // {_DBSCAN_CELL} AS cx
    FROM customer
), cells AS (
    SELECT cy, cx, CAST(COUNT(*) AS BIGINT) AS c
    FROM pts GROUP BY cy, cx
    HAVING COUNT(*) >= {_DBSCAN_MINPTS}
), ids AS (
    SELECT cy * 1000 + cx AS id, cy, cx, c FROM cells
), edges AS (
    SELECT a.id AS src, b.id AS dst
    FROM ids a JOIN ids b
      ON abs(a.cy - b.cy) <= 1 AND abs(a.cx - b.cx) <= 1
), reach(id, root) AS (
    SELECT id, id FROM ids
    UNION
    SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id
), lab AS (
    SELECT id, MIN(root) AS cluster_id FROM reach GROUP BY id
)
SELECT l.cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(i.c) AS BIGINT) AS n_points
FROM lab l JOIN ids i ON l.id = i.id
GROUP BY l.cluster_id
"""


@register("geo_dbscan_grid", oracle=_DBSCAN_ORACLE, tags=("geo",))
def geo_dbscan_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-density clustering — the distributed DBSCAN surrogate
    (cell-based density + connected components over dense neighboring
    cells, the GriT-DBSCAN / "grid DBSCAN" family): points land in
    integer grid cells, cells with ≥ MINPTS points are CORE, and
    clusters are the 8-neighbor connected components of core cells.
    This is how DBSCAN actually scales out — the classic ε-graph over
    points is quadratic, the grid version is one groupBy plus a
    component fixpoint over the BOUNDED cell graph.

    Exactness: cells come straight from the integer key hash (centi-
    degree div — no float boundary, so no cross-engine cell-edge risk);
    components come from an exact driver-side union-find over the
    BOUNDED core-cell table (≤ 12×36 rows — the kmeans-centroids class
    of sanctioned bounded-artifact collect; a diameter-deep join loop
    was measured 15× slower for zero scale benefit), with min-root
    unions so cluster_id = min cell id exactly as the oracle's
    recursive-reachability MIN(root). At scale the cell grid is the
    ONLY reduced structure — points never pair, and the heavy step is
    the one points→cells groupBy. Planar grid: the
    ±180° longitude seam is deliberately not wrapped (synthetic
    geometry; mirrored in the oracle)."""
    pts = load(spark, sf_dir, "customer").select(
        F.expr(f"((c_custkey * 7919) % 12000) div {_DBSCAN_CELL}").alias(
            "cy"
        ),
        F.expr(f"((c_custkey * 104729) % 36000) div {_DBSCAN_CELL}").alias(
            "cx"
        ),
    )
    ids = (
        pts.groupBy("cy", "cx")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .where(F.col("c") >= _DBSCAN_MINPTS)
        .select(
            (F.col("cy") * 1000 + F.col("cx")).alias("id"), "cy", "cx", "c"
        )
    )
    # The core-cell table is BOUNDED by the 12×36 grid (≤ 432 rows) —
    # a driver-side artifact in the kmeans-centroids class, NOT a data
    # collect: union-find over it is exact, runs in microseconds, and
    # replaces a diameter-deep (≤ 47 round) join loop whose lineage cost
    # dominated at every SF (29.7s → ~2s at sf0.01). The mapping
    # broadcasts back as a literal frame.
    cells = ids.select("id", "cy", "cx").collect()
    parent = {r["id"]: r["id"] for r in cells}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    by_pos = {(r["cy"], r["cx"]): r["id"] for r in cells}
    for r in cells:
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                nb = by_pos.get((r["cy"] + dy, r["cx"] + dx))
                if nb is not None:
                    ra, rb = find(r["id"]), find(nb)
                    if ra != rb:
                        # min-root union keeps cluster_id = min cell id,
                        # matching the oracle's MIN(root) exactly
                        if ra < rb:
                            parent[rb] = ra
                        else:
                            parent[ra] = rb
    mapping = [(cid, find(cid)) for cid in parent]
    labels = spark.createDataFrame(
        mapping, "id bigint, cluster_id bigint"
    )
    return (
        labels.join(ids, "id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("c").cast("long").alias("n_points"),
        )
    )
