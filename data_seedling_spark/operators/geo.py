"""Geospatial operators: deterministic point synthesis, grid-cell
blocking, haversine distance, cell-blocked spatial joins and KNN.

The scale pattern is the classic geohash/S2 bucketing one: quantize
every point to an integer grid cell sized to the query radius, expand
the QUERY side to its 3x3 cell neighborhood (a 9x fixed fanout on the
small side only), then equi-join on the cell key so the shuffle is
hash-partitioned and every distance evaluation is confined to points
that can possibly match. At 100 TB the candidate set per query point is
bounded by local density, not table size - the same reason the repo's
IVF family blocks by centroid cell and the n-gram Jaccard join blocks
by prefix token (``operators/dedup.py``).

Engine-portability rules (the driver hash-compares values):

- Point coordinates are synthesized in EXACT integer microdegrees from
  md5 bits (``conv(substr(md5(..),1,8),16,10)`` | DuckDB
  ``CAST('0x' || substr(md5(..),1,8) AS BIGINT)`` - the repo-wide
  idiom, see ``operators/sketch.py:_md5_long``), so cell assignment is
  pure integer arithmetic with zero float hazards.
- Haversine uses libm trig; outputs round to 1e-3 km (meter precision)
  - the same determinism class as the oracle-green ``round(ln(..), 6)``
  pattern used throughout ``queries_llm.py``.

Reference parity: the reference has no spatial operators; this family
is part of the beyond-reference large-scale pipeline surface (brief:
"operations a large-scale training-data pipeline would need" -
geo-bucketed joins are how location-keyed corpora get deduplicated and
cross-referenced).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# One IEEE double multiply by this literal converts degrees to radians
# identically in Spark and DuckDB (both sides use the same correctly
# rounded constant rather than each engine's radians()).
DEG_TO_RAD = 0.017453292519943295
EARTH_RADIUS_KM = 6371.0088  # IUGG mean earth radius

LAT_SPAN_MICRO = 120_000_000  # synthesized latitudes in [-60, 60)
LON_SPAN_MICRO = 360_000_000  # synthesized longitudes in [-180, 180)


def _div(num: Column, den: Column | int) -> Column:
    """Spark's IntegralDivide - exact long arithmetic (same rationale
    as ``relational.zorder_key2``: floor(double /) can disagree with
    integer division near the 2^53 mantissa edge)."""
    den = den if isinstance(den, Column) else F.lit(den)
    return F.call_function("div", num.cast("long"), den.cast("long"))


def md5_u32(col: Column, salt: str) -> Column:
    """Engine-portable uniform 32-bit integer from ``md5(salt || x)``."""
    payload = F.concat(F.lit(salt + ":"), col.cast("string"))
    return F.conv(F.substring(F.md5(payload), 1, 8), 16, 10).cast("long")


def synth_point_micro(id_col: Column, salt: str = "geo") -> tuple[Column, Column]:
    """Deterministic (lat, lon) in integer MICRODEGREES from an id.

    ``u32 * span`` tops out at 2^32 * 3.6e8 < 2^61, inside long range;
    the div by 2^32 floors exactly. Latitude confined to [-60, 60) so
    the equirectangular cell grid never degenerates at the poles.
    """
    lat = _div(md5_u32(id_col, salt + ":lat") * F.lit(LAT_SPAN_MICRO), 1 << 32) - F.lit(
        60_000_000
    )
    lon = _div(md5_u32(id_col, salt + ":lon") * F.lit(LON_SPAN_MICRO), 1 << 32) - F.lit(
        180_000_000
    )
    return lat, lon


def cell_xy(lat_micro: Column, lon_micro: Column, cell_deg: float) -> tuple[Column, Column]:
    """Integer grid cell of a point for a ``cell_deg``-degree grid.

    Offsets make both coordinates non-negative before the exact integer
    divide, so the floor semantics are engine-uniform.
    """
    cell_micro = int(round(cell_deg * 1_000_000))
    cx = _div(lon_micro + F.lit(180_000_000), cell_micro)
    cy = _div(lat_micro + F.lit(90_000_000), cell_micro)
    return cx, cy


def cell_key(cx: Column, cy: Column) -> Column:
    """Single long join key for a cell; 2^20 columns is enough for any
    grid at >= 0.001 degrees."""
    return (cy * F.lit(1 << 20) + cx).cast("long")


def haversine_km(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle distance in km between two points given in DEGREES
    (doubles). Standard haversine; every step mirrors the SQL oracle
    op-for-op so the only divergence source is libm trig ULPs, masked
    by the caller's round()."""
    rad = F.lit(DEG_TO_RAD)
    phi1, phi2 = lat1 * rad, lat2 * rad
    dphi_h = (lat2 - lat1) * rad / F.lit(2.0)
    dlmb_h = (lon2 - lon1) * rad / F.lit(2.0)
    a = (
        F.sin(dphi_h) * F.sin(dphi_h)
        + F.cos(phi1) * F.cos(phi2) * F.sin(dlmb_h) * F.sin(dlmb_h)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The DuckDB twin of :func:`haversine_km`, same op order."""
    r = repr(DEG_TO_RAD)
    return (
        f"(2.0 * {EARTH_RADIUS_KM!r}) * asin(sqrt("
        f"sin((({lat2}) - ({lat1})) * {r} / 2.0) * sin((({lat2}) - ({lat1})) * {r} / 2.0)"
        f" + cos(({lat1}) * {r}) * cos(({lat2}) * {r})"
        f" * sin((({lon2}) - ({lon1})) * {r} / 2.0)"
        f" * sin((({lon2}) - ({lon1})) * {r} / 2.0)))"
    )


def with_point(df: DataFrame, id_col: str, cell_deg: float, salt: str = "geo") -> DataFrame:
    """Attach synthesized integer microdegree coordinates, double
    degree coordinates (exact: integer < 2^53 over exact power-of-ten
    1e6), and the grid cell key."""
    lat_m, lon_m = synth_point_micro(F.col(id_col), salt)
    out = df.withColumns({"lat_micro": lat_m, "lon_micro": lon_m})
    cx, cy = cell_xy(F.col("lat_micro"), F.col("lon_micro"), cell_deg)
    return out.withColumns(
        {
            "lat_deg": F.col("lat_micro") / F.lit(1_000_000.0),
            "lon_deg": F.col("lon_micro") / F.lit(1_000_000.0),
            "cell_x": cx,
            "cell_y": cy,
        }
    )


def expand_neighbors(df: DataFrame, cell_deg: float | None = None) -> DataFrame:
    """Expand each row to its 3x3 cell neighborhood - the bounded 9x
    fanout applied to the QUERY (small) side of a cell-blocked join.
    The probe cell key lands in ``probe_cell``.

    ``cell_deg`` wraps the x probe modulo the longitude cell count
    (``360 / cell_deg``, exact — :func:`lon_cell_count` raises on
    cell sizes that do not divide 360), so neighborhoods straddling the
    antimeridian probe the cells on the other side of lon ±180 - without
    it a query point in the first/last column silently misses
    cross-seam pairs and the blocking is NOT lossless (r8 ADVICE).
    Latitude does not wrap (the grid caps at the poles; off-grid y
    probes hit empty cells, which is correct)."""
    offsets = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    exploded = df.withColumn("_off", F.explode(offsets))
    px = F.col("cell_x") + F.col("_off.dx")
    if cell_deg is not None:
        n_cx = lon_cell_count(cell_deg)
        px = (px + F.lit(n_cx)) % F.lit(n_cx)
    return exploded.withColumn(
        "probe_cell",
        cell_key(px, F.col("cell_y") + F.col("_off.dy")),
    ).drop("_off")


def lon_cell_count(cell_deg: float) -> int:
    """Number of longitude columns in a ``cell_deg`` grid - the wrap
    modulus for antimeridian-correct probing. ``cell_deg`` must divide
    360 exactly: a non-divisor grid leaves a seam-adjacent last column
    NARROWER than cell_deg, so a query point near lon -180 can need
    two columns of westward coverage and the 3x3 probe would miss
    cross-seam candidates - wrap losslessness holds only for divisor
    grids, which this guard enforces (r9 ADVICE)."""
    cell_micro = int(round(cell_deg * 1_000_000))
    # cell_deg < 5e-7 rounds to 0 micro-degrees; without this check the
    # divisor test below would raise ZeroDivisionError instead of the
    # intended contract error (r10 ADVICE).
    if cell_micro <= 0 or LON_SPAN_MICRO % cell_micro != 0:
        raise ValueError(
            f"cell_deg={cell_deg} does not divide 360: the seam-adjacent "
            "column would be narrower than cell_deg and the 3x3 wrap "
            "probe would miss cross-seam pairs; pick a divisor grid "
            "(e.g. 4.0, 2.0, 1.5, 0.5)"
        )
    return LON_SPAN_MICRO // cell_micro


def spatial_join_within(
    queries: DataFrame,
    targets: DataFrame,
    radius_km: float,
    broadcast_queries: bool = True,
    cell_deg: float | None = None,
) -> DataFrame:
    """Cell-blocked radius join: every (query, target) pair with
    haversine distance <= radius_km, provided both sides were prepared
    with :func:`with_point` using a cell size >= the radius in degrees
    at the widest latitude in play (caller's contract - with cell_deg
    chosen so one cell step covers the radius, the 3x3 neighborhood is
    a complete candidate set and the blocking is LOSSLESS, not
    approximate). Pass the SAME ``cell_deg`` given to
    :func:`with_point` to wrap x probes at the antimeridian
    (:func:`expand_neighbors`); without it, pairs straddling lon ±180
    are excluded and losslessness holds only away from the seam.

    Columns from both sides survive with ``q_`` / ``t_`` prefixes plus
    ``dist_km`` (rounded to meter precision). The query side carries
    the 9x fanout and broadcasts when small; the target side - the big
    one at scale - is shuffled once on its cell key, never replicated.
    """
    q = expand_neighbors(queries, cell_deg).select(
        *[F.col(c).alias(f"q_{c}") for c in queries.columns], "probe_cell"
    )
    if broadcast_queries:
        q = F.broadcast(q)
    t = targets.select(
        *[F.col(c).alias(f"t_{c}") for c in targets.columns],
        cell_key(F.col("cell_x"), F.col("cell_y")).alias("t_cell"),
    )
    dist = F.round(
        haversine_km(
            F.col("q_lat_deg"), F.col("q_lon_deg"), F.col("t_lat_deg"), F.col("t_lon_deg")
        ),
        3,
    )
    return (
        q.join(t, F.col("probe_cell") == F.col("t_cell"))
        .withColumn("dist_km", dist)
        .where(F.col("dist_km") <= F.lit(radius_km))
        .drop("probe_cell", "t_cell")
    )
