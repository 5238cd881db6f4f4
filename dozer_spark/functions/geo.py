"""Geo functions: POINT(x, y) and DISTANCE(p1, p2[, algorithm]).

Reference: dozer-sql/expression/src/geo/{common.rs:11-14, point.rs,
distance.rs:18-37,94-96}. Points are (x=lon, y=lat) pairs of doubles
(dozer-types/src/types/mod.rs:467); DISTANCE supports
GEODESIC (default) | HAVERSINE | VINCENTY, returning meters.

Spark-first design:
- POINT -> StructType{x,y} column (native).
- HAVERSINE -> pure Column arithmetic (whole-stage codegen, no UDF).
- VINCENTY / GEODESIC -> Arrow-batched pandas UDF with a vectorized
  numpy Vincenty iteration (geodesic ~ Vincenty on the WGS-84 ellipsoid;
  difference < 1mm except near-antipodal points).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

EARTH_RADIUS_M = 6_371_000.0  # mean radius used by the haversine path
WGS84_A = 6_378_137.0
WGS84_F = 1.0 / 298.257223563
WGS84_B = WGS84_A * (1.0 - WGS84_F)


def point(x, y) -> Column:
    """POINT(x, y) — geo/point.rs. x/y are doubles (lon/lat)."""
    x = x if isinstance(x, Column) else F.lit(x)
    y = y if isinstance(y, Column) else F.lit(y)
    return F.struct(
        x.cast("double").alias("x"),
        y.cast("double").alias("y"),
    )


def haversine_m(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in meters, native Column math (no UDF).

    Mirrors geo/distance.rs HAVERSINE (geo crate HaversineDistance).
    """
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlon / 2), 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def _vincenty_np(lon1, lat1, lon2, lat2, max_iter=200, tol=1e-12):
    """Vectorized Vincenty inverse on WGS-84 (meters)."""
    lon1, lat1 = np.radians(np.asarray(lon1, float)), np.radians(np.asarray(lat1, float))
    lon2, lat2 = np.radians(np.asarray(lon2, float)), np.radians(np.asarray(lat2, float))
    U1 = np.arctan((1 - WGS84_F) * np.tan(lat1))
    U2 = np.arctan((1 - WGS84_F) * np.tan(lat2))
    L = lon2 - lon1
    lam = L.copy()
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sinU2, cosU2 = np.sin(U2), np.cos(U2)
    sig = np.zeros_like(lam)
    sin_sig = np.zeros_like(lam)
    cos_sig = np.ones_like(lam)
    cos_sq_alpha = np.ones_like(lam)
    cos2sigm = np.zeros_like(lam)
    for _ in range(max_iter):
        sin_lam, cos_lam = np.sin(lam), np.cos(lam)
        sin_sig = np.sqrt(
            (cosU2 * sin_lam) ** 2 + (cosU1 * sinU2 - sinU1 * cosU2 * cos_lam) ** 2
        )
        cos_sig = sinU1 * sinU2 + cosU1 * cosU2 * cos_lam
        sig = np.arctan2(sin_sig, cos_sig)
        with np.errstate(divide="ignore", invalid="ignore"):
            sin_alpha = np.where(sin_sig != 0, cosU1 * cosU2 * sin_lam / sin_sig, 0.0)
        cos_sq_alpha = 1.0 - sin_alpha**2
        with np.errstate(divide="ignore", invalid="ignore"):
            cos2sigm = np.where(
                cos_sq_alpha != 0, cos_sig - 2.0 * sinU1 * sinU2 / cos_sq_alpha, 0.0
            )
        C = WGS84_F / 16.0 * cos_sq_alpha * (4.0 + WGS84_F * (4.0 - 3.0 * cos_sq_alpha))
        lam_new = L + (1.0 - C) * WGS84_F * sin_alpha * (
            sig + C * sin_sig * (cos2sigm + C * cos_sig * (-1.0 + 2.0 * cos2sigm**2))
        )
        if np.all(np.abs(lam_new - lam) < tol):
            lam = lam_new
            break
        lam = lam_new
    u_sq = cos_sq_alpha * (WGS84_A**2 - WGS84_B**2) / WGS84_B**2
    A = 1.0 + u_sq / 16384.0 * (4096.0 + u_sq * (-768.0 + u_sq * (320.0 - 175.0 * u_sq)))
    B = u_sq / 1024.0 * (256.0 + u_sq * (-128.0 + u_sq * (74.0 - 47.0 * u_sq)))
    dsig = (
        B
        * sin_sig
        * (
            cos2sigm
            + B
            / 4.0
            * (
                cos_sig * (-1.0 + 2.0 * cos2sigm**2)
                - B
                / 6.0
                * cos2sigm
                * (-3.0 + 4.0 * sin_sig**2)
                * (-3.0 + 4.0 * cos2sigm**2)
            )
        )
    )
    dist = WGS84_B * A * (sig - dsig)
    return np.where(sin_sig == 0, 0.0, dist)


# returnType as a DataType object (not a DDL string) so the UDF can be
# defined at import time without an active SparkSession.
@pandas_udf(DoubleType())
def _vincenty_udf(lon1: pd.Series, lat1: pd.Series, lon2: pd.Series, lat2: pd.Series) -> pd.Series:
    return pd.Series(_vincenty_np(lon1.values, lat1.values, lon2.values, lat2.values))


def distance(p1: Column, p2: Column, algorithm: str = "GEODESIC") -> Column:
    """DISTANCE(p1, p2[, algo]) — geo/distance.rs:18-37; default GEODESIC
    (distance.rs:94-96). Points are {x: lon, y: lat} structs; meters out.
    """
    algo = algorithm.upper()
    if algo == "HAVERSINE":
        return haversine_m(p1["x"], p1["y"], p2["x"], p2["y"])
    if algo in ("GEODESIC", "VINCENTY"):
        # geodesic(Karney) ~ vincenty on WGS-84; vectorized pandas UDF path
        return _vincenty_udf(
            p1["x"].cast("double"),
            p1["y"].cast("double"),
            p2["x"].cast("double"),
            p2["y"].cast("double"),
        )
    raise ValueError(f"unknown DISTANCE algorithm {algorithm!r}")
