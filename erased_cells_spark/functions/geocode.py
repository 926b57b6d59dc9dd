"""Deterministic geocoding of web pages: host → (lon, lat).

All pages of one host share a location (drives hot-cell skew, which the
engine must then tame). Defined over md5 so it is exactly expressible in
BOTH Spark builtins (whole-stage codegen, no Python) and ANSI/DuckDB SQL
for the correctness oracle:

    host = regexp_extract(url, '^https?://([^/]+)', 1)
    lon  = int(md5(host)[0:8], 16)  / 2^32 * 360 - 180
    lat  = int(md5(host)[8:16], 16) / 2^32 * 170 - 85
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

HOST_RE = "^https?://([^/]+)"


def host_of(url: Column) -> Column:
    return F.regexp_extract(url, HOST_RE, 1)


def _hex_slice_to_unit(host: Column, start_1based: int) -> Column:
    # conv() parses hex; result ∈ [0, 2^32) → scale to [0, 1)
    return F.conv(F.substring(F.md5(host), start_1based, 8), 16, 10).cast("double") / F.lit(
        4294967296.0
    )


def geocode_lon(host: Column) -> Column:
    return _hex_slice_to_unit(host, 1) * 360.0 - 180.0


def geocode_lat(host: Column) -> Column:
    return _hex_slice_to_unit(host, 9) * 170.0 - 85.0


# SQL fragments for the DuckDB oracle (same math, same md5).
def sql_host(url_expr: str) -> str:
    return f"regexp_extract({url_expr}, '^https?://([^/]+)', 1)"


def sql_lon(host_expr: str) -> str:
    return (
        f"(('0x' || substr(md5({host_expr}), 1, 8))::BIGINT::DOUBLE / 4294967296.0)"
        " * 360.0 - 180.0"
    )


def sql_lat(host_expr: str) -> str:
    return (
        f"(('0x' || substr(md5({host_expr}), 9, 8))::BIGINT::DOUBLE / 4294967296.0)"
        " * 170.0 - 85.0"
    )


def geocode_np(hosts) -> tuple[np.ndarray, np.ndarray]:
    """numpy/brute-force oracle twin of the Column expressions above."""
    lons = np.empty(len(hosts), dtype=np.float64)
    lats = np.empty(len(hosts), dtype=np.float64)
    cache: dict[str, tuple[float, float]] = {}
    for i, h in enumerate(hosts):
        got = cache.get(h)
        if got is None:
            d = hashlib.md5(h.encode("utf-8")).hexdigest()
            lon = int(d[0:8], 16) / 4294967296.0 * 360.0 - 180.0
            lat = int(d[8:16], 16) / 4294967296.0 * 170.0 - 85.0
            got = cache[h] = (lon, lat)
        lons[i], lats[i] = got
    return lons, lats
