"""General CRS reprojection: ellipsoidal transverse Mercator (UTM) in
engine-shared SQL.

The reference reprojects arbitrary CRS pairs through GeoTools
(GT/transformation/ReprojectFeatureCollection.java:51 delegates to the
referencing module's MathTransform). This engine covers the practically
dominant pair — geographic WGS84 (EPSG:4326) <-> the UTM grid
(EPSG:326xx north / 327xx south) — from scratch, using the public
transverse-Mercator series of Snyder, *Map Projections — A Working Manual*
(USGS PP 1395, 1987), eqs. 8-9..8-25 and 3-21.

**Engine-portable math** (the geo.py trick): sin/cos come from the shared
Horner Taylor kernels, multiple angles (sin 2phi .. sin 8mu) from exact
double-angle recursions, and everything else is IEEE +-*/ and SQRT (which
IEEE 754 requires to be correctly rounded). One SQL text therefore
evaluates bit-identically on Spark and DuckDB, so gate queries and oracles
share it verbatim.

Accuracy: the series are the standard 6-term truncations — sub-mm within a
UTM zone's +-3 degrees of its central meridian; the pytest round-trip bound
is 1e-8 degrees (~1.1 mm).

Scale shape: reprojection is a pure per-row projection — no shuffle, no
UDF, whole-stage codegen over ~40 arithmetic columns; at 10^12 rows it is
scan-bound, exactly what a map transform should be.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

from .geo import _cos_poly, _sin_poly
from .world import dlit

# WGS84 defining constants (public: EPSG:7030 / NIMA TR8350.2)
A_WGS84 = 6378137.0
F_WGS84 = 1.0 / 298.257223563
E2 = F_WGS84 * (2.0 - F_WGS84)           # first eccentricity squared
EP2 = E2 / (1.0 - E2)                     # second eccentricity squared
K0 = 0.9996                               # UTM scale on the central meridian
FE = 500000.0                             # false easting
FN_SOUTH = 10000000.0                     # false northing, southern zones
D2R = 0.017453292519943295

# Meridian-arc series coefficients (Snyder 3-21)
_M0 = 1.0 - E2 / 4.0 - 3.0 * E2**2 / 64.0 - 5.0 * E2**3 / 256.0
_M2 = 3.0 * E2 / 8.0 + 3.0 * E2**2 / 32.0 + 45.0 * E2**3 / 1024.0
_M4 = 15.0 * E2**2 / 256.0 + 45.0 * E2**3 / 1024.0
_M6 = 35.0 * E2**3 / 3072.0

# Footpoint-latitude (rectifying) series coefficients (Snyder 3-26)
_E1 = (1.0 - math.sqrt(1.0 - E2)) / (1.0 + math.sqrt(1.0 - E2))
_J1 = 3.0 * _E1 / 2.0 - 27.0 * _E1**3 / 32.0
_J2 = 21.0 * _E1**2 / 16.0 - 55.0 * _E1**4 / 32.0
_J3 = 151.0 * _E1**3 / 96.0
_J4 = 1097.0 * _E1**4 / 512.0


def _staged(src_sql: str, stages: list[dict[str, str]], final: str) -> str:
    """Nested `SELECT *, expr AS name` stages over ``src_sql`` — the same
    text parses in Spark and DuckDB, and each stage's short column names
    keep generated code well under janino's method limit."""
    q = f"({src_sql})"
    for i, st in enumerate(stages):
        cols = ", ".join(f"{v} AS {k}" for k, v in st.items())
        q = f"(SELECT *, {cols} FROM {q} __s{i})"
    return f"SELECT {final} FROM {q} __fin"


def _double_angles(s: str, c: str, prefix: str) -> dict[str, str]:
    """sin/cos of 2x,4x,6x,8x from sin/cos of x by exact double/sum angles."""
    p = prefix
    return {
        f"{p}s2": f"(2.0 * {s} * {c})",
        f"{p}c2": f"(1.0 - 2.0 * {s} * {s})",
    }


def _quad_angles(prefix: str) -> dict[str, str]:
    p = prefix
    return {
        f"{p}s4": f"(2.0 * {p}s2 * {p}c2)",
        f"{p}c4": f"(1.0 - 2.0 * {p}s2 * {p}s2)",
    }


def _high_angles(prefix: str) -> dict[str, str]:
    p = prefix
    return {
        f"{p}s6": f"({p}s4 * {p}c2 + {p}c4 * {p}s2)",
        f"{p}s8": f"(2.0 * {p}s4 * {p}c4)",
    }


def tm_forward_stages() -> list[dict[str, str]]:
    """Stages computing (easting, northing) from columns
    (lat, lon, lon0, fn) in degrees / metres. Snyder eqs. 8-9..8-14."""
    return [
        {
            "phi": f"(lat * {dlit(D2R)})",
            "lamd": f"((lon - lon0) * {dlit(D2R)})",
        },
        {"sphi": _sin_poly("phi"), "cphi": _cos_poly("phi")},
        _double_angles("sphi", "cphi", "f"),
        _quad_angles("f"),
        _high_angles("f"),
        {
            "tphi": "(sphi / cphi)",
            "esin2": f"({dlit(E2)} * sphi * sphi)",
            "aa": "(lamd * cphi)",
            "mm": (
                f"({dlit(A_WGS84)} * ({dlit(_M0)} * phi - {dlit(_M2)} * fs2 "
                f"+ {dlit(_M4)} * fs4 - {dlit(_M6)} * fs6))"
            ),
        },
        {
            "tt": "(tphi * tphi)",
            "cc": f"({dlit(EP2)} * cphi * cphi)",
            "nu": f"({dlit(A_WGS84)} / SQRT(1.0 - esin2))",
            "aa2": "(aa * aa)",
        },
        {
            "easting": (
                f"({dlit(FE)} + {dlit(K0)} * nu * aa * (1.0 + aa2 * "
                f"((1.0 - tt + cc) / 6.0 + aa2 * "
                f"(5.0 - 18.0 * tt + tt * tt + 72.0 * cc "
                f"- 58.0 * {dlit(EP2)}) / 120.0)))"
            ),
            "northing": (
                f"(fn + {dlit(K0)} * (mm + nu * tphi * aa2 * (0.5 + aa2 * "
                f"((5.0 - tt + 9.0 * cc + 4.0 * cc * cc) / 24.0 + aa2 * "
                f"(61.0 - 58.0 * tt + tt * tt + 600.0 * cc "
                f"- 330.0 * {dlit(EP2)}) / 720.0))))"
            ),
        },
    ]


def tm_inverse_stages() -> list[dict[str, str]]:
    """Stages computing (lat, lon) degrees from columns
    (easting, northing, lon0, fn). Snyder eqs. 8-17..8-25, 3-26."""
    return [
        {
            "mi": f"((northing - fn) / {dlit(K0)})",
        },
        {"mu": f"(mi / {dlit(A_WGS84 * _M0)})"},
        {"smu": _sin_poly("mu"), "cmu": _cos_poly("mu")},
        _double_angles("smu", "cmu", "i"),
        _quad_angles("i"),
        _high_angles("i"),
        {
            "phi1": (
                f"(mu + {dlit(_J1)} * is2 + {dlit(_J2)} * is4 "
                f"+ {dlit(_J3)} * is6 + {dlit(_J4)} * is8)"
            ),
        },
        {"sp1": _sin_poly("phi1"), "cp1": _cos_poly("phi1")},
        {
            "t1": "((sp1 / cp1) * (sp1 / cp1))",
            "c1": f"({dlit(EP2)} * cp1 * cp1)",
            "w1": f"(1.0 - {dlit(E2)} * sp1 * sp1)",
        },
        {
            "n1": f"({dlit(A_WGS84)} / SQRT(w1))",
            "r1": f"({dlit(A_WGS84 * (1.0 - E2))} / (w1 * SQRT(w1)))",
        },
        {"dd": f"((easting - {dlit(FE)}) / (n1 * {dlit(K0)}))"},
        {"dd2": "(dd * dd)"},
        {
            "lat": (
                f"((phi1 - (n1 * (sp1 / cp1) / r1) * dd2 * (0.5 - dd2 * "
                f"((5.0 + 3.0 * t1 + 10.0 * c1 - 4.0 * c1 * c1 "
                f"- 9.0 * {dlit(EP2)}) / 24.0 - dd2 * "
                f"(61.0 + 90.0 * t1 + 298.0 * c1 + 45.0 * t1 * t1 "
                f"- 252.0 * {dlit(EP2)} - 3.0 * c1 * c1) / 720.0))) "
                f"/ {dlit(D2R)})"
            ),
            "lon": (
                f"(lon0 + (dd * (1.0 - dd2 * ((1.0 + 2.0 * t1 + c1) / 6.0 "
                f"- dd2 * (5.0 - 2.0 * c1 + 28.0 * t1 - 3.0 * c1 * c1 "
                f"+ 8.0 * {dlit(EP2)} + 24.0 * t1 * t1) / 120.0))) "
                f"/ cp1 / {dlit(D2R)})"
            ),
        },
    ]


# ---------------------------------------------------------------------------
# Web Mercator (EPSG:3857) — spherical, closed form both directions
# ---------------------------------------------------------------------------

R_MERC = 6378137.0  # EPSG:3857 sphere radius (= WGS84 semi-major)


def merc_forward_stages() -> list[dict[str, str]]:
    """(mx, my) metres from (lon, lat) degrees. x is a single exact
    multiplication; y uses the atanh form R/2 * ln((1+sin)/(1-sin)) with
    native SIN — y is already engine-libm through LN, which the gate
    absorbs with quantization bands, so a polynomial sine would buy no
    parity while its ~1e-13 error is amplified by R/(1-sin^2) ~ 2e8 near
    the poles (1e-4 m at lat 79); native trig keeps y accurate to ~1e-8 m
    at every latitude."""
    return [
        {"phim": f"(lat * {dlit(D2R)})"},
        {"sm": "SIN(phim)"},
        {
            "mx": f"(lon * {dlit(D2R * R_MERC)})",
            "my": f"({dlit(0.5 * R_MERC)} * LN((1.0 + sm) / (1.0 - sm)))",
        },
    ]


def merc_inverse_stages() -> list[dict[str, str]]:
    """(lon, lat) degrees from (mx, my) metres: the Gudermannian
    lat = 2*atan(exp(y/R)) - pi/2."""
    return [
        {
            "lon": f"(mx / {dlit(D2R * R_MERC)})",
            "lat": (
                f"((2.0 * ATAN(EXP(my / {dlit(R_MERC)})) "
                f"- {dlit(math.pi / 2.0)}) / {dlit(D2R)})"
            ),
        },
    ]


# ---------------------------------------------------------------------------
# EPSG registry + DataFrame API
# ---------------------------------------------------------------------------


def _utm_zone(epsg: int) -> tuple[float, float]:
    """EPSG 326xx/327xx -> (central meridian degrees, false northing)."""
    if 32601 <= epsg <= 32660:
        return ((epsg - 32600) - 1) * 6.0 - 180.0 + 3.0, 0.0
    if 32701 <= epsg <= 32760:
        return ((epsg - 32700) - 1) * 6.0 - 180.0 + 3.0, FN_SOUTH
    raise ValueError(f"EPSG:{epsg} is not a supported UTM zone")


def _src_cols_sql(df: DataFrame) -> str:
    cols = ", ".join(f"`{c}`" for c in df.columns)
    return cols


def _is_utm(epsg: int) -> bool:
    return 32601 <= epsg <= 32660 or 32701 <= epsg <= 32760


def _conic_registry():
    """code -> (forward stages fn, inverse stages fn, (x, y) stage names).

    5070 is the CONUS Albers graticule (spherical form, see the AEA block);
    102004 the CONUS Lambert conformal conic (ESRI code, Snyder §15)."""
    return {
        5070: (aea_forward_stages, aea_inverse_stages, ("ax", "ay")),
        102004: (lcc_forward_stages, lcc_inverse_stages, ("lx", "ly")),
    }


def reproject(
    df: DataFrame, from_epsg: int, to_epsg: int, x: str = "x", y: str = "y"
) -> DataFrame:
    """Reproject columns (x, y) of ``df`` from ``from_epsg`` to ``to_epsg``.

    Registry (parity surface for ReprojectFeatureCollection.java:51):
    geographic WGS84 (4326), Web Mercator (3857), any UTM zone
    (326xx/327xx), CONUS Albers (5070), CONUS Lambert conformal conic
    (ESRI:102004). A pair with 4326 on one side is a single staged
    projection; any other pair COMPOSES through WGS84 (inverse then
    forward — two chained whole-stage-codegen projections, still zero
    shuffle / zero UDF). For 4326 the x column is longitude, y latitude;
    for projected systems, metres. Unknown codes raise ValueError — the
    registry is deliberately explicit, not a silent passthrough.
    """
    if from_epsg == to_epsg:
        return df
    known = {4326, 3857, *_conic_registry()}

    def _check(e: int) -> None:
        if e not in known and not _is_utm(e):
            raise ValueError(
                f"unsupported CRS EPSG:{e}; registry: 4326, 3857, UTM "
                "326xx/327xx, 5070 (Albers), 102004 (LCC)"
            )

    _check(from_epsg)
    _check(to_epsg)
    if from_epsg != 4326 and to_epsg != 4326:
        # compose through geographic — the standard hub-and-spoke registry
        return reproject(
            reproject(df, from_epsg, 4326, x, y), 4326, to_epsg, x, y
        )
    spark = df.sparkSession
    df.createOrReplaceTempView("_reproj_src")
    keep = [c for c in df.columns if c not in (x, y)]
    keep_sql = (", ".join(f"`{c}`" for c in keep) + ", ") if keep else ""
    conics = _conic_registry()
    if from_epsg == 4326 and to_epsg == 3857:
        src = f"SELECT {keep_sql}`{x}` AS lon, `{y}` AS lat FROM _reproj_src"
        final = f"{keep_sql}mx AS `{x}`, my AS `{y}`"
        return spark.sql(_staged(src, merc_forward_stages(), final))
    if from_epsg == 3857 and to_epsg == 4326:
        src = f"SELECT {keep_sql}`{x}` AS mx, `{y}` AS my FROM _reproj_src"
        final = f"{keep_sql}lon AS `{x}`, lat AS `{y}`"
        return spark.sql(_staged(src, merc_inverse_stages(), final))
    if from_epsg == 4326 and to_epsg in conics:
        fwd, _, (cx, cy) = conics[to_epsg]
        src = f"SELECT {keep_sql}`{x}` AS lon, `{y}` AS lat FROM _reproj_src"
        final = f"{keep_sql}{cx} AS `{x}`, {cy} AS `{y}`"
        return spark.sql(_staged(src, fwd(), final))
    if to_epsg == 4326 and from_epsg in conics:
        _, inv, (cx, cy) = conics[from_epsg]
        src = f"SELECT {keep_sql}`{x}` AS {cx}, `{y}` AS {cy} FROM _reproj_src"
        final = f"{keep_sql}lon AS `{x}`, lat AS `{y}`"
        return spark.sql(_staged(src, inv(), final))
    if from_epsg == 4326:
        lon0, fn = _utm_zone(to_epsg)
        src = (
            f"SELECT {keep_sql}`{x}` AS lon, `{y}` AS lat, "
            f"{dlit(lon0)} AS lon0, {dlit(fn)} AS fn FROM _reproj_src"
        )
        final = f"{keep_sql}easting AS `{x}`, northing AS `{y}`"
        return spark.sql(_staged(src, tm_forward_stages(), final))
    lon0, fn = _utm_zone(from_epsg)
    src = (
        f"SELECT {keep_sql}`{x}` AS easting, `{y}` AS northing, "
        f"{dlit(lon0)} AS lon0, {dlit(fn)} AS fn FROM _reproj_src"
    )
    final = f"{keep_sql}lon AS `{x}`, lat AS `{y}`"
    return spark.sql(_staged(src, tm_inverse_stages(), final))


# ---------------------------------------------------------------------------
# Gate queries (shared SQL text — the oracle IS the same string over the
# same lon/lat reading of the layer)
# ---------------------------------------------------------------------------


def _geo_src_sql(layer_sql: str) -> str:
    """Per-point UTM zone from longitude; hemisphere from latitude sign —
    how a real global pipeline projects worldwide data."""
    from .geo import LAT_SQL, LON_SQL

    return f"""
SELECT pid, lon, lat,
       (CAST(FLOOR((lon + 180.0) / 6.0) AS BIGINT) * 6.0 - 180.0 + 3.0) AS lon0,
       (CASE WHEN lat < 0.0 THEN {dlit(FN_SOUTH)} ELSE 0.0 END) AS fn,
       CAST(FLOOR((lon + 180.0) / 6.0) AS INT) + 1 AS zone
FROM (SELECT pid, {LON_SQL} AS lon, {LAT_SQL} AS lat FROM ({layer_sql}) __w) __g
"""


def utm_forward_sql(layer_sql: str) -> str:
    """(pid, zone, easting mm-rounded, northing mm-rounded)."""
    return _staged(
        _geo_src_sql(layer_sql),
        tm_forward_stages(),
        "pid, zone, ROUND(easting, 3) AS easting, ROUND(northing, 3) AS northing",
    )


def merc_roundtrip_sql(layer_sql: str) -> str:
    """Web Mercator forward + inverse over the part-point layer. Emits
    per point: mm-quantized x (pure multiplication — bit-exact parity),
    km-band y (absorbs the engines' sub-ulp LN difference: a flip would
    need my within ~4e-9 m of a km boundary), and rt_ok — the round-trip
    recovered lon/lat within 1e-9 deg (actual error ~1e-14, margin 1e5)."""
    fwd = _staged(
        f"SELECT pid, {_LON_LAT_SRC(layer_sql)}",
        merc_forward_stages(),
        "pid, lon AS lon_src, lat AS lat_src, mx, my",
    )
    return _staged(
        fwd,
        merc_inverse_stages(),
        "pid, CAST(FLOOR(mx * 1000.0 + 0.5) AS BIGINT) AS x_mm, "
        "CAST(FLOOR(my / 1000.0) AS BIGINT) AS y_km, "
        "(ABS(lon - lon_src) < 0.000000001 AND "
        "ABS(lat - lat_src) < 0.000000001) AS rt_ok",
    )


def _LON_LAT_SRC(layer_sql: str) -> str:
    from .geo import LAT_SQL, LON_SQL

    return (
        f"{LON_SQL} AS lon, {LAT_SQL} AS lat "
        f"FROM ({layer_sql}) __w"
    )


def utm_roundtrip_sql(layer_sql: str) -> str:
    """Project every point to its own UTM zone and back; emit the original
    coordinates (1e-6-deg display quantization) plus a boolean round-trip
    check |recovered - source| < 1e-7 deg (~1.1 cm). A threshold compare is
    the stable contract: the series error is <= ~1e-8 deg even at lat 80°,
    a 10x margin, whereas rounding BOTH sides flips whenever the error
    straddles a quantization boundary (observed at lat 77.75°)."""
    fwd = _staged(
        _geo_src_sql(layer_sql),
        tm_forward_stages(),
        "pid, zone, lon0, fn, lon AS lon_src, lat AS lat_src, easting, northing",
    )
    return _staged(
        fwd,
        tm_inverse_stages(),
        "pid, zone, ROUND(lon_src, 6) AS lon1, ROUND(lat_src, 6) AS lat1, "
        "(ABS(lon - lon_src) < 0.0000001 AND ABS(lat - lat_src) < 0.0000001) "
        "AS rt_ok",
    )


# ---------------------------------------------------------------------------
# Albers equal-area conic (spherical form; Snyder PP 1395 eqs. 14-1..14-11)
# ---------------------------------------------------------------------------

# CONUS Albers parameters (the EPSG:5070 graticule: standard parallels
# 29.5/45.5, origin 23N 96W) on the authalic sphere — the spherical form of
# the projection; the reference's ellipsoidal 5070 differs by < 0.3% in
# rho, irrelevant to the engine contract (equal-area property + round-trip
# hold exactly in either form).
AEA_PHI1 = 29.5
AEA_PHI2 = 45.5
AEA_PHI0 = 23.0
AEA_LON0 = -96.0
R_AEA = 6370997.0  # Snyder's authalic sphere radius

_AEA_N = (math.sin(math.radians(AEA_PHI1)) + math.sin(math.radians(AEA_PHI2))) / 2.0
_AEA_C = math.cos(math.radians(AEA_PHI1)) ** 2 + 2.0 * _AEA_N * math.sin(
    math.radians(AEA_PHI1)
)
_AEA_RHO0 = R_AEA * math.sqrt(
    _AEA_C - 2.0 * _AEA_N * math.sin(math.radians(AEA_PHI0))
) / _AEA_N


def aea_forward_stages() -> list[dict[str, str]]:
    """(ax, ay) metres from (lon, lat) degrees: rho = R*sqrt(C - 2n sin
    phi)/n, theta = n(lambda - lambda0); x = rho sin theta, y = rho0 -
    rho cos theta. Cone constants are Python-computed literals; the
    data-dependent trig is native SIN/COS (the merc_forward rationale:
    banded gate columns absorb sub-ulp engine differences)."""
    return [
        {"sphi": f"SIN(lat * {dlit(D2R)})"},
        {"tha": f"({dlit(_AEA_N * D2R)} * (lon - {dlit(AEA_LON0)}))"},
        {"rho": (
            f"({dlit(R_AEA)} * SQRT({dlit(_AEA_C)} - {dlit(2.0 * _AEA_N)}"
            f" * sphi) / {dlit(_AEA_N)})"
        )},
        {
            "ax": "(rho * SIN(tha))",
            "ay": f"({dlit(_AEA_RHO0)} - rho * COS(tha))",
        },
    ]


def aea_inverse_stages() -> list[dict[str, str]]:
    """(lon, lat) back from (ax, ay): rho = hypot(x, rho0 - y), theta =
    atan2(x, rho0 - y), lat = asin((C - (rho n / R)^2) / 2n)."""
    return [
        {"dy": f"({dlit(_AEA_RHO0)} - ay)"},
        {"rhoi": "SQRT(ax * ax + dy * dy)"},
        {"rn": f"(rhoi * {dlit(_AEA_N / R_AEA)})"},
        {
            "lon": f"({dlit(AEA_LON0)} + ATAN2(ax, dy) / {dlit(_AEA_N * D2R)})",
            "lat": (
                f"(ASIN(({dlit(_AEA_C)} - rn * rn) / {dlit(2.0 * _AEA_N)})"
                f" / {dlit(D2R)})"
            ),
        },
    ]


# ---------------------------------------------------------------------------
# Lambert conformal conic (spherical form; Snyder PP 1395 eqs. 15-1..15-5)
# ---------------------------------------------------------------------------

# CONUS LCC parameters (the ESRI:102004 graticule: standard parallels
# 33/45, origin 39N 96W) on the authalic sphere — same spherical-form
# choice (and rationale) as the Albers block above: the conformal property
# and the round-trip identity hold exactly in either form.
LCC_PHI1 = 33.0
LCC_PHI2 = 45.0
LCC_PHI0 = 39.0
LCC_LON0 = -96.0
R_LCC = R_AEA

_LCC_N = math.log(
    math.cos(math.radians(LCC_PHI1)) / math.cos(math.radians(LCC_PHI2))
) / math.log(
    math.tan(math.pi / 4.0 + math.radians(LCC_PHI2) / 2.0)
    / math.tan(math.pi / 4.0 + math.radians(LCC_PHI1) / 2.0)
)
_LCC_F = (
    math.cos(math.radians(LCC_PHI1))
    * math.tan(math.pi / 4.0 + math.radians(LCC_PHI1) / 2.0) ** _LCC_N
    / _LCC_N
)
_LCC_RHO0 = R_LCC * _LCC_F / math.tan(
    math.pi / 4.0 + math.radians(LCC_PHI0) / 2.0
) ** _LCC_N


def lcc_forward_stages() -> list[dict[str, str]]:
    """(lx, ly) metres from (lon, lat) degrees: rho = R F / tan^n(pi/4 +
    phi/2), theta = n (lambda - lambda0); x = rho sin theta, y = rho0 -
    rho cos theta (Snyder 15-1..15-4). Cone constants are Python-computed
    literals; data-dependent trig is native TAN/SIN/COS (banded gate
    columns absorb sub-ulp engine differences — the Albers rationale)."""
    return [
        {"tphi": f"TAN({dlit(math.pi / 4.0)} + lat * {dlit(D2R / 2.0)})"},
        {"thl": f"({dlit(_LCC_N * D2R)} * (lon - {dlit(LCC_LON0)}))"},
        {"rhol": f"({dlit(R_LCC * _LCC_F)} / POWER(tphi, {dlit(_LCC_N)}))"},
        {
            "lx": "(rhol * SIN(thl))",
            "ly": f"({dlit(_LCC_RHO0)} - rhol * COS(thl))",
        },
    ]


def lcc_inverse_stages() -> list[dict[str, str]]:
    """(lon, lat) back from (lx, ly): rho = hypot(x, rho0 - y), theta =
    atan2(x, rho0 - y), lat = 2 atan((R F / rho)^(1/n)) - pi/2
    (Snyder 15-5; n > 0 for the northern-parallel CONUS cone)."""
    return [
        {"dyl": f"({dlit(_LCC_RHO0)} - ly)"},
        {"rhli": "SQRT(lx * lx + dyl * dyl)"},
        {
            "lon": f"({dlit(LCC_LON0)} + ATAN2(lx, dyl) / {dlit(_LCC_N * D2R)})",
            "lat": (
                f"((2.0 * ATAN(POWER({dlit(R_LCC * _LCC_F)} / rhli, "
                f"{dlit(1.0 / _LCC_N)})) - {dlit(math.pi / 2.0)}) / {dlit(D2R)})"
            ),
        },
    ]


def lcc_roundtrip_sql(layer_sql: str) -> str:
    """LCC forward + inverse per point. Gate columns: metre-banded
    easting/northing + rt_ok booleans at 1e-9 deg (same contract and
    margin rationale as aea_roundtrip_sql)."""
    fwd = _staged(
        f"SELECT pid, {_LON_LAT_SRC(layer_sql)}",
        lcc_forward_stages(),
        "pid, lon AS lon_src, lat AS lat_src, lx, ly",
    )
    return _staged(
        fwd,
        lcc_inverse_stages(),
        "pid, CAST(FLOOR(lx) AS BIGINT) AS x_m, "
        "CAST(FLOOR(ly) AS BIGINT) AS y_m, "
        "(ABS(lon - lon_src) < 0.000000001 AND "
        "ABS(lat - lat_src) < 0.000000001) AS rt_ok",
    )


def utm_to_lcc_sql(layer_sql: str) -> str:
    """CROSS-FAMILY composition: lon/lat -> per-point UTM zone (ellipsoidal
    transverse Mercator forward), back to geographic (TM inverse), then
    into the CONUS LCC cone (forward) — the registry's compose-through-
    WGS84 path as ONE shared SQL text. Gate columns: metre-banded LCC
    coordinates plus rt_ok asserting the geographic mid-stage recovered
    the source within 1e-7 deg (the UTM series bound; LCC adds only
    sub-ulp trig on top)."""
    fwd = _staged(
        _geo_src_sql(layer_sql),
        tm_forward_stages(),
        "pid, zone, lon0, fn, lon AS lon_src, lat AS lat_src, easting, northing",
    )
    inv = _staged(
        fwd,
        tm_inverse_stages(),
        "pid, zone, lon_src, lat_src, lon, lat",
    )
    return _staged(
        inv,
        lcc_forward_stages(),
        "pid, zone, CAST(FLOOR(lx) AS BIGINT) AS x_m, "
        "CAST(FLOOR(ly) AS BIGINT) AS y_m, "
        "(ABS(lon - lon_src) < 0.0000001 AND "
        "ABS(lat - lat_src) < 0.0000001) AS rt_ok",
    )


def aea_roundtrip_sql(layer_sql: str) -> str:
    """Albers forward + inverse per point. Gate columns: metre-banded
    easting/northing (sub-ulp trig differences are ~1e-9 m — a band flip
    needs a value that close to a metre boundary) and rt_ok booleans at
    1e-9 deg (measured round-trip error ~1e-12 deg, margin 1e3)."""
    fwd = _staged(
        f"SELECT pid, {_LON_LAT_SRC(layer_sql)}",
        aea_forward_stages(),
        "pid, lon AS lon_src, lat AS lat_src, ax, ay",
    )
    return _staged(
        fwd,
        aea_inverse_stages(),
        "pid, CAST(FLOOR(ax) AS BIGINT) AS x_m, "
        "CAST(FLOOR(ay) AS BIGINT) AS y_m, "
        "(ABS(lon - lon_src) < 0.000000001 AND "
        "ABS(lat - lat_src) < 0.000000001) AS rt_ok",
    )
