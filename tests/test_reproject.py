"""CRS reprojection (transverse Mercator / UTM) invariants.

Cross-validation strategy: the engine uses the Snyder PP-1395 series in
engine-shared SQL; the test reimplements UTM independently with the KRUGER
series (different derivation, different code path, stdlib math) — two
independent formulations agreeing to sub-mm is strong evidence both are
right. Plus the exact anchors (equator/central-meridian) and the 1e-8-deg
round-trip bound the gate query contracts."""

from __future__ import annotations

import math

from opengxt_spark import reproject as rp
from opengxt_spark import world


def _kruger_fwd(lat: float, lon: float, lon0: float) -> tuple[float, float]:
    """Independent UTM forward: Kruger series (Karney 2011, public)."""
    a, f, k0, fe = 6378137.0, 1 / 298.257223563, 0.9996, 500000.0
    e = math.sqrt(f * (2 - f))
    n = f / (2 - f)
    big_a = a / (1 + n) * (1 + n**2 / 4 + n**4 / 64)
    al = [n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16,
          13 * n**2 / 48 - 3 * n**3 / 5,
          61 * n**3 / 240]
    phi = math.radians(lat)
    lam = math.radians(lon - lon0)
    t = math.sinh(math.atanh(math.sin(phi)) - e * math.atanh(e * math.sin(phi)))
    xip = math.atan2(t, math.cos(lam))
    etap = math.asinh(math.sin(lam) / math.hypot(t, math.cos(lam)))
    xi = xip + sum(al[j] * math.sin(2 * (j + 1) * xip)
                   * math.cosh(2 * (j + 1) * etap) for j in range(3))
    eta = etap + sum(al[j] * math.cos(2 * (j + 1) * xip)
                     * math.sinh(2 * (j + 1) * etap) for j in range(3))
    return fe + k0 * big_a * eta, k0 * big_a * xi


def test_forward_matches_independent_kruger(spark):
    pts = [(-73.5, 40.5, -75.0), (3.2, 0.01, 3.0), (151.2, -33.8, 153.0),
           (-0.1, 78.9, -3.0), (177.0, -79.5, 177.0)]
    vals = " UNION ALL ".join(
        f"SELECT {i} AS pid, CAST({lo} AS DOUBLE) AS lon, "
        f"CAST({la} AS DOUBLE) AS lat, CAST({l0} AS DOUBLE) AS lon0, "
        f"CAST(0.0 AS DOUBLE) AS fn"
        for i, (lo, la, l0) in enumerate(pts)
    )
    rows = spark.sql(
        rp._staged(vals, rp.tm_forward_stages(), "pid, easting, northing")
    ).collect()
    for r in sorted(rows, key=lambda r: r.pid):
        lo, la, l0 = pts[r.pid]
        e_ref, n_ref = _kruger_fwd(la, lo, l0)
        assert abs(r.easting - e_ref) < 1e-3, (r.pid, r.easting, e_ref)
        assert abs(r.northing - n_ref) < 1e-3, (r.pid, r.northing, n_ref)


def test_equator_central_meridian_exact(spark):
    src = ("SELECT CAST(3.0 AS DOUBLE) AS lon, CAST(0.0 AS DOUBLE) AS lat, "
           "CAST(3.0 AS DOUBLE) AS lon0, CAST(0.0 AS DOUBLE) AS fn")
    r = spark.sql(
        rp._staged(src, rp.tm_forward_stages(), "easting, northing")
    ).first()
    assert r.easting == 500000.0
    assert r.northing == 0.0


def test_gate_roundtrip_recovers_source(spark, sf_dir):
    """Every point's recovered lon/lat is within 1e-7 deg (~1.1 cm) of the
    source — the gate query's rt_ok threshold contract."""
    world.register_tables(spark, sf_dir)
    rows = spark.sql(
        rp.utm_roundtrip_sql(world.LAYER_SQL["points_part"])
    ).collect()
    assert rows
    for r in rows:
        assert r.rt_ok, (r.pid, r.lon1, r.lat1)


def test_merc_forward_matches_independent(spark):
    """Engine Mercator vs the independent tan-form y = R ln tan(pi/4+phi/2)
    (different formula path than the engine's atanh form), plus the
    canonical anchor x(180 deg) = 20037508.3427892."""
    pts = [(-73.5, 40.5), (3.2, 0.01), (151.2, -33.8), (-0.1, 78.9),
           (180.0, 0.0), (177.0, -79.5)]
    vals = " UNION ALL ".join(
        f"SELECT {i} AS pid, CAST({lo} AS DOUBLE) AS lon, "
        f"CAST({la} AS DOUBLE) AS lat"
        for i, (lo, la) in enumerate(pts)
    )
    rows = spark.sql(
        rp._staged(vals, rp.merc_forward_stages(), "pid, mx, my")
    ).collect()
    for r in sorted(rows, key=lambda r: r.pid):
        lo, la = pts[r.pid]
        x_ref = 6378137.0 * math.radians(lo)
        y_ref = 6378137.0 * math.log(math.tan(math.pi / 4 + math.radians(la) / 2))
        assert abs(r.mx - x_ref) < 1e-6, (r.pid, r.mx, x_ref)
        assert abs(r.my - y_ref) < 1e-5, (r.pid, r.my, y_ref)
    x180 = next(r.mx for r in rows if r.pid == 4)
    assert abs(x180 - 20037508.342789244) < 1e-6


def test_merc_gate_roundtrip(spark, sf_dir):
    world.register_tables(spark, sf_dir)
    rows = spark.sql(
        rp.merc_roundtrip_sql(world.LAYER_SQL["points_part"])
    ).collect()
    assert rows
    assert all(r.rt_ok for r in rows)


def test_merc_dataframe_api(spark):
    df = spark.sql(
        "SELECT id AS pid, CAST(-120.0 + id * 0.3 AS DOUBLE) AS x, "
        "CAST(-60.0 + id * 0.7 AS DOUBLE) AS y FROM RANGE(20)"
    )
    merc = rp.reproject(df, 4326, 3857, x="x", y="y")
    back = rp.reproject(merc, 3857, 4326, x="x", y="y")
    for orig, rec in zip(
        df.orderBy("pid").collect(), back.orderBy("pid").collect()
    ):
        assert abs(orig.x - rec.x) < 1e-9
        assert abs(orig.y - rec.y) < 1e-9


def test_reproject_dataframe_api(spark):
    """reproject() round-trips a fixed-zone frame and preserves the other
    columns; unsupported pairs raise."""
    import pytest

    df = spark.sql(
        "SELECT id AS pid, CAST(150.0 + id * 0.1 AS DOUBLE) AS x, "
        "CAST(-35.0 + id * 0.05 AS DOUBLE) AS y FROM RANGE(20)"
    )
    utm = rp.reproject(df, 4326, 32756, x="x", y="y")  # zone 56 south
    assert set(utm.columns) == {"pid", "x", "y"}
    back = rp.reproject(utm, 32756, 4326, x="x", y="y")
    for orig, rec in zip(
        df.orderBy("pid").collect(), back.orderBy("pid").collect()
    ):
        assert orig.pid == rec.pid
        assert abs(orig.x - rec.x) < 1e-8
        assert abs(orig.y - rec.y) < 1e-8
    with pytest.raises(ValueError):
        rp.reproject(df, 32756, 9999)  # unknown code still refuses
    assert rp.reproject(df, 4326, 4326) is df


def test_reproject_composes_through_wgs84(spark):
    """A pair with no 4326 side composes inverse-then-forward: cross-zone
    UTM->UTM and cross-family UTM->LCC both round-trip to the source."""
    # lon -96.5..-95.55 sits 2.5-3.5 deg from BOTH zone 14's and zone
    # 15's central meridians (-99 / -93) — inside the series' accuracy
    # band for the cross-zone leg.
    df = spark.sql(
        "SELECT id AS pid, CAST(-96.5 + id * 0.05 AS DOUBLE) AS x, "
        "CAST(35.0 + id * 0.05 AS DOUBLE) AS y FROM RANGE(20)"
    )
    utm = rp.reproject(df, 4326, 32614, x="x", y="y")  # zone 14 north
    # cross-family: UTM -> LCC equals the direct 4326 -> LCC projection
    via = rp.reproject(utm, 32614, 102004).orderBy("pid").collect()
    direct = rp.reproject(df, 4326, 102004).orderBy("pid").collect()
    for a, b in zip(via, direct):
        assert abs(a.x - b.x) < 1e-3 and abs(a.y - b.y) < 1e-3  # ~mm
    # cross-zone: UTM 14 -> UTM 15 -> back to geographic recovers source
    z15 = rp.reproject(utm, 32614, 32615)
    back = rp.reproject(z15, 32615, 4326).orderBy("pid").collect()
    for orig, rec in zip(df.orderBy("pid").collect(), back):
        # two series round-trips at ~3.5 deg from the CM: ~1e-7-deg error
        assert abs(orig.x - rec.x) < 1e-6 and abs(orig.y - rec.y) < 1e-6


def test_lcc_conformal_jacobian():
    """The LCC forward map must be CONFORMAL: the numeric Jacobian at
    sample points is a scaled rotation (J11 == J22, J12 == -J21) to 1e-4
    relative — angles preserved everywhere on the cone."""
    import math

    from opengxt_spark import reproject as rp

    def fwd(lon, lat):
        t = math.tan(math.pi / 4.0 + math.radians(lat) / 2.0)
        rho = rp.R_LCC * rp._LCC_F / (t ** rp._LCC_N)
        th = rp._LCC_N * math.radians(lon - rp.LCC_LON0)
        return rho * math.sin(th), rp._LCC_RHO0 - rho * math.cos(th)

    d = 1e-6
    for lat in (-30.0, 0.0, 33.0, 39.0, 45.0, 70.0):
        for lon in (-170.0, -96.0, 0.0, 150.0):
            x0, y0 = fwd(lon, lat)
            # d/dlon and d/dlat columns, lat column scaled by cos(phi)
            # (conformality is w.r.t. the metric, not raw degrees)
            xl = (fwd(lon + d, lat)[0] - x0) / d
            yl = (fwd(lon + d, lat)[1] - y0) / d
            xp = (fwd(lon, lat + d)[0] - x0) / d * math.cos(math.radians(lat))
            yp = (fwd(lon, lat + d)[1] - y0) / d * math.cos(math.radians(lat))
            scale = math.hypot(xl, yl)
            assert abs(xl - yp) / scale < 1e-4, (lat, lon)
            assert abs(yl + xp) / scale < 1e-4, (lat, lon)


def test_lcc_roundtrip_margin(spark, sf_dir):
    """LCC round-trip error under the 1e-9-deg gate threshold and the
    cross-family utm->lcc gate all-true at test scale."""
    from opengxt_spark import reproject as rp, world

    world.register_tables(spark, sf_dir)
    rows = spark.sql(
        rp.lcc_roundtrip_sql(world.LAYER_SQL["points_part"])
    ).collect()
    assert rows and all(r["rt_ok"] for r in rows)
    rows2 = spark.sql(
        rp.utm_to_lcc_sql(world.LAYER_SQL["points_part"])
    ).collect()
    assert rows2 and all(r["rt_ok"] for r in rows2)


def test_albers_equal_area_jacobian():
    """The Albers forward map must preserve areas: the numeric Jacobian at
    sample latitudes equals R^2 cos(phi) dlon dlat (area scale 1) to 1e-5
    relative."""
    import math

    from opengxt_spark import reproject as rp

    def fwd(lon, lat):
        sphi = math.sin(math.radians(lat))
        rho = rp.R_AEA * math.sqrt(rp._AEA_C - 2.0 * rp._AEA_N * sphi) / rp._AEA_N
        tha = rp._AEA_N * math.radians(lon - rp.AEA_LON0)
        return rho * math.sin(tha), rp._AEA_RHO0 - rho * math.cos(tha)

    d = 1e-5
    for lat in (-70.0, -30.0, 0.0, 23.0, 45.5, 70.0):
        for lon in (-170.0, -96.0, 0.0, 150.0):
            x0, y0 = fwd(lon, lat)
            xl, yl = fwd(lon + d, lat)
            xp, yp = fwd(lon, lat + d)
            jac = abs((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0))
            want = (rp.R_AEA ** 2) * math.cos(math.radians(lat)) * (
                math.radians(d) ** 2
            )
            assert abs(jac / want - 1.0) < 1e-4, (lat, lon, jac / want)


def test_albers_roundtrip_margin(spark, sf_dir):
    """Round-trip error well under the 1e-9-deg gate threshold, and every
    rt_ok true at test scale."""
    from opengxt_spark import reproject as rp, world

    world.register_tables(spark, sf_dir)
    rows = spark.sql(
        rp.aea_roundtrip_sql(world.LAYER_SQL["points_part"])
    ).collect()
    assert rows and all(r["rt_ok"] for r in rows)
