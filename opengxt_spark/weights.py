"""Spatial weights matrix variants — the per-call conceptualizations of
OpenGXT's WeightMatrixBuilder, as pair-table generators.

Reference parity map (paths relative to /root/reference, under
GeoTools/process-spatialstatistics/src/main/java/org/geotools/process/
spatialstatistics/core/):
- InverseDistance(²)      <- WeightMatrixBuilder.java:206-227 (w = 1/d^β)
- kNearestNeighbors (k=8) <- WeightMatrixKNearestNeighbors.java:46-66
- Queen/Rook contiguity   <- WeightMatrixContiguity.java:73 (EdgesNodes /
                             EdgesOnly)
- Row standardization     <- WeightMatrixBuilder.java:239-253 (w'ij = wij/Σj)
- Adaptive default band   <- DistanceFactory.java:83-121 (max NN-dist × 1.0001)

Architecture: every conceptualization materializes the same sparse pair
shape — (pid_l, pid_r, vi, vj, wq) with **integer-quantized weights**
wq = FLOOR(Q·w) (Q = 10^6, w clamped to ≤ 1 so pair-sum products stay far
from int64 overflow). Quantization is the engine-parity contract of this
repo: all cross-pair reductions are exact integer sums (order-free under
any partitioning — the requirement for a deterministic distributed result),
and the statistic's double arithmetic runs once in a shared SQL fragment.
The ≤1e-6 relative quantization of w is a documented narrowing vs the
reference's raw doubles (whose own result is accumulation-order dependent).

Scale: band pairs ride the cell-bucketed distance join, kNN the two-phase
adaptive-radius join, contiguity the bbox cell join — no O(n²) anywhere;
the S1/S2 moment terms need the transposed pair table, a self-equi-join on
(j, i), one keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import joins, world
from .overlay_diff import _rects_mm, mm_sql
from .world import dlit

Q = 1_000_000  # weight quantization scale


# ---------------------------------------------------------------------------
# Pair-table generators
# ---------------------------------------------------------------------------

IDW_WQ_SQL = f"CAST(LEAST(FLOOR({dlit(float(Q))} / SQRT(d2)), {Q}) AS BIGINT)"
IDW2_WQ_SQL = f"CAST(LEAST(FLOOR({dlit(float(Q))} / d2), {Q}) AS BIGINT)"


def idw_band_pairs(
    points: DataFrame, band: float, v: str = "v", squared: bool = False
) -> DataFrame:
    """Inverse-distance weights within a fixed band: (pid_l, pid_r, vi, vj,
    wq) with w = min(1, 1/d^β), β = 1 or 2. The min() clamp regularizes the
    d→0 singularity of the reference's raw 1/d^β (and bounds wq for exact
    integer reductions)."""
    pairs = joins.distance_band_join(
        points, points, band,
        left_extra={"vi": v}, right_extra={"vj": v},
    ).where(F.col("pid_l") != F.col("pid_r"))
    wq = F.expr(IDW2_WQ_SQL if squared else IDW_WQ_SQL)
    return pairs.select("pid_l", "pid_r", "vi", "vj", wq.alias("wq"))


def knn_pairs(
    points: DataFrame, k: int = 8, radius: float = 50.0, v: str = "v"
) -> DataFrame:
    """k-nearest-neighbor binary weights (wq = Q), directed i→j.

    The reference probes an unbounded STRtree; the distributed contract is
    a generous radius cap (documented narrowing — at 100 TB an unbounded
    nearest search needs iterative ring expansion). Ties broken on pid_r,
    matching the engine-wide deterministic tie rule.
    """
    vv = points.select(F.col("pid").alias("_vp"), F.col(v).alias("_v"))
    topk = joins.knn_join(points, points, k=k, radius=radius, exclude_self=True)
    out = (
        topk.join(vv, topk["pid_l"] == vv["_vp"]).drop("_vp")
        .withColumnRenamed("_v", "vi")
        .join(vv, F.col("pid_r") == vv["_vp"]).drop("_vp")
        .withColumnRenamed("_v", "vj")
    )
    return out.select(
        "pid_l", "pid_r", "vi", "vj", F.lit(Q).cast("long").alias("wq")
    )


def queen_pairs(rects: DataFrame, v_sql: str) -> DataFrame:
    """Queen contiguity (EdgesNodes — any boundary or interior contact) on a
    rect layer, exact integer-mm predicates. Binary weights."""
    return _contiguity_pairs(rects, v_sql, rook=False)


def rook_pairs(rects: DataFrame, v_sql: str) -> DataFrame:
    """Rook contiguity (EdgesOnly): contact with positive shared extent —
    corner-point-only neighbors excluded."""
    return _contiguity_pairs(rects, v_sql, rook=True)


def _contiguity_pairs(rects: DataFrame, v_sql: str, rook: bool) -> DataFrame:
    from . import cells

    cs = cells.DEFAULT_CELL_SIZE
    m = _rects_mm(rects).join(
        rects.select("rid", F.expr(v_sql).alias("_v")), on="rid"
    )
    a = m.select(
        F.col("rid").alias("pid_l"), F.col("_v").alias("vi"),
        F.col("mx0").alias("ax0"), F.col("mx1").alias("ax1"),
        F.col("my0").alias("ay0"), F.col("my1").alias("ay1"),
    )
    b = m.select(
        F.col("rid").alias("pid_r"), F.col("_v").alias("vj"),
        F.col("mx0").alias("bx0"), F.col("mx1").alias("bx1"),
        F.col("my0").alias("by0"), F.col("my1").alias("by1"),
    )
    ac = cells.explode_extent_cells(
        a.withColumns({
            "xmin": F.col("ax0") / 1000.0, "xmax": F.col("ax1") / 1000.0,
            "ymin": F.col("ay0") / 1000.0, "ymax": F.col("ay1") / 1000.0,
        })
    ).drop("xmin", "xmax", "ymin", "ymax")
    bc = cells.explode_extent_cells(
        b.withColumns({
            "xmin": F.col("bx0") / 1000.0, "xmax": F.col("bx1") / 1000.0,
            "ymin": F.col("by0") / 1000.0, "ymax": F.col("by1") / 1000.0,
        })
    ).drop("xmin", "xmax", "ymin", "ymax")
    j = ac.join(bc, on=["cell_x", "cell_y"], how="inner").where(
        F.col("pid_l") != F.col("pid_r")
    )
    touch = (
        (F.col("ax0") <= F.col("bx1")) & (F.col("bx0") <= F.col("ax1"))
        & (F.col("ay0") <= F.col("by1")) & (F.col("by0") <= F.col("ay1"))
    )
    if rook:
        corner_only = (
            ((F.col("ax0") == F.col("bx1")) | (F.col("bx0") == F.col("ax1")))
            & ((F.col("ay0") == F.col("by1")) | (F.col("by0") == F.col("ay1")))
        )
        touch = touch & ~corner_only
    j = j.where(touch)
    # cell-ownership dedup on the contact region's min corner (mm → cell)
    oxmin = F.greatest("ax0", "bx0")
    oymin = F.greatest("ay0", "by0")
    own = (
        (F.floor(oxmin / F.lit(1000.0 * cs)).cast("long") == F.col("cell_x"))
        & (F.floor(oymin / F.lit(1000.0 * cs)).cast("long") == F.col("cell_y"))
    )
    return j.where(own).select(
        "pid_l", "pid_r", "vi", "vj", F.lit(Q).cast("long").alias("wq")
    )


def adaptive_band(points: DataFrame, factor: float = 1.0001) -> float:
    """The reference's default band: max nearest-neighbor distance × 1.0001
    (DistanceFactory.java:83-121) — guarantees every feature ≥1 neighbor.
    One plan-time aggregate (the distributed analogue of the reference's
    full pre-scan)."""
    big = 1500.0  # > world diagonal; two-phase join keeps this cheap
    nn = joins.nearest_join(points, points, radius=big, exclude_self=True)
    row = nn.agg(F.max("d2").alias("m")).collect()[0]
    import math

    return math.sqrt(float(row["m"])) * factor


def row_standardize_istats(per_i: DataFrame) -> DataFrame:
    """Attach row-sum denominators: w'ij = wij / Σj wij (Row standardization,
    WeightMatrixBuilder.java:239-253). Input must carry wrow_q = Σj wq."""
    return per_i  # per-i stats divide by wrow_q in their stage fragments


# ---------------------------------------------------------------------------
# Generalized Moran's I (arbitrary quantized weights)
# ---------------------------------------------------------------------------

# Inputs: moments (n, s, s2, s3, s4), weighted pair reductions
# (s0q, p11q, plq, prq, s1q, s2xq) and the quantization scale qd.
# Binary case sanity: wq=Q ⇒ s0 = W, s1 = 2W, s2x = 4Σdeg² — identical to
# autocorr.GLOBAL_MORAN_STAGES's closed forms.
GENERAL_MORAN_STAGES: list[tuple[str, str]] = [
    ("nD", "CAST(n AS DOUBLE)"),
    ("mu", "CAST(s AS DOUBLE) / nD"),
    ("zi2", "(CAST(s2 AS DOUBLE) - 2.0 * mu * CAST(s AS DOUBLE) + nD * mu * mu) / nD"),
    (
        "zi4",
        "(CAST(s4 AS DOUBLE) - 4.0 * mu * CAST(s3 AS DOUBLE) "
        "+ 6.0 * mu * mu * CAST(s2 AS DOUBLE) "
        "- 4.0 * mu * mu * mu * CAST(s AS DOUBLE) + nD * mu * mu * mu * mu) / nD",
    ),
    ("qD", f"CAST({Q} AS DOUBLE)"),
    ("s0", "CAST(s0q AS DOUBLE) / qD"),
    ("s1g", "CAST(s1q AS DOUBLE) / (2.0 * qD * qD)"),
    ("s2g", "CAST(s2xq AS DOUBLE) / (qD * qD)"),
    (
        "zijw",
        "(CAST(p11q AS DOUBLE) - mu * CAST(plq AS DOUBLE) "
        "- mu * CAST(prq AS DOUBLE)) / qD + mu * mu * s0",
    ),
    ("moran_i", "zijw / (zi2 * s0)"),
    ("expected_i", "-1.0 / (nD - 1.0)"),
    ("b2", "zi4 / (zi2 * zi2)"),
    (
        "va",
        "nD * ((nD * nD - 3.0 * nD + 3.0) * s1g - nD * s2g + 3.0 * s0 * s0)",
    ),
    (
        "vb",
        "b2 * ((nD * nD - nD) * s1g - 2.0 * nD * s2g + 6.0 * s0 * s0)",
    ),
    ("vc", "(nD - 1.0) * (nD - 2.0) * (nD - 3.0) * s0 * s0"),
    ("z_var", "va / vc - vb / vc - expected_i * expected_i"),
    ("z_score", "(moran_i - expected_i) / SQRT(z_var)"),
]


def weighted_pair_aggs(pairs: DataFrame) -> DataFrame:
    """One-row reduction of a (pid_l, pid_r, vi, vj, wq) pair table to the
    exact integer sums GENERAL_MORAN_STAGES consumes. Handles asymmetric
    tables (kNN) via the transposed self-join for S1/S2."""
    base = pairs.agg(
        F.sum("wq").cast("long").alias("s0q"),
        F.sum(F.expr("wq * vi * vj")).cast("long").alias("p11q"),
        F.sum(F.expr("wq * vi")).cast("long").alias("plq"),
        F.sum(F.expr("wq * vj")).cast("long").alias("prq"),
    )
    t = pairs.select(
        F.col("pid_l").alias("pid_r"), F.col("pid_r").alias("pid_l"),
        F.col("wq").alias("wq_t"),
    )
    both = pairs.select("pid_l", "pid_r", "wq").join(
        t, on=["pid_l", "pid_r"], how="full_outer"
    ).na.fill({"wq": 0, "wq_t": 0})
    s1 = both.agg(
        F.sum(F.expr("(wq + wq_t) * (wq + wq_t)")).cast("long").alias("s1q")
    )
    rows = pairs.groupBy("pid_l").agg(F.sum("wq").cast("long").alias("rq"))
    cols_ = pairs.groupBy("pid_r").agg(F.sum("wq").cast("long").alias("cq"))
    rc = rows.withColumnRenamed("pid_l", "pid").join(
        cols_.withColumnRenamed("pid_r", "pid"), on="pid", how="full_outer"
    ).na.fill({"rq": 0, "cq": 0})
    s2 = rc.agg(
        F.sum(F.expr("(rq + cq) * (rq + cq)")).cast("long").alias("s2xq")
    )
    return base.crossJoin(s1).crossJoin(s2)


def general_moran(pairs: DataFrame, points: DataFrame, v: str = "v") -> DataFrame:
    """Global Moran's I under an arbitrary quantized weights pair table.
    One row: (moran_i, expected_i, z_var, z_score, p_value)."""
    from .autocorr import _int_moments, apply_scalar_stages, zprob_both_sql

    row = _int_moments(points, v).crossJoin(weighted_pair_aggs(pairs))
    out = apply_scalar_stages(row, GENERAL_MORAN_STAGES)
    out = out.withColumn("p_value", F.expr(zprob_both_sql("z_score")))
    return out.select(
        F.round("moran_i", 6).alias("moran_i"),
        F.round("expected_i", 6).alias("expected_i"),
        F.round("z_var", 6).alias("z_var"),
        F.round("z_score", 6).alias("z_score"),
        F.round("p_value", 6).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# Local stats under alternative conceptualizations
# ---------------------------------------------------------------------------

# Row-standardized LISA (the reference's default standardization for local
# Moran): w'ij = 1/deg_i over binary band neighbors. Per-i doubles derive
# from exact integer inputs — no quantization needed.
LOCAL_MORAN_ROWSTD_STAGES: list[tuple[str, str]] = [
    ("nD", "CAST(n AS DOUBLE)"),
    ("mu", "CAST(s AS DOUBLE) / nD"),
    (
        "m2",
        "(CAST(s2 AS DOUBLE) - 2.0 * mu * CAST(s AS DOUBLE) + nD * mu * mu) / (nD - 1.0)",
    ),
    (
        "m4",
        "(CAST(s4 AS DOUBLE) - 4.0 * mu * CAST(s3 AS DOUBLE) "
        "+ 6.0 * mu * mu * CAST(s2 AS DOUBLE) "
        "- 4.0 * mu * mu * mu * CAST(s AS DOUBLE) + nD * mu * mu * mu * mu) / (nD - 1.0)",
    ),
    ("b2", "m4 / (m2 * m2)"),
    ("degD", "CAST(deg AS DOUBLE)"),
    ("wi2", "1.0 / degD"),  # Σj w'ij² for row-standardized binary weights
    ("zxjw", "(CAST(nbr_sum AS DOUBLE) - degD * mu) / degD"),
    ("lmi_index", "((CAST(v AS DOUBLE) - mu) / m2) * zxjw"),
    ("lmi_expected", "-1.0 / (nD - 1.0)"),  # wi. = 1 row-standardized
    ("v1", "(wi2 * (nD - b2)) / (nD - 1.0)"),
    ("v2", "1.0 / ((nD - 1.0) * (nD - 1.0))"),
    ("v3", "(1.0 - wi2) * (2.0 * b2 - nD)"),
    ("v4", "(nD - 1.0) * (nD - 2.0)"),
    ("lmi_var", "v1 + v3 / v4 - v2"),
    ("lmi_z", "(lmi_index - lmi_expected) / SQRT(lmi_var)"),
    ("local_mean", "CAST(nbr_sum AS DOUBLE) / degD"),
    (
        "co_type",
        "CASE WHEN ABS(lmi_z) < 1.96 THEN '' "
        "WHEN lmi_z > 1.96 THEN (CASE WHEN local_mean >= mu THEN 'HH' ELSE 'LL' END) "
        "WHEN CAST(v AS DOUBLE) >= mu AND local_mean <= mu THEN 'HL' "
        "WHEN CAST(v AS DOUBLE) <= mu AND local_mean >= mu THEN 'LH' "
        "ELSE '' END",
    ),
]


def local_moran_rowstd(points: DataFrame, band: float, v: str = "v") -> DataFrame:
    """Anselin LISA with Row standardization (the reference default):
    (pid, lmi_index, lmi_z, lmi_p, co_type)."""
    from .autocorr import (_band_istats, _int_moments, apply_scalar_stages,
                           zprob_both_sql)

    per_i = _band_istats(points, band, v).select(
        "pid", "v",
        F.expr("CAST(cnt_s - 1 AS BIGINT)").alias("deg"),
        F.expr("CAST(sum_s - v AS BIGINT)").alias("nbr_sum"),
    ).where(F.col("deg") >= 1)
    row = per_i.crossJoin(F.broadcast(_int_moments(points, v)))
    out = apply_scalar_stages(row, LOCAL_MORAN_ROWSTD_STAGES)
    out = out.withColumn("lmi_p", F.expr(zprob_both_sql("lmi_z")))
    return out.select(
        "pid",
        F.round("lmi_index", 6).alias("lmi_index"),
        F.round("lmi_z", 6).alias("lmi_z"),
        F.round("lmi_p", 6).alias("lmi_p"),
        F.col("co_type"),
    )


def local_g_knn(
    points: DataFrame, k: int = 8, radius: float = 50.0, v: str = "v"
) -> DataFrame:
    """Getis-Ord Gi* under the kNN conceptualization (selfNeighbors=true):
    neighbor set = k nearest + self, binary weights. Reuses the binary
    LOCAL_G_STAGES — only the neighbor set changes."""
    from .autocorr import LOCAL_G_STAGES, _int_moments, apply_scalar_stages

    pairs = knn_pairs(points, k=k, radius=radius, v=v)
    per_i = pairs.groupBy("pid_l").agg(
        F.first("vi").alias("v"),
        (F.count(F.lit(1)) + F.lit(1)).cast("long").alias("deg_s"),
        (F.sum("vj") + F.first("vi")).cast("long").alias("loc_sum"),
    ).withColumnRenamed("pid_l", "pid")
    row = per_i.crossJoin(F.broadcast(_int_moments(points, v)))
    out = apply_scalar_stages(row, LOCAL_G_STAGES)
    return out.select(
        "pid",
        F.round("gi_z", 6).alias("gi_z"),
        F.round("gi_p", 6).alias("gi_p"),
        F.round("gi_mean", 6).alias("gi_mean"),
        F.round("gi_var", 6).alias("gi_var"),
    )


def local_g_queen(rects: DataFrame, v_sql: str) -> DataFrame:
    """Gi* over a rect layer under Queen contiguity (LocalSAOverlay
    building block): neighbor set = contiguous rects + self, binary
    weights. Output (rid, gi_z, gi_p)."""
    from .autocorr import LOCAL_G_STAGES, apply_scalar_stages

    pairs = queen_pairs(rects, v_sql)
    per_i = pairs.groupBy("pid_l").agg(
        F.first("vi").alias("v"),
        (F.count(F.lit(1)) + F.lit(1)).cast("long").alias("deg_s"),
        (F.sum("vj") + F.first("vi")).cast("long").alias("loc_sum"),
    ).withColumnRenamed("pid_l", "rid")
    moments = rects.select(F.expr(v_sql).alias("_v")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_v").cast("long").alias("s"),
        F.sum(F.expr("_v * _v")).cast("long").alias("s2"),
    )
    out = apply_scalar_stages(
        per_i.crossJoin(F.broadcast(moments)), LOCAL_G_STAGES
    )
    return out.select(
        "rid",
        F.round("gi_z", 6).alias("gi_z"),
        F.round("gi_p", 6).alias("gi_p"),
    )
