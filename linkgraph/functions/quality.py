"""Quality-function surface (SURVEY.md §2.I) — the reference's
extensibility seam: 10 pluggable gain formulas selected by id
(/root/reference/src/main_louvain.cpp:889-899, factory :998-1059).

Each is a closed-form arithmetic expression over the canonical
per-candidate inputs, so the Spark implementation is a pure
pyspark.sql Column expression (whole-stage codegen, no UDF):

    dnc    e(v->C): weight from node to candidate community
    degc   weighted degree of the node (w/ self-loops once)
    tot_c  sum of weighted degrees of community members
    in_c   community internal weight (2*intra + self-loops)
    self_v node self-loop weight
    w_u    node weight (nodes_w; 1 on the uncontracted graph)
    w_c    community node weight (sum of member node weights)
    m2     total_weight (2m)
    n      sum of node weights (sum_nodes_w)
    max_w  max edge weight (Graph::max_weight)

Formulas transcribed from the reference headers (gain() in
src/{modularity,zahn,owzad,goldberg,condora,devind,devuni,dp,
shimalik,balmod}.h); ids match the reference's -q flag.

Note: these are the CPU path's *comparison* gains (constant terms
dropped — modularity.h:105-113); the GPU-exact gain used by
operators.louvain is the separate formula in that module. Only
Modularity (id 0) is needed for north-rule parity; the other nine are
the same plug-in seam the reference ships.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class QualityInputs:
    dnc: Column
    degc: Column
    tot_c: Column
    in_c: Column
    self_v: Column
    w_u: Column
    w_c: Column
    m2: float
    n: float
    max_w: float


def modularity_gain(q: QualityInputs) -> Column:
    """id 0 (default): dnc - tot_c*degc/m2 (modularity.h:96-114)."""
    return q.dnc - q.tot_c * q.degc / F.lit(q.m2)


def zahn_gain(q: QualityInputs) -> Column:
    """id 1 Zahn-Condorcet (zahn.h:96-108)."""
    return F.lit(2.0) * q.dnc - q.w_u * q.w_c * F.lit(q.max_w)


def owzad_gain(q: QualityInputs, alpha: float = 0.5) -> Column:
    """id 2 Owsinski-Zadrozny, param alpha (owzad.h:99-111)."""
    return q.dnc - F.lit(alpha) * q.w_u * q.w_c * F.lit(q.max_w)


def goldberg_gain(q: QualityInputs) -> Column:
    """id 3 Goldberg Density (goldberg.h:95-116)."""
    empty = (F.lit(2.0) * q.dnc + q.self_v) / (F.lit(2.0) * q.w_u)
    full = (F.lit(2.0) * q.dnc + q.self_v + q.in_c) / (
        F.lit(2.0) * (q.w_c + q.w_u)
    ) - q.in_c / (F.lit(2.0) * q.w_c)
    return F.when(q.w_c == 0.0, empty).otherwise(full)


def condora_gain(q: QualityInputs) -> Column:
    """id 4 A-weighted Condorcet (condora.h:95-101) — requires
    self-loops injected (G3) + graph_weighting preprocessing."""
    return q.dnc


def devind_gain(q: QualityInputs) -> Column:
    """id 5 Deviation to Indetermination (devind.h:94-110)."""
    n = F.lit(q.n)
    return (
        q.dnc
        - (q.tot_c * q.w_u + q.degc * q.w_c) / n
        + (F.lit(q.m2) * q.w_u * q.w_c) / (n * n)
    )


def devuni_gain(q: QualityInputs) -> Column:
    """id 6 Deviation to Uniformity (devuni.h:93-108)."""
    n = F.lit(q.n)
    return q.dnc - (F.lit(q.m2) * q.w_u * q.w_c) / (n * n)


def dp_gain(q: QualityInputs) -> Column:
    """id 7 Profile Difference (dp.h:109-132)."""
    empty = (F.lit(2.0) * q.dnc + q.self_v) / q.w_u - F.lit(0.5)
    full = (q.in_c + F.lit(2.0) * q.dnc + q.self_v) / (q.w_c + q.w_u) - q.in_c / q.w_c
    return F.when(q.w_c == 0.0, empty).otherwise(full)


def shimalik_gain(q: QualityInputs, kappa: float = 1.0, kappa_min: float = 0.0) -> Column:
    """id 8 Shi-Malik, gated by kappa >= kappa_min (shimalik.h:103-126).

    kappa is the live non-empty-community count in the reference
    (updated mid-scan by remove/insert, shimalik.h:83,95); the
    synchronous engine passes the round-start count instead
    (louvain_generalized recomputes it per round when the gate can
    fire) — a documented synchronous-round divergence."""
    if kappa < kappa_min:
        return F.lit(0.0)
    empty = (F.lit(2.0) * q.dnc + q.self_v) / q.degc - F.lit(1.0)
    full = (q.in_c + F.lit(2.0) * q.dnc + q.self_v) / (q.tot_c + q.degc) - q.in_c / q.tot_c
    return F.when(q.tot_c == 0.0, empty).otherwise(full)


def balmod_gain(q: QualityInputs) -> Column:
    """id 9 Balanced Modularity (balmod.h:100-119)."""
    n, m2, mx = F.lit(q.n), F.lit(q.m2), F.lit(q.max_w)
    g = F.lit(2.0) * q.dnc - q.degc * q.tot_c / m2 - q.w_u * q.w_c * mx
    g = g + ((n * q.w_u * mx - q.degc) * (n * q.w_c * mx - q.tot_c)) / (n * n * mx - m2)
    return g


GAIN_FUNCTIONS = {
    0: ("modularity", modularity_gain),
    1: ("zahn", zahn_gain),
    2: ("owzad", owzad_gain),
    3: ("goldberg", goldberg_gain),
    4: ("condora", condora_gain),
    5: ("devind", devind_gain),
    6: ("devuni", devuni_gain),
    7: ("dp", dp_gain),
    8: ("shimalik", shimalik_gain),
    9: ("balmod", balmod_gain),
}


def modularity_quality(in_sum: Column, tot_sq_sum: Column, m2: float) -> Column:
    """id 0 full quality: Q = sum_c in_c/m2 - (tot_c/m2)^2
    (modularity.cpp:71-91; liveness test tot_c > 0 handled upstream)."""
    return in_sum / F.lit(m2) - tot_sq_sum / F.lit(m2 * m2)


def graph_weighting(edges, quality_id: int):
    """Level-0 edge reweighting required by CondorA (id 4,
    ``condora.cpp:58-104``) and DP (id 7, ``dp.cpp:70-108``); the
    reference driver applies it once before the first level
    (``main_louvain.cpp:1022-1045``, nbc == 0 only).

    edges: the canonical symmetric table (both directions present,
    self-loops once) — its rows ARE the reference's directed adjacency
    entries, so the returned side scalar (sum_se for 4, sum_sq for 7)
    sums over exactly the same terms.

    With d(u) = adjacency-entry count (self-loop counts once) and
    A_uu = self-loop weight:
      id 7:  A'_uv = 2·A_uv/(d(u)+d(v));           sum_sq = Σ A'_uv²
      id 4:  aux   = 2·A_uv/(d(u)+d(v))
             tmp   = A_uu/(2d(u)) + A_vv/(2d(v))
             A'_uv = 2·aux − tmp;                  sum_se = Σ (tmp − aux)
    (CondorA expects self-loops injected first — G3 add_selfloops — so
    every d(u) includes the loop, exactly as the driver's call order.)

    One degrees aggregation + two broadcast-or-shuffle joins; returns
    (reweighted (src,dst,weight) DataFrame — eagerly materialized so
    downstream sums see one fixed set of float64 values — and the side
    scalar as float).
    """
    if quality_id not in (4, 7):
        raise ValueError(f"graph_weighting applies to ids 4/7, got {quality_id}")
    from linkgraph.plans.superstep import barrier, release

    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d"),
        F.sum(
            F.when(F.col("src") == F.col("dst"), F.col("weight")).otherwise(0.0)
        ).alias("sl"),
    )
    ds = deg.select(
        F.col("id").alias("src"), F.col("d").alias("d_src"), F.col("sl").alias("sl_src")
    )
    dd = deg.select(
        F.col("id").alias("dst"), F.col("d").alias("d_dst"), F.col("sl").alias("sl_dst")
    )
    j = edges.join(ds, "src").join(dd, "dst")
    aux = F.lit(2.0) * F.col("weight") / (F.col("d_src") + F.col("d_dst"))
    if quality_id == 7:
        new_w = aux
        side = new_w * new_w
    else:
        tmp = F.col("sl_src") / (F.lit(2.0) * F.col("d_src")) + F.col("sl_dst") / (
            F.lit(2.0) * F.col("d_dst")
        )
        new_w = F.lit(2.0) * aux - tmp
        side = tmp - aux
    out = barrier(
        j.select("src", "dst", new_w.alias("weight"), side.alias("_side"))
    )
    scalar = float(out.agg(F.sum("_side")).first()[0] or 0.0)
    reweighted = out.select("src", "dst", "weight")
    # NOTE: `out` stays checkpointed until `reweighted` is superseded;
    # callers that persist their own copy may release(out) via the
    # returned frame's lineage — at one reweight per run this is a
    # vertex+edge-sized block, not a leak that grows.
    _ = release  # (kept importable for callers)
    return reweighted, scalar


def quality_value(
    comm,
    quality_id: int,
    m2: float,
    n: float,
    max_w: float,
    alpha: float = 0.5,
    side: float = 0.0,
) -> float:
    """Full quality aggregate of a partition — the scalar the reference
    prints each pass (``{modularity,zahn,owzad,goldberg,condora,devind,
    devuni,dp,shimalik,balmod}.cpp::quality()``).

    comm: per-community aggregates (community, in_c, tot, w_c) where
    in_c = intra-community weight over symmetric rows (= reference
    in[c]: 2·intra-pairs + self-loops), tot = Σ weighted degree,
    w_c = Σ node weights. side: sum_se (id 4) / sum_sq (id 7) from
    graph_weighting. kappa (live non-empty community count, ids 7/8)
    is derived from the same aggregates. One scalar action.
    """
    in_c, tot, w_c = F.col("in_c"), F.col("tot"), F.col("w_c")
    z = F.lit(0.0)
    nn = n * n

    def _sum(cond, expr):
        return F.coalesce(F.sum(F.when(cond, expr)), z)

    if quality_id == 0:
        agg = _sum(tot > 0.0, in_c - tot * tot / F.lit(m2)) / F.lit(m2)
    elif quality_id == 1:
        agg = (
            _sum(w_c > 0.0, F.lit(2.0) * in_c - F.lit(max_w) * w_c * w_c)
            + F.lit(nn * max_w - m2)
        ) / F.lit(nn * max_w)
    elif quality_id == 2:
        agg = (
            _sum(w_c > 0.0, in_c - F.lit(alpha) * (w_c * w_c * F.lit(max_w)))
            + F.lit(alpha * (nn * max_w - m2))
        ) / F.lit(nn * max_w)
    elif quality_id == 3:
        agg = _sum(w_c * 2.0 > 0.0, in_c / (w_c * F.lit(2.0))) / F.lit(n * max_w)
    elif quality_id == 4:
        agg = (F.coalesce(F.sum(in_c), z) + F.lit(side)) / F.lit(nn)
    elif quality_id == 5:
        agg = (
            _sum(w_c > 0.0, in_c - (F.lit(2.0) * tot * w_c) / F.lit(n))
            + _sum(w_c > 0.0, w_c * w_c) * F.lit(m2 / nn)
        ) / F.lit(m2)
    elif quality_id == 6:
        agg = (
            _sum(w_c > 0.0, in_c) - _sum(w_c > 0.0, w_c * w_c) * F.lit(m2 / nn)
        ) / F.lit(m2)
    elif quality_id == 7:
        kappa = F.coalesce(F.sum(F.when(w_c > 0.0, F.lit(1))), F.lit(0)).cast("double")
        agg = (
            _sum(w_c > 0.0, F.lit(2.0) * in_c / w_c) - (F.lit(side) + kappa)
        ) / F.lit(nn * max_w)
    elif quality_id == 8:
        kappa = F.coalesce(F.sum(F.when(tot > 0.0, F.lit(1))), F.lit(0)).cast("double")
        agg = (_sum(tot > 0.0, in_c / tot) - kappa) / F.lit(n)
    elif quality_id == 9:
        agg = _sum(
            w_c > 0.0,
            F.lit(2.0) * in_c
            - (tot * tot) / F.lit(m2)
            - w_c * w_c * F.lit(max_w)
            + ((F.lit(n) * w_c * F.lit(max_w) - tot) * (F.lit(n) * w_c * F.lit(max_w) - tot))
            / F.lit(nn * max_w - m2),
        ) / F.lit(nn * max_w)
    else:
        raise ValueError(f"unknown quality id {quality_id}")
    return float(comm.agg(agg.alias("q")).first()["q"])
