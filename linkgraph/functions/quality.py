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
    """id 8 Shi-Malik, gated by kappa >= kappa_min (shimalik.h:103-126)."""
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
