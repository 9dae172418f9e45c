from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linkgraph.functions.quality import GAIN_FUNCTIONS, QualityInputs


def _numpy_gains(row, m2, n, max_w, alpha=0.5):
    """Reference formulas re-derived independently (headers cited in
    linkgraph/functions/quality.py)."""
    dnc, degc, tot_c, in_c, self_v, w_u, w_c = row
    out = {
        0: dnc - tot_c * degc / m2,
        1: 2.0 * dnc - w_u * w_c * max_w,
        2: dnc - alpha * w_u * w_c * max_w,
        4: dnc,
        5: dnc - (tot_c * w_u + degc * w_c) / n + (m2 * w_u * w_c) / (n * n),
        6: dnc - (m2 * w_u * w_c) / (n * n),
        9: (2.0 * dnc - degc * tot_c / m2 - w_u * w_c * max_w)
        + ((n * w_u * max_w - degc) * (n * w_c * max_w - tot_c)) / (n * n * max_w - m2),
    }
    out[3] = (
        (2 * dnc + self_v) / (2 * w_u)
        if w_c == 0
        else (2 * dnc + self_v + in_c) / (2 * (w_c + w_u)) - in_c / (2 * w_c)
    )
    out[7] = (
        (2 * dnc + self_v) / w_u - 0.5
        if w_c == 0
        else (in_c + 2 * dnc + self_v) / (w_c + w_u) - in_c / w_c
    )
    out[8] = (
        (2 * dnc + self_v) / degc - 1.0
        if tot_c == 0
        else (in_c + 2 * dnc + self_v) / (tot_c + degc) - in_c / tot_c
    )
    return out


@pytest.mark.parametrize("qid", sorted(GAIN_FUNCTIONS))
def test_gain_expressions_match_reference_formulas(spark, qid):
    rows = [
        (2.0, 3.0, 10.0, 4.0, 1.0, 1.0, 5.0),
        (0.0, 2.0, 0.0, 0.0, 0.0, 1.0, 0.0),  # empty community branches
        (5.0, 7.0, 21.0, 8.0, 2.0, 2.0, 3.0),
    ]
    m2, n, max_w = 36.0, 12.0, 2.0
    df = spark.createDataFrame(
        rows,
        "dnc double, degc double, tot_c double, in_c double, self_v double, w_u double, w_c double",
    )
    q = QualityInputs(
        dnc=F.col("dnc"),
        degc=F.col("degc"),
        tot_c=F.col("tot_c"),
        in_c=F.col("in_c"),
        self_v=F.col("self_v"),
        w_u=F.col("w_u"),
        w_c=F.col("w_c"),
        m2=m2,
        n=n,
        max_w=max_w,
    )
    name, fn = GAIN_FUNCTIONS[qid]
    got = [r.g for r in df.select(fn(q).alias("g")).collect()]
    want = [_numpy_gains(row, m2, n, max_w)[qid] for row in rows]
    assert got == pytest.approx(want, abs=1e-12), name
