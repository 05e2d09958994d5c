"""Declarative anomaly flagging.

Engine form of the reference's anomaly detection
(``scripts/etl_transform/anomalies.py:42-68``): an ordered list of
(name, predicate) rules folded into a first-match-wins ``when`` ladder —
pure column expressions, one pass, no shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class AnomalyRule:
    name: str
    predicate: Column


def anomaly_ladder(rules: Sequence[AnomalyRule]) -> Column:
    """First-match-wins label column (null = no anomaly)."""
    expr = F.lit(None).cast("string")
    for r in reversed(rules):
        expr = F.when(r.predicate, F.lit(r.name)).otherwise(expr)
    return expr


def flag_anomalies(
    df: DataFrame, rules: Sequence[AnomalyRule], out_col: str = "anomaly_type"
) -> DataFrame:
    return df.withColumn(out_col, anomaly_ladder(rules))


def anomaly_summary(
    df: DataFrame, rules: Sequence[AnomalyRule], out_col: str = "anomaly_type"
) -> DataFrame:
    """Counts per anomaly type (reference's summary TXT, anomalies.py:146-155)."""
    return (
        flag_anomalies(df, rules, out_col)
        .filter(F.col(out_col).isNotNull())
        .groupBy(out_col)
        .agg(F.count(F.lit(1)).alias("n_anomalies"))
        .orderBy(out_col)
    )
