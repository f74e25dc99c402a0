"""Chi-square feature selection (SURVEY.md §2.4 F22; reference
``graph/FeatureSelection.py`` wraps sklearn chi2). Re-expressed as plain
aggregations: for binned/non-negative feature columns, the chi2 statistic
between feature mass and a binary label is computable from four sums per
column — one distributed pass, no sklearn."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chi2_scores(df: DataFrame, feature_cols: list[str], label_col: str = "y") -> DataFrame:
    """sklearn-chi2-compatible scores for non-negative features vs a
    binary 0/1 label: observed class-conditional feature mass vs expected
    under independence. Returns (feature, chi2) ordered desc."""
    y = F.col(label_col).cast("double")
    aggs = [F.sum(y).alias("_n1"), F.count("*").alias("_n")]
    for c in feature_cols:
        aggs.append(F.sum(F.col(c)).alias(f"{c}__tot"))
        aggs.append(F.sum(F.col(c) * y).alias(f"{c}__pos"))
    row = df.agg(*aggs).collect()[0].asDict()
    n1, n = row["_n1"], row["_n"]
    p1 = n1 / n if n else 0.0
    out = []
    for c in feature_cols:
        tot, pos = row[f"{c}__tot"] or 0.0, row[f"{c}__pos"] or 0.0
        neg = tot - pos
        e_pos, e_neg = tot * p1, tot * (1.0 - p1)
        chi2 = 0.0
        if e_pos > 0:
            chi2 += (pos - e_pos) ** 2 / e_pos
        if e_neg > 0:
            chi2 += (neg - e_neg) ** 2 / e_neg
        out.append((c, round(float(chi2), 6)))
    spark = df.sparkSession
    return spark.createDataFrame(out, "feature string, chi2 double").orderBy(
        F.desc("chi2"), F.asc("feature")
    )


def select_top_k(df: DataFrame, feature_cols: list[str], k: int,
                 label_col: str = "y") -> list[str]:
    scored = chi2_scores(df, feature_cols, label_col).limit(k).collect()
    return [r.feature for r in scored]
