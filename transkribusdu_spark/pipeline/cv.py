"""Cross-validation / folds / grid search (SURVEY.md §2.5 A9, §2.7 U4,
§2.9 M7, §2.10 E6).

The reference persists fold definitions to disk so folds run as separate
OS processes (``tasks/DU_Task.py:847-1022``) and grid-searches LR's C
over {0.01, 0.1, 1, 10} (``tasks/DU_Task.py:96-98``). Spark-native
equivalents: seeded randomSplit over urls (disjointness asserted, U4),
folds as independent jobs over a persisted fold-assignment table, and
TrainValidationSplit for the C grid.
"""

from __future__ import annotations

from pyspark.ml.classification import LogisticRegression
from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.tuning import ParamGridBuilder, TrainValidationSplit
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import MAIN_CONTENT_LABELS
from .features import NODE_FEATURE_COLS
from .model import _assemble

LR_C_GRID = (0.01, 0.1, 1.0, 10.0)  # reference grid, tasks/DU_Task.py:96-98


def assign_folds(urls: DataFrame, n_folds: int = 4, seed: int = 42) -> DataFrame:
    """Deterministic fold assignment per url: (url, fold int). Hash-based
    (not randomSplit) so assignment is stable under re-partitioning and
    resume — the Spark analogue of the reference's pickled fold files.

    Hash = first 8 hex chars of md5("url|seed") mod n_folds: md5 is
    engine-portable (same rule in DuckDB / plain Python), so fold
    assignments are verifiable outside Spark."""
    h = F.conv(F.substring(F.md5(F.concat(F.col("url"), F.lit(f"|{seed}"))), 1, 8), 16, 10)
    return urls.select("url").distinct().withColumn(
        "fold", F.pmod(h.cast("long"), F.lit(n_folds)).cast("int")
    )


def split_train_test(df: DataFrame, folds: DataFrame, test_fold: int) -> tuple[DataFrame, DataFrame]:
    j = df.join(folds, "url")
    return j.filter(F.col("fold") != test_fold).drop("fold"), j.filter(
        F.col("fold") == test_fold
    ).drop("fold")


def check_fold_disjointness(folds: DataFrame) -> bool:
    """U4: every url in exactly one fold."""
    n = folds.count()
    return folds.select("url").distinct().count() == n


def grid_search_node_classifier(node_feats: DataFrame, seed: int = 42):
    """M7: LR over the reference's C grid via TrainValidationSplit
    (C = 1/regParam); returns (best_model, {regParam: metric})."""
    train = _assemble(
        node_feats.withColumn(
            "y", F.col("label").isin(list(MAIN_CONTENT_LABELS)).cast("double")
        ),
        NODE_FEATURE_COLS,
    )
    lr = LogisticRegression(featuresCol="features", labelCol="y", maxIter=30)
    grid = ParamGridBuilder().addGrid(lr.regParam, [1.0 / c for c in LR_C_GRID]).build()
    tvs = TrainValidationSplit(
        estimator=lr,
        estimatorParamMaps=grid,
        evaluator=BinaryClassificationEvaluator(labelCol="y"),
        trainRatio=0.75,
        seed=seed,
        parallelism=2,
    )
    fitted = tvs.fit(train)
    metrics = {
        pm[lr.regParam]: m for pm, m in zip(grid, fitted.validationMetrics)
    }
    return fitted.bestModel, metrics
