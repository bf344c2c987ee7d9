"""Spark-native ML pipeline — reimplementation of the reference's
insurance-reimbursement model (ML notebook, SURVEY.md §2.8) without the
toPandas/sklearn hop.

Reference behavior preserved:
- StringIndexer(handleInvalid='keep') per categorical  (ML:63-85)
- label: covered=0.0 / not-covered=1.0               (ML:117-120)
- randomSplit([0.8, 0.2], seed=42)                   (ML:148)
- RandomForest, 100 trees, depth 10, seed 42         (ML:193-199)
- class imbalance via weights {0: 1.0, 1: 6.1}       (ML:196) — the
  sklearn class_weight dict becomes a weightCol, which is the Spark-
  scalable equivalent (weighting rides the training rows; no driver
  collect, no undersampling).
- evaluation: accuracy + ROC-AUC + feature importances (ML:208-237)

Where the reference leaves Spark (toPandas → sklearn fit on the driver,
ML:178-201), we keep the whole train/eval cycle distributed in
pyspark.ml — the anti-pattern fix called out in SURVEY §4.3.4.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.evaluation import (
    BinaryClassificationEvaluator,
    MulticlassClassificationEvaluator,
)
from pyspark.ml.feature import StringIndexer, VectorAssembler
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.dashboard import q13_ml_dataset

CATEGORICALS = ["form", "therapeutic_class", "pharmacological_class", "lab_name"]
CLASS_WEIGHTS = {0.0: 1.0, 1.0: 6.1}
SEED = 42


@dataclass
class TrainResult:
    model: PipelineModel
    accuracy: float
    auc: float
    feature_importances: dict[str, float]
    train_rows: int
    test_rows: int
    #: per-class precision/recall/f1/support keyed by label (parity with
    #: the reference's sklearn classification_report, ML:217-221)
    per_class: dict[float, dict[str, float]]
    #: (label, prediction, n) counts — the distributed confusion matrix
    confusion: DataFrame = field(repr=False)
    predictions: DataFrame = field(repr=False)


def build_pipeline() -> Pipeline:
    indexers = [
        StringIndexer(inputCol=c, outputCol=f"{c}_idx", handleInvalid="keep")
        for c in CATEGORICALS
    ]
    assembler = VectorAssembler(
        inputCols=["price"] + [f"{c}_idx" for c in CATEGORICALS],
        outputCol="features",
    )
    rf = RandomForestClassifier(
        featuresCol="features",
        labelCol="label",
        weightCol="weight",
        numTrees=100,
        maxDepth=10,
        # StringIndexer marks outputs categorical; maxBins must cover the
        # widest cardinality (sklearn in the reference treated them as
        # continuous ordinals and had no such constraint).
        maxBins=128,
        seed=SEED,
    )
    return Pipeline(stages=[*indexers, assembler, rf])


def prepare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML-ready frame: Q13 projection + label + class weight column."""
    base = q13_ml_dataset(spark, sf_dir)
    covered = F.col("refundable_label") == True  # noqa: E712
    return base.withColumn(
        "label", F.when(covered, 0.0).otherwise(1.0)
    ).withColumn(
        "weight",
        F.when(covered, F.lit(CLASS_WEIGHTS[0.0])).otherwise(F.lit(CLASS_WEIGHTS[1.0])),
    )


def train(spark: SparkSession, sf_dir: str) -> TrainResult:
    data = prepare(spark, sf_dir)
    train_df, test_df = data.randomSplit([0.8, 0.2], seed=SEED)
    model = build_pipeline().fit(train_df)
    preds = model.transform(test_df)
    accuracy = MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="prediction", metricName="accuracy"
    ).evaluate(preds)
    auc = BinaryClassificationEvaluator(
        labelCol="label", rawPredictionCol="rawPrediction", metricName="areaUnderROC"
    ).evaluate(preds)
    rf_model = model.stages[-1]
    names = ["price"] + CATEGORICALS
    importances = {
        names[i]: float(rf_model.featureImportances[i]) for i in range(len(names))
    }
    # Confusion matrix as one distributed groupBy (2×2 result); the
    # per-class report (reference classification_report, ML:217-221) is
    # derived from those four counts — no extra passes over preds.
    confusion = preds.groupBy("label", "prediction").agg(F.count("*").alias("n"))
    cm = {(r.label, r.prediction): r.n for r in confusion.collect()}
    labels = sorted({k[0] for k in cm})
    per_class: dict[float, dict[str, float]] = {}
    for lbl in labels:
        tp = cm.get((lbl, lbl), 0)
        fp = sum(n for (t, p), n in cm.items() if p == lbl and t != lbl)
        fn = sum(n for (t, p), n in cm.items() if t == lbl and p != lbl)
        precision = tp / (tp + fp) if tp + fp else 0.0
        recall = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
        per_class[lbl] = {
            "precision": precision,
            "recall": recall,
            "f1": f1,
            "support": float(tp + fn),
        }
    return TrainResult(
        model=model,
        accuracy=accuracy,
        auc=auc,
        feature_importances=importances,
        train_rows=train_df.count(),
        test_rows=test_df.count(),
        per_class=per_class,
        confusion=confusion,
        predictions=preds,
    )


def save_model(result: TrainResult, path: str) -> None:
    """Persist with the Spark ML writer (the scalable analogue of the
    reference's pickle dump, ML:274-282) plus a metadata sidecar
    mirroring the reference's metadata dict (ML:283-297: feature names,
    metrics, class weights, hyperparameters)."""
    import json
    import os

    result.model.write().overwrite().save(path)
    if "://" in path:
        # model went through the Hadoop writer; the JSON sidecar below
        # uses local IO — skip it for remote URIs rather than fail
        return
    meta = {
        "features": ["price"] + CATEGORICALS,
        "accuracy": result.accuracy,
        "auc": result.auc,
        "feature_importances": result.feature_importances,
        "class_weights": {str(k): v for k, v in CLASS_WEIGHTS.items()},
        "num_trees": 100,
        "max_depth": 10,
        "seed": SEED,
        "train_rows": result.train_rows,
        "test_rows": result.test_rows,
        "per_class": {str(k): v for k, v in result.per_class.items()},
    }
    with open(os.path.join(path, "training_metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_model(spark: SparkSession, path: str) -> PipelineModel:
    return PipelineModel.load(path)


def load_metadata(path: str) -> dict:
    """Read back the training metadata sidecar (parity with the
    reference's metadata pickle round-trip, ML:293-297)."""
    import json
    import os

    with open(os.path.join(path, "training_metadata.json")) as f:
        return json.load(f)


def tune(
    spark: SparkSession,
    sf_dir: str,
    num_folds: int = 3,
    parallelism: int = 4,
) -> tuple[PipelineModel, dict]:
    """Seeded k-fold hyperparameter search over the reference model's
    two load-bearing knobs (tree count, depth) with Spark's
    CrossValidator — the distributed replacement for the
    GridSearchCV-on-the-driver step a sklearn version of this pipeline
    would bolt on.

    Scale notes: CV trains folds×grid models; `parallelism` fits that
    many CONCURRENTLY (each fit is itself distributed — model-level
    parallelism multiplies cluster utilization, the reason CV belongs
    in Spark rather than a driver loop over collect()ed data).  The
    weighted-AUC evaluator matches `train`'s imbalance handling, and
    every RNG is seeded so the chosen params are reproducible.

    Returns (best fitted pipeline, {params, avg_metrics}) — the whole
    search's provenance, not just the winner."""
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    pipeline = build_pipeline()
    rf = pipeline.getStages()[-1]
    grid = (
        ParamGridBuilder()
        .addGrid(rf.numTrees, [50, 100])
        .addGrid(rf.maxDepth, [5, 10])
        .build()
    )
    evaluator = BinaryClassificationEvaluator(
        labelCol="label", weightCol="weight", metricName="areaUnderROC"
    )
    cv = CrossValidator(
        estimator=pipeline,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=num_folds,
        parallelism=parallelism,
        seed=SEED,
    )
    data = prepare(spark, sf_dir)
    fitted = cv.fit(data)
    best_rf = fitted.bestModel.stages[-1]
    report = {
        "best_num_trees": best_rf.getNumTrees,
        "best_max_depth": best_rf.getMaxDepth(),
        "avg_metrics": [round(m, 4) for m in fitted.avgMetrics],
        "grid": [
            {"numTrees": pm[rf.numTrees], "maxDepth": pm[rf.maxDepth]}
            for pm in grid
        ],
    }
    return fitted.bestModel, report
