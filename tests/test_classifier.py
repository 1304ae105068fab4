"""Distributed logistic-regression quality filter (operators/classifier.py).

Pins: (1) fitted weights are bit-identical at any partitioning (the
exact-sum gradient claim); (2) loss decreases monotonically; (3) on
linearly separable data the fit reaches high accuracy; (4) the
text-feature pipeline separates planted good/junk documents."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.operators.classifier import (
    fit_logreg,
    quality_features,
    score_logreg,
)


def _separable(spark, n=400, parts=4):
    rng = random.Random(3)
    rows = []
    for i in range(n):
        y = i % 2
        x1 = rng.gauss(2.0 if y else -2.0, 0.6)
        x2 = rng.gauss(-1.0 if y else 1.0, 0.6)
        rows.append((float(y), x1, x2))
    return spark.createDataFrame(rows, "y double, x1 double, x2 double").repartition(
        parts
    )


def test_fit_is_partitioning_invariant(spark):
    feats = {"x1": F.col("x1"), "x2": F.col("x2")}
    df = _separable(spark)
    m1 = fit_logreg(df.repartition(2), feats, F.col("y"), iters=8)
    m2 = fit_logreg(df.repartition(13), feats, F.col("y"), iters=8)
    assert m1["weights"] == m2["weights"]
    assert m1["bias"] == m2["bias"]
    assert m1["losses"] == m2["losses"]


def test_loss_decreases_and_separable_accuracy(spark):
    feats = {"x1": F.col("x1"), "x2": F.col("x2")}
    df = _separable(spark)
    model = fit_logreg(df, feats, F.col("y"), iters=20)
    assert all(
        b <= a + 1e-9 for a, b in zip(model["losses"], model["losses"][1:])
    ), model["losses"]
    scored = df.withColumn("p", score_logreg(feats, model))
    acc = (
        scored.where(
            ((F.col("p") >= 0.5) & (F.col("y") == 1.0))
            | ((F.col("p") < 0.5) & (F.col("y") == 0.0))
        ).count()
        / 400
    )
    assert acc >= 0.95, acc


def test_text_quality_filter_separates_planted_docs(spark):
    rng = random.Random(11)
    good_words = ["the", "quick", "brown", "fox", "jumps", "over", "a", "lazy", "dog", "and", "runs", "far"]
    rows = []
    for i in range(150):
        text = " ".join(rng.choice(good_words) for _ in range(rng.randint(30, 60)))
        rows.append((f"g{i}", text, 1.0))
    for i in range(150):
        junk = "".join(
            rng.choice("x7#!@%3&*()9$^") for _ in range(rng.randint(20, 80))
        )
        rows.append((f"j{i}", junk, 0.0))
    docs = spark.createDataFrame(rows, "doc_id string, text string, y double")
    train = docs.where(F.crc32(F.col("doc_id")) % 2 == 0)
    test = docs.where(F.crc32(F.col("doc_id")) % 2 == 1)
    feats = quality_features(F.col("text"))
    model = fit_logreg(train, feats, F.col("y"), iters=15)
    scored = test.withColumn("p", score_logreg(quality_features(F.col("text")), model))
    acc_row = scored.agg(
        (
            F.count(
                F.when(
                    ((F.col("p") >= 0.5) & (F.col("y") == 1.0))
                    | ((F.col("p") < 0.5) & (F.col("y") == 0.0)),
                    1,
                )
            )
            / F.count(F.lit(1))
        ).alias("acc")
    ).collect()[0]
    assert acc_row["acc"] >= 0.95, acc_row["acc"]
