"""Distributed logistic-regression quality classifier.

The model-based corpus filter tier (the published LLM-pipeline recipe:
label a small seed set, train a cheap linear classifier, score the
whole corpus and keep/resample by predicted quality — the step between
the heuristic `quality_score` and an expensive neural scorer).

Spark shape, designed for 100 TB corpora:

- **Featurize** is map-only JVM column arithmetic (reuses text.py's
  quality signals); features are micro-quantized (floor(x·1e6)) at
  the source so every later sum is over exact integers.
- **Each training iteration is ONE aggregate job**: the per-row
  gradient terms (p−y)·z_j are built as literal-weight column
  expressions (d+1 doubles — the model is driver-held and tiny),
  pico-quantized and summed in DECIMAL — so gradients are
  order-independent at ANY partitioning and the fitted weights are
  bit-reproducible run to run. No mllib, no per-row Python.
- **Scoring** is a map-only literal-weight expression — compose it
  with the md5-gated keep/resample machinery (sampling.py) for the
  actual corpus filter.

Bounded driver state: d+1 weights + d feature moments. The full-batch
gradient (not SGD) is the right trade at this scale: one corpus pass
per iteration with map-side combine, ~20 iterations, no RNG, no
state to shard.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.operators.text import (
    avg_token_len,
    digit_ratio,
    punct_ratio,
    stopword_ratio,
    token_count,
)

__all__ = [
    "quality_features",
    "fit_logreg",
    "score_logreg",
]

_MICRO = 1_000_000.0
_PICO = 1e9


def quality_features(text: Column) -> dict[str, Column]:
    """The default quality feature set over a text column — each
    micro-quantized so downstream sums are exact."""

    def q(c: Column) -> Column:
        return (F.floor(c * F.lit(_MICRO)) / F.lit(_MICRO)).cast("double")

    n_tok = token_count(text).cast("double")
    return {
        "log_tokens": q(F.log1p(n_tok)),
        "avg_token_len": q(avg_token_len(text)),
        "stopword_ratio": q(stopword_ratio(text)),
        "punct_ratio": q(punct_ratio(text)),
        "digit_ratio": q(digit_ratio(text)),
    }


def _exact_sum(col: Column) -> Column:
    """Order-independent double sum: pico-quantize → long → DECIMAL
    sum → double. Same exactness trick as similarity.ivf_centroids."""
    return (
        F.sum(F.floor(col * F.lit(_PICO)).cast("long").cast("decimal(38,0)"))
        .cast("double")
        / F.lit(_PICO)
    )


def fit_logreg(
    df: DataFrame,
    features: dict[str, Column],
    label: Column,
    iters: int = 20,
    lr: float = 1.0,
    l2: float = 1e-3,
) -> dict:
    """Full-batch logistic regression by gradient descent; returns a
    plain-dict model {features, mu, sigma, weights, bias, n, losses}.

    Features are standardized against exactly-computed moments; every
    iteration is one aggregate of pico-quantized gradient terms, so
    the result is independent of partitioning and task order."""
    names = list(features)
    feat = df.select(
        label.cast("double").alias("__y"),
        *[c.alias(f"__f_{n}") for n, c in features.items()],
    )
    feat = feat.localCheckpoint(eager=True)  # featurize once, not per iter

    stats = feat.agg(
        F.count(F.lit(1)).alias("n"),
        *[_exact_sum(F.col(f"__f_{n}")).alias(f"s_{n}") for n in names],
        *[
            _exact_sum(F.col(f"__f_{n}") * F.col(f"__f_{n}")).alias(f"ss_{n}")
            for n in names
        ],
    ).collect()[0]
    n = stats["n"]
    if n == 0:
        raise ValueError("cannot fit on an empty frame")
    mu = {m: stats[f"s_{m}"] / n for m in names}
    sigma = {
        m: math.sqrt(max(stats[f"ss_{m}"] / n - mu[m] * mu[m], 1e-12))
        for m in names
    }

    w = {m: 0.0 for m in names}
    b = 0.0
    losses: list[float] = []
    for _ in range(iters):
        z = [
            ((F.col(f"__f_{m}") - F.lit(mu[m])) / F.lit(sigma[m])).alias(m)
            for m in names
        ]
        zf = feat.select("__y", *z)
        t = F.lit(b)
        for m in names:
            t = t + F.lit(w[m]) * F.col(m)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-t))
        err = p - F.col("__y")
        eps = 1e-12
        loss_term = -(
            F.col("__y") * F.log(p + F.lit(eps))
            + (F.lit(1.0) - F.col("__y")) * F.log(F.lit(1.0) - p + F.lit(eps))
        )
        g = zf.agg(
            _exact_sum(err).alias("g_b"),
            *[_exact_sum(err * F.col(m)).alias(f"g_{m}") for m in names],
            _exact_sum(loss_term).alias("loss"),
        ).collect()[0]
        losses.append(g["loss"] / n)
        b -= lr * g["g_b"] / n
        for m in names:
            w[m] -= lr * (g[f"g_{m}"] / n + l2 * w[m])

    return {
        "features": names,
        "mu": mu,
        "sigma": sigma,
        "weights": w,
        "bias": b,
        "n": n,
        "losses": losses,
    }


def score_logreg(features: dict[str, Column], model: dict) -> Column:
    """Predicted quality probability as a map-only literal-weight
    expression — attach with ``withColumn`` and feed the md5-gated
    keep machinery. Features must be built with the same expressions
    used at fit time."""
    t = F.lit(model["bias"])
    for m in model["features"]:
        z = (features[m] - F.lit(model["mu"][m])) / F.lit(model["sigma"][m])
        t = t + F.lit(model["weights"][m]) * z
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-t))
