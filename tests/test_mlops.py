import pyspark.sql.functions as F
import pytest

from vectorsearchutil_spark.operators.mlops import mlp_classifier, mlp_regressor
from vectorsearchutil_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def test_classifier_scores_all_rows(emb):
    fit = mlp_classifier(emb, y_col="label", vector_col="embedding", id_col="vec_id")
    assert fit.metric_name == "accuracy"
    assert 0.0 <= fit.metric_value <= 1.0
    scored = fit.scored
    assert scored.count() == emb.count()
    row = scored.first()
    assert "prediction" in scored.columns
    assert len(row["proba"]) == 10  # one probability per class
    assert abs(sum(row["proba"]) - 1.0) < 1e-6


def test_classifier_string_labels(emb):
    # ADVICE r1: sklearn's fit accepts string labels — so must we.
    # Predictions come back in the original (string) label domain.
    named = emb.withColumn("label", F.concat(F.lit("cls_"), F.col("label")))
    fit = mlp_classifier(named, y_col="label", vector_col="embedding", id_col="vec_id")
    preds = {r["prediction"] for r in fit.scored.select("prediction").collect()}
    assert preds <= {f"cls_{i}" for i in range(10)}
    assert len(fit.scored.first()["proba"]) == 10


def test_classifier_noncontiguous_int_labels(emb):
    # labels {100, 107} must not size a 108-way output layer
    shifted = emb.withColumn(
        "label", (F.col("label") % 2) * 7 + 100
    )
    fit = mlp_classifier(shifted, y_col="label", vector_col="embedding", id_col="vec_id")
    preds = {r["prediction"] for r in fit.scored.select("prediction").collect()}
    assert preds <= {100, 107}
    assert len(fit.scored.first()["proba"]) == 2


def test_classifier_rejects_single_class(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 0.0], 5) for i in range(10)], ["id", "vector", "y"]
    )
    with pytest.raises(ValueError, match="class"):
        mlp_classifier(df, y_col="y", vector_col="vector", id_col="id")


def test_regressor_scores_all_rows(emb):
    fit = mlp_regressor(emb, y_col="label", vector_col="embedding", id_col="vec_id")
    assert fit.metric_name == "r2"
    scored = fit.scored
    assert scored.count() == emb.count()
    assert all(r["prediction"] is not None for r in scored.select("prediction").collect())


def test_regressor_learns_linear_signal(spark):
    # y = first component: a signal the MLP must capture (sanity that
    # the numpy fallback actually optimizes)
    import numpy as np

    rng = np.random.RandomState(0)
    X = rng.randn(400, 8)
    y = X[:, 0] * 3.0 + 1.0
    rows = [(i, [float(v) for v in X[i]], float(y[i])) for i in range(400)]
    df = spark.createDataFrame(rows, ["id", "vector", "y"])
    fit = mlp_regressor(df, y_col="y", vector_col="vector", id_col="id")
    assert fit.metric_value > 0.8


def test_mlp_golden_contract_gates(spark, sf_dir, monkeypatch, tmp_path):
    """VERDICT r2 #4: the MLP queries self-assert a committed golden
    (rows + md5 of sorted predictions). Clean run passes; a tampered
    golden must raise — proving the driver's rows-check now sits
    behind a real correctness gate."""
    import json
    import os
    import shutil

    from vectorsearchutil_spark import queries as Q

    monkeypatch.delenv("VSU_SKIP_MLP_GOLDEN", raising=False)
    # clean pass at the committed sf0.001 golden
    out = Q.QUERIES["mlp_regressor_predictions"](spark, sf_dir)
    assert out.count() == 500

    # tamper: point the module at a golden with a wrong md5
    golden_path = os.path.join(
        os.path.dirname(Q.__file__), "mlp_golden.json"
    )
    with open(golden_path) as fh:
        golden = json.load(fh)
    key = os.path.basename(sf_dir.rstrip("/"))
    bad = json.loads(json.dumps(golden))
    bad[key]["mlp_regressor_predictions"]["md5"] = "0" * 32
    backup = tmp_path / "golden.bak"
    shutil.copy(golden_path, backup)
    try:
        with open(golden_path, "w") as fh:
            json.dump(bad, fh)
        with pytest.raises(AssertionError, match="golden contract"):
            Q.QUERIES["mlp_regressor_predictions"](spark, sf_dir)
    finally:
        shutil.copy(backup, golden_path)


# ------------------------------------------------- distributed logreg


def _train_weights(df, **kw):
    from vectorsearchutil_spark.operators.mlops import (
        logreg_train_fixed_point,
    )

    return {
        r["i"]: r["weight"]
        for r in logreg_train_fixed_point(df, **kw).collect()
    }


def test_logreg_partitioning_invariant_bitwise(emb):
    """Fixed-point gradient sums: the trained weights are
    bit-identical under any partitioning (the PageRank contract)."""
    data = emb.select(
        "embedding",
        F.when(F.col("label") == 0, 1.0).otherwise(0.0).alias("y"),
    )
    w1 = _train_weights(data, iters=3)
    w3 = _train_weights(data.repartition(32), iters=3)
    w4 = _train_weights(data.repartition(3, "y"), iters=3)
    assert w1 == w3 == w4  # exact float equality, not approx


def test_logreg_learns_planted_signal(spark):
    """On a linearly separable planted signal, training must move
    scores in the right direction: positives score above negatives
    and the feature weight has the planted sign."""
    rows = [
        ([1.0 if i % 2 else -1.0, ((i * 7) % 13) / 13.0],
         1.0 if i % 2 else 0.0)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "embedding array<double>, y double")
    w = _train_weights(df, iters=5, lr=0.5)
    # i=1 bias, i=2 the separating dim, i=3 noise
    assert w[2] > 0.05
    assert abs(w[3]) < w[2] / 2
    # loss decreases vs the zero-weight start: mean |resid| under the
    # trained model beats 0.5 (the w=0 prediction is s=0.5 for all)
    import numpy as np

    X = np.array([[1.0, *r[0]] for r in rows])
    y = np.array([r[1] for r in rows])
    z = np.zeros(len(X))
    for k in range(3):
        z = z + X[:, k] * w[k + 1]
    s = 0.5 * (1.0 + z / (1.0 + np.abs(z)))
    assert np.mean(np.abs(s - y)) < 0.5


def test_logreg_edge_inputs(spark):
    from vectorsearchutil_spark.operators.mlops import (
        logreg_train_fixed_point,
    )

    empty = spark.createDataFrame([], "embedding array<double>, y double")
    with pytest.raises(ValueError, match="empty"):
        logreg_train_fixed_point(empty)
    # iters=0 returns the zero vector (d+1 rows, all 0.0)
    one = spark.createDataFrame(
        [([1.0, 2.0], 1.0)], "embedding array<double>, y double"
    )
    w = _train_weights(one, iters=0)
    assert w == {1: 0.0, 2: 0.0, 3: 0.0}


# ------------------------------------------------- grouped OLS trend


def test_ols_trend_recovers_planted_slope(spark):
    """y = 2.5·day + 10 exactly → slope 2.5, intercept 10 (within
    the declared 2^-12 quantization bias); flat group → slope 0;
    single-x group → NULL slope."""
    from vectorsearchutil_spark.operators.mlops import ols_trend_by_group

    us_day = 86_400_000_000
    rows = (
        [("lin", i * us_day, 10.0 + 2.5 * i) for i in range(50)]
        + [("flat", i * us_day, 7.0) for i in range(50)]
        + [("point", 0, 3.0), ("point", 0, 5.0)]
    )
    df = spark.createDataFrame(rows, "g string, x long, y double")
    got = {
        r["g"]: (r["slope_per_unit"], r["intercept"])
        for r in ols_trend_by_group(df, "g", "x", "y").collect()
    }
    assert abs(got["lin"][0] - 2.5) < 1e-3
    assert abs(got["lin"][1] - 10.0) < 0.05
    assert abs(got["flat"][0]) < 1e-3
    assert got["point"][0] is None and got["point"][1] is None


def test_ols_trend_partitioning_invariant_bitwise(spark):
    from vectorsearchutil_spark.operators.mlops import ols_trend_by_group

    rows = [
        ("g" + str(i % 3), i * 1_000_000, ((i * 37) % 101) / 7.0)
        for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "g string, x long, y double")
    a = {
        r["g"]: (r["slope_per_unit"], r["intercept"])
        for r in ols_trend_by_group(df, "g", "x", "y").collect()
    }
    b = {
        r["g"]: (r["slope_per_unit"], r["intercept"])
        for r in ols_trend_by_group(
            df.repartition(17), "g", "x", "y"
        ).collect()
    }
    assert a == b  # exact equality — fixed-point sums
