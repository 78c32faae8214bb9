"""Adapter-seam tests (reference tests/test_classify.py:95-152 pattern:
wrap an external kernel, fit on labeled pairs, predict).

No sklearn/keras in this container, so the kernels are hand-rolled
numpy objects — which is the point: the adapter contract is duck-typed
(fit/predict/predict_proba), not sklearn-bound. The load-bearing claim
tested here is that DISTRIBUTED inference (broadcast kernel +
mapInPandas) is exactly the kernel's own driver-side answer.
"""

import numpy as np
import pytest

from recordlinkage_spark.adapters import (
    KerasModelAdapter,
    SKLearnClassifierAdapter,
)
from recordlinkage_spark.datagen import binary_vectors

M = [0.92, 0.81, 0.85, 0.90, 0.99, 0.70, 0.56]
U = [0.19, 0.23, 0.50, 0.11, 0.20, 0.14, 0.50]


class NumpyLogReg:
    """sklearn-style kernel: fit/predict/predict_proba/classes_."""

    def __init__(self, iters=50):
        self.iters = iters
        self.beta = None
        self.classes_ = [0, 1]

    def fit(self, X, y):
        Xb = np.hstack([np.ones((len(X), 1)), X])
        beta = np.zeros(Xb.shape[1])
        for _ in range(self.iters):
            p = 1.0 / (1.0 + np.exp(-Xb @ beta))
            W = p * (1 - p) + 1e-9
            H = (Xb * W[:, None]).T @ Xb + 1e-6 * np.eye(Xb.shape[1])
            beta += np.linalg.solve(H, Xb.T @ (y - p))
        self.beta = beta
        return self

    def predict_proba(self, X):
        Xb = np.hstack([np.ones((len(X), 1)), X])
        p = 1.0 / (1.0 + np.exp(-Xb @ self.beta))
        return np.column_stack([1 - p, p])

    def predict(self, X):
        return (self.predict_proba(X)[:, 1] > 0.5).astype(int)


class NumpyCentroids:
    """Unsupervised kernel: fit(X) only, predict by nearest centroid —
    the SKLearnAdapter unsupervised branch (adapters.py:48-52)."""

    def fit(self, X):
        order = np.argsort(X.sum(axis=1))
        lo, hi = X[order[: len(X) // 2]], X[order[len(X) // 2:]]
        self.centroids = np.vstack([lo.mean(axis=0), hi.mean(axis=0)])
        return self

    def predict(self, X):
        d = ((X[:, None, :] - self.centroids[None]) ** 2).sum(axis=2)
        return np.argmin(d, axis=1).astype(int)


class FakeKeras:
    """Keras-flavor stand-in: predict -> (n, 1) match probs."""

    def fit(self, X, y):
        self.w = (X[y == 1].mean(axis=0) - X[y == 0].mean(axis=0))
        self.b = -float(self.w @ X.mean(axis=0))
        return self

    def predict(self, X):
        return (1.0 / (1.0 + np.exp(-(X @ self.w + self.b))))[:, None]


@pytest.fixture(scope="module")
def vectors(spark):
    return binary_vectors(spark, n=4000, n_match=800, m=M, u=U, random_state=535)


def test_sklearn_adapter_matches_driver_side_kernel(spark, vectors):
    feats, truth = vectors
    clf = SKLearnClassifierAdapter(NumpyLogReg(), pickle_by_value=True)
    out = clf.fit_predict(feats, truth).orderBy("id_1", "id_2").collect()

    cols = [c for c in feats.columns if c not in ("id_1", "id_2")]
    local = feats.orderBy("id_1", "id_2").collect()
    X = np.array([[float(r[c]) for c in cols] for r in local])
    want_label = clf.kernel.predict(X)
    want_score = clf.kernel.predict_proba(X)[:, 1]

    assert [r["label"] for r in out] == want_label.tolist()
    np.testing.assert_allclose([r["score"] for r in out], want_score, rtol=1e-12)
    # and it actually separates: high recall on the planted matches
    got = {(r["id_1"], r["id_2"]) for r in out if r["label"] == 1}
    true = {(r["id_1"], r["id_2"]) for r in truth.collect()}
    assert len(got & true) / len(true) > 0.85


def test_sklearn_adapter_unsupervised_branch(spark, vectors):
    feats, truth = vectors
    out = SKLearnClassifierAdapter(NumpyCentroids(), pickle_by_value=True).fit_predict(feats)
    rows = out.collect()
    # the kernel's median split labels ~half the rows 1; what matters is
    # that fit(X) (no y) ran and the high-agreement cluster captures the
    # planted matches
    got = {(r["id_1"], r["id_2"]) for r in rows if r["label"] == 1}
    true = {(r["id_1"], r["id_2"]) for r in truth.collect()}
    assert len(got & true) / len(true) > 0.9
    assert {r["label"] for r in rows} == {0, 1}


def test_keras_adapter_prob_column_zero(spark, vectors):
    feats, truth = vectors
    clf = KerasModelAdapter(FakeKeras(), pickle_by_value=True)
    out = clf.fit_predict(feats, truth)
    rows = out.collect()
    # score IS column 0 of predict(); label is the 0.5 cut of it
    assert all((r["score"] > 0.5) == (r["label"] == 1) for r in rows)
    got = {(r["id_1"], r["id_2"]) for r in rows if r["label"] == 1}
    true = {(r["id_1"], r["id_2"]) for r in truth.collect()}
    assert len(got & true) / len(true) > 0.85


def test_train_count_gate_trips(spark, vectors):
    feats, truth = vectors
    clf = SKLearnClassifierAdapter(NumpyLogReg(), max_train_rows=100)
    with pytest.raises(ValueError, match="sample"):
        clf.fit(feats, truth)


def test_zero_match_training_raises(spark, vectors):
    feats, _ = vectors
    empty_truth = feats.select("id_1", "id_2").limit(0)
    with pytest.raises(ValueError, match="zero matches"):
        SKLearnClassifierAdapter(NumpyLogReg(), pickle_by_value=True).fit(feats, empty_truth)


def test_supervised_fit_nulls_become_nan(spark):
    """A null feature value must reach the wrapped model as NaN like the
    unsupervised path, not crash with float(None) (session-8 review fix)."""
    import numpy as np

    from recordlinkage_spark.adapters import SKLearnClassifierAdapter

    class CaptureModel:
        def fit(self, X, y):
            self.X = X
            return self

        def predict(self, X):
            return np.zeros(len(X))

    feats = spark.createDataFrame(
        [(1, 2, 1.0), (3, 4, None)], "id_1 int, id_2 int, f_a double"
    )
    truth = spark.createDataFrame([(1, 2)], "id_1 int, id_2 int")
    model = CaptureModel()
    SKLearnClassifierAdapter(model).fit(feats, truth)
    assert np.isnan(model.X).sum() == 1
