"""sklearn logistic-regression evaluation on frozen embeddings.

Reference: utils/signed/link_sign_prediction_logistic_function.py:7-46 and
utils/general/link_sign_direction_prediction_logistic_function.py:7-40.
Host-side by design (the reference also evaluates on CPU each epoch).
"""
from typing import Tuple, Union

import numpy as np


def _edge_features(embeddings, pairs):
    pairs = np.asarray(pairs)
    return np.concatenate(
        [embeddings[pairs[:, 0]], embeddings[pairs[:, 1]]], axis=1)


def link_sign_prediction_logistic_function(
    embeddings: np.ndarray, train_X, train_y, test_X, test_y,
    class_weight: Union[dict, str, None] = None,
) -> Tuple[float, float, float, float, float]:
    """Returns (accuracy, binary-F1, macro-F1, micro-F1, AUC)."""
    from sklearn import linear_model, metrics

    embeddings = np.asarray(embeddings)
    clf = linear_model.LogisticRegression(
        solver="lbfgs", max_iter=1000, class_weight=class_weight)
    clf.fit(_edge_features(embeddings, train_X), np.asarray(train_y))
    test_feats = _edge_features(embeddings, test_X)
    pred = clf.predict(test_feats)
    pred_p = clf.predict_proba(test_feats)
    test_y = np.asarray(test_y)
    return (
        metrics.accuracy_score(test_y, pred),
        metrics.f1_score(test_y, pred),
        metrics.f1_score(test_y, pred, average="macro"),
        metrics.f1_score(test_y, pred, average="micro"),
        metrics.roc_auc_score(test_y, pred_p[:, 1]),
    )


def link_sign_direction_prediction_logistic_function(
    embeddings: np.ndarray, train_X, train_y, test_X, test_y,
    class_weight: Union[dict, str, None] = None,
) -> Tuple[float, float, float]:
    """Multi-class variant; returns (accuracy, macro-F1, micro-F1)."""
    from sklearn import linear_model, metrics

    embeddings = np.asarray(embeddings)
    clf = linear_model.LogisticRegression(
        solver="lbfgs", max_iter=1000, class_weight=class_weight)
    clf.fit(_edge_features(embeddings, train_X), np.asarray(train_y))
    pred = clf.predict(_edge_features(embeddings, test_X))
    test_y = np.asarray(test_y)
    return (
        metrics.accuracy_score(test_y, pred),
        metrics.f1_score(test_y, pred, average="macro"),
        metrics.f1_score(test_y, pred, average="micro"),
    )
