"""DiGCL helpers: feature dropout + sklearn logistic-regression evaluation.

Reference: utils/directed/DiGCL_utils.py:11-111.
"""
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


def drop_feature(x: jnp.ndarray, drop_prob: float,
                 rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Zero whole feature columns with probability drop_prob (jit-safe when
    passed a jax PRNG key)."""
    if rng is None:
        rng = jax.random.PRNGKey(np.random.default_rng().integers(2 ** 31))
    mask = jax.random.uniform(rng, (x.shape[1],)) < drop_prob
    return jnp.where(mask[None, :], 0.0, x)


def _fit_logreg(X_train, y_train):
    import os

    from sklearn.linear_model import LogisticRegression
    from sklearn.model_selection import GridSearchCV
    from sklearn.multiclass import OneVsRestClassifier

    logreg = LogisticRegression(solver="liblinear")
    c = 2.0 ** np.arange(-10, 10)
    # Cap the grid-search fan-out at the host's actual core count: liblinear
    # fits are tiny and oversubscription (the reference hard-codes n_jobs=8)
    # only adds process churn on small hosts.
    clf = GridSearchCV(estimator=OneVsRestClassifier(logreg),
                       param_grid=dict(estimator__C=c),
                       n_jobs=min(8, os.cpu_count() or 1), cv=5,
                       verbose=0)
    clf.fit(X_train, y_train)
    return clf


def _onehot(y):
    from sklearn.preprocessing import OneHotEncoder

    y = np.asarray(y).reshape(-1, 1)
    return OneHotEncoder(categories="auto").fit(y).transform(y).toarray().astype(bool)


def pred_digcl_node(embeddings, y, train_index, test_index=None):
    from sklearn.preprocessing import normalize

    X = normalize(np.asarray(embeddings), norm="l2")
    Y = _onehot(y)
    clf = _fit_logreg(X[train_index], Y[train_index])
    y_pred = np.argmax(clf.predict(X), axis=1)
    return y_pred if test_index is None else y_pred[test_index]


def pred_digcl_link(embeddings, y, train_index, test_index):
    from sklearn.preprocessing import normalize

    X = normalize(np.asarray(embeddings), norm="l2")
    Y = _onehot(y)
    train_index = np.asarray(train_index)
    test_index = np.asarray(test_index)
    X_train = np.c_[X[train_index[:, 0]], X[train_index[:, 1]]]
    clf = _fit_logreg(X_train, Y)
    X_test = np.c_[X[test_index[:, 0]], X[test_index[:, 1]]]
    return np.argmax(clf.predict(X_test), axis=1)
