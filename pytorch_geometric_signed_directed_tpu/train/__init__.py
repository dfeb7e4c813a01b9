"""Training utilities: the layer the reference keeps in examples/.

The reference has no importable trainer (SURVEY.md §1 — its examples are
the de-facto train layer).  Here the common full-batch loop (optax Adam,
jitted step, early stopping, timing) is a small library so examples stay
thin and every model family trains the same way on TPU.
"""

from .trainer import Trainer, TrainState, train_full_batch

__all__ = ["Trainer", "TrainState", "train_full_batch"]
