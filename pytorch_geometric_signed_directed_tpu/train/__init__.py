"""Training utilities: the layer the reference keeps in examples/.

The reference has no importable trainer (SURVEY.md §1 — its examples are
the de-facto train layer).  Here the common full-batch loop (optax Adam,
jitted step, early stopping, timing) is a small library so examples stay
thin and every model family trains the same way on TPU.
"""

from .trainer import Trainer, TrainState, train_full_batch
from .checkpoint import restore_checkpoint, save_checkpoint
from .profiling import edges_per_second, time_fn, trace
from .scan_trainer import masked_nll, scan_node_training

__all__ = [
    "Trainer",
    "TrainState",
    "train_full_batch",
    "masked_nll",
    "scan_node_training",
    "save_checkpoint",
    "restore_checkpoint",
    "edges_per_second",
    "time_fn",
    "trace",
]
