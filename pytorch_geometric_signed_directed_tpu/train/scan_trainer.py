"""Whole-training-as-one-XLA-program: scan over epochs, vmap over splits.

The reference's examples run a Python epoch loop with per-epoch host
round-trips (e.g. examples/magnet_node.py:66-71 — forward, backward,
sklearn accuracy on CPU every epoch).  On a TPU — especially a remote /
tunneled one where each dispatch costs ~ms — the idiomatic shape is the
opposite: the FULL training of all splits is one jitted program,

    vmap over splits ( lax.scan over epochs ( step + on-device eval ) )

with validation-based checkpoint selection folded into the scan carry
(track best-val and its test accuracy with a `where`, no param snapshots,
no host syncs).  One device call trains all 10 splits of a headline
dataset; sweeps become cheap enough to run exhaustively.

Works with any full-batch node-classification model; used by the
experiment recipes and the accuracy sweeps.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax


def masked_nll(logp: jnp.ndarray, y: jnp.ndarray,
               mask: jnp.ndarray) -> jnp.ndarray:
    """Mean negative log-likelihood over mask (float [N])."""
    per_node = -logp[jnp.arange(logp.shape[0]), y] * mask
    return per_node.sum() / jnp.maximum(mask.sum(), 1.0)


def _masked_acc(pred, y, mask):
    return ((pred == y) * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def scan_node_training(
    apply_fn: Callable,
    init_fn: Callable,
    y,
    train_masks,
    val_masks,
    test_masks,
    epochs: int,
    tx: optax.GradientTransformation,
    seed: int = 0,
    stochastic: bool = False,
):
    """Train one model per split, entirely on device.

    Args:
        apply_fn: ``(params, training, key) -> logp [N, C]``; ``key`` is
            None unless ``stochastic`` (dropout RNG threading).
        init_fn: ``(key) -> params``.
        y: [N] int labels.
        train_masks/val_masks/test_masks: [S, N] float split masks.
        epochs: scan length.
        tx: optax optimizer.
        stochastic: fold a fresh dropout key per (split, epoch).

    Returns a dict of numpy arrays, per split: ``best_test`` (test acc of
    the best-val epoch), ``best_val``, ``final_test`` (last-epoch test acc
    — the reference example's selection rule), ``final_loss``.
    """
    y = jnp.asarray(y)
    train_masks = jnp.asarray(train_masks, jnp.float32)
    val_masks = jnp.asarray(val_masks, jnp.float32)
    test_masks = jnp.asarray(test_masks, jnp.float32)
    s = train_masks.shape[0]

    def train_one(mask_tr, mask_val, mask_te, key):
        params = init_fn(key)
        opt_state = tx.init(params)

        def loss_fn(p, k):
            logp = apply_fn(p, True, k if stochastic else None)
            return masked_nll(logp, y, mask_tr)

        def epoch(carry, step_i):
            params, opt_state, best_val, best_test = carry
            k = jax.random.fold_in(key, step_i) if stochastic else None
            loss, grads = jax.value_and_grad(loss_fn)(params, k)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            pred = apply_fn(params, False, None).argmax(1)
            vacc = _masked_acc(pred, y, mask_val)
            tacc = _masked_acc(pred, y, mask_te)
            better = vacc > best_val
            best_val = jnp.where(better, vacc, best_val)
            best_test = jnp.where(better, tacc, best_test)
            return (params, opt_state, best_val, best_test), (loss, tacc)

        init = (params, opt_state, jnp.float32(-1.0), jnp.float32(0.0))
        (params, _, best_val, best_test), (losses, taccs) = jax.lax.scan(
            epoch, init, jnp.arange(epochs))
        return best_val, best_test, taccs[-1], losses[-1]

    keys = jax.random.split(jax.random.PRNGKey(seed), s)
    run = jax.jit(jax.vmap(train_one))
    best_val, best_test, final_test, final_loss = run(
        train_masks, val_masks, test_masks, keys)
    return {
        "best_val": np.asarray(best_val),
        "best_test": np.asarray(best_test),
        "final_test": np.asarray(final_test),
        "final_loss": np.asarray(final_loss),
    }
