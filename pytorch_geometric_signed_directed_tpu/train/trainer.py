"""Generic jitted full-batch trainer."""
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import numpy as np
import jax
import optax


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0
    best_metric: float = -np.inf
    best_params: Any = None
    history: Dict[str, list] = field(default_factory=dict)


class Trainer:
    """Full-batch training harness.

    Args:
        loss_fn: (params, *batch) -> scalar loss.  Must be jit-safe.
        lr / weight_decay: Adam(W) settings (the reference examples all use
            torch Adam, e.g. examples/magnet_link.py:60).
    """

    def __init__(self, loss_fn: Callable, lr: float = 1e-3,
                 weight_decay: float = 0.0, optimizer=None,
                 rng: Optional[int] = None):
        """``rng``: seed enabling stochastic losses (dropout) — loss_fn is
        then called as loss_fn(params, key, *batch) with a fresh fold of
        the seed each step."""
        self.loss_fn = loss_fn
        self._base_key = None if rng is None else jax.random.PRNGKey(rng)
        if optimizer is None:
            if weight_decay:
                # coupled L2 like torch.optim.Adam(weight_decay=...): the
                # decay joins the gradient BEFORE the Adam moments (the
                # reference examples use this, not decoupled AdamW)
                optimizer = optax.chain(
                    optax.add_decayed_weights(weight_decay),
                    optax.adam(lr))
            else:
                optimizer = optax.adam(lr)
        self.tx = optimizer

        if self._base_key is None:
            def _step(params, opt_state, step_i, *batch):
                loss, grads = jax.value_and_grad(loss_fn)(params, *batch)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss
        else:
            def _step(params, opt_state, step_i, *batch):
                key = jax.random.fold_in(self._base_key, step_i)
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, key, *batch)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss

        self._step = jax.jit(_step)

    def init(self, params) -> TrainState:
        return TrainState(params=params, opt_state=self.tx.init(params))

    def step(self, state: TrainState, *batch) -> float:
        state.params, state.opt_state, loss = self._step(
            state.params, state.opt_state, state.step, *batch)
        state.step += 1
        return float(loss)

    def step_async(self, state: TrainState, *batch):
        """Like step() but returns the loss as a device array without a
        host sync — keeps the device pipeline full (a per-step float()
        costs a full host round-trip, which dominates on remote/tunneled
        backends)."""
        state.params, state.opt_state, loss = self._step(
            state.params, state.opt_state, state.step, *batch)
        state.step += 1
        return loss

    def fit(self, state: TrainState, batch_fn: Callable[[], tuple],
            epochs: int, eval_fn: Optional[Callable] = None,
            eval_every: int = 10, patience: Optional[int] = None,
            verbose: bool = False, best_on_host: bool = True) -> TrainState:
        """batch_fn() -> loss args per step (host-side sampling lives here);
        eval_fn(params) -> float metric (higher is better).

        ``best_on_host``: keep the best-metric param snapshot in host
        memory instead of HBM — at giant-graph scale an extra param pytree
        on device competes with the streamed message blocks for HBM, and
        the copy only happens on improvement."""
        bad = 0
        t0 = time.perf_counter()
        raw_losses = []
        for epoch in range(epochs):
            # async: losses stay on device until the end of fit
            loss = self.step_async(state, *batch_fn())
            raw_losses.append(loss)
            if eval_fn is not None and (epoch + 1) % eval_every == 0:
                metric = float(eval_fn(state.params))
                state.history.setdefault("metric", []).append(metric)
                if metric > state.best_metric:
                    state.best_metric = metric
                    state.best_params = (jax.device_get(state.params)
                                         if best_on_host else state.params)
                    bad = 0
                else:
                    bad += 1
                if verbose:
                    print(f"epoch {epoch + 1}: loss {loss:.4f} "
                          f"metric {metric:.4f}")
                if patience is not None and bad >= patience:
                    break
        state.history.setdefault("loss", []).extend(
            float(l) for l in raw_losses)
        state.history["seconds"] = time.perf_counter() - t0
        return state


def train_full_batch(loss_fn, params, batch_fn, epochs, lr=1e-3,
                     weight_decay=0.0, eval_fn=None, eval_every=10,
                     patience=None, verbose=False) -> TrainState:
    trainer = Trainer(loss_fn, lr, weight_decay)
    state = trainer.init(params)
    return trainer.fit(state, batch_fn, epochs, eval_fn, eval_every,
                       patience, verbose)
