"""Trainer harness, checkpoint round-trip, profiling timer."""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from pytorch_geometric_signed_directed_tpu.train import (
    Trainer,
    edges_per_second,
    restore_checkpoint,
    save_checkpoint,
    time_fn,
)


class _Lin(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(1)(x)


def _setup():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((64, 4)),
                    jnp.float32)
    y = (x @ jnp.asarray([1.0, -2.0, 0.5, 0.0]))[:, None]
    model = _Lin()
    params = model.init(jax.random.PRNGKey(0), x)

    def loss_fn(p):
        return jnp.mean((model.apply(p, x) - y) ** 2)

    return model, params, loss_fn


def test_trainer_converges():
    model, params, loss_fn = _setup()
    trainer = Trainer(loss_fn, lr=1e-1)
    state = trainer.fit(trainer.init(params), tuple, epochs=200)
    assert state.history["loss"][-1] < 1e-2
    assert state.step == 200


def test_early_stopping():
    model, params, loss_fn = _setup()
    trainer = Trainer(loss_fn, lr=1e-1)
    calls = []

    def eval_fn(p):
        calls.append(1)
        return -float(loss_fn(p))  # improves then saturates

    state = trainer.fit(trainer.init(params), tuple, epochs=5000,
                        eval_fn=eval_fn, eval_every=10, patience=3)
    assert state.step < 5000
    assert state.best_params is not None


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    model, params, loss_fn = _setup()
    trainer = Trainer(loss_fn, lr=1e-1)
    state = trainer.fit(trainer.init(params), tuple, epochs=20)
    target = save_checkpoint(str(tmp_path / "ckpt"), state)
    restored = restore_checkpoint(str(tmp_path / "ckpt"), state)
    assert restored.step == state.step
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # resume training from the restored state
    loss = trainer.step(restored)
    assert np.isfinite(loss)


def test_time_fn_and_edges_per_second():
    f = jax.jit(lambda x: x * 2)
    x = jnp.ones((128, 128))
    dt = time_fn(f, x, iters=5)
    assert dt > 0
    eps = edges_per_second(f, 1000, x, iters=5)
    assert eps > 0


def test_weight_decay_is_coupled_l2():
    """Trainer(weight_decay=wd) must match torch-Adam coupled L2:
    equivalent to adam on loss + wd/2*||p||^2 (gradient-coupled), not
    decoupled AdamW."""
    import optax

    w0 = jnp.asarray([2.0])
    wd, lr = 0.1, 0.05

    def loss_fn(p):
        return jnp.sum(p["w"] ** 2)

    t = Trainer(loss_fn, lr=lr, weight_decay=wd)
    s = t.init({"w": w0})
    t.step(s)
    # reference: adam on gradient g + wd*p
    ref = optax.adam(lr)
    rs = ref.init({"w": w0})
    g = {"w": 2 * w0 + wd * w0}
    upd, _ = ref.update(g, rs)
    expect = optax.apply_updates({"w": w0}, upd)
    np.testing.assert_allclose(np.asarray(s.params["w"]),
                               np.asarray(expect["w"]), rtol=1e-6)


def test_trainer_rng_stochastic_loss():
    """Trainer(rng=...) threads a per-step key into loss_fn(params, key, ...)."""
    import optax
    from pytorch_geometric_signed_directed_tpu.train import Trainer

    seen = []

    def loss_fn(p, key, scale):
        noise = jax.random.normal(key, ())
        seen.append(True)
        return (p["w"] ** 2).sum() * scale + 0.0 * noise + noise ** 2

    tr = Trainer(loss_fn, lr=1e-2, rng=0)
    state = tr.init({"w": jnp.ones(4)})
    l1 = tr.step(state, jnp.float32(1.0))
    l2 = tr.step(state, jnp.float32(1.0))
    assert np.isfinite(l1) and np.isfinite(l2)
    # different fold each step -> different noise contribution
    assert l1 != l2
