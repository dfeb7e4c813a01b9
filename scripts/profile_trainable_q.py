"""Break down the trainable-q vs frozen-q MagNet step on the TPU.

VERDICT r2 item 4: the bench ratio sits at 1.44-1.51 vs the <=1.40 bar.
This script times, at the bench config (N=65536, avg_deg=30, K=2, layer=2,
mxu tier):

  * frozen fwd-only / fwd+bwd step
  * trainable fwd-only / fwd+bwd step
  * isolated: one dual apply frozen vs trainable (fwd, and grad wrt x+q)
  * the elementwise value rebuild alone (cos/sin over E2 edges)

Run: python scripts/profile_trainable_q.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax


def sync_time(fn, *args, steps=30):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(steps):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / steps


def main():
    from pytorch_geometric_signed_directed_tpu.ops.spmm import (
        set_matmul_precision, set_message_dtype)

    # match bench.py's training precision (bf16 messages; f32 accumulate)
    set_matmul_precision("default")
    set_message_dtype("bf16")

    from pytorch_geometric_signed_directed_tpu.nn import (
        MagNet_node_classification)
    from pytorch_geometric_signed_directed_tpu.spectral import (
        magnet_propagators, magnetic_template)
    from pytorch_geometric_signed_directed_tpu.spectral.magnetic import (
        template_dual_apply)

    n, avg_deg = 65536, 30
    e = n * avg_deg
    rng = np.random.default_rng(0)
    ei = np.vstack([rng.integers(0, n, e), rng.integers(0, n, e)])
    w = np.ones(e, np.float32)
    x = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 5, n))

    pair = magnet_propagators(ei, w, q=0.25, num_nodes=n, mode="auto")
    tmpl = magnetic_template(ei, w, num_nodes=n, mode="auto")
    print("tier:", tmpl.mode, "| backend:", jax.default_backend())

    def mk(model, lap):
        def loss_fn(p):
            logp = model.apply(p, x, x, lap)
            return -jnp.mean(logp[jnp.arange(n), y])
        params = model.init(jax.random.PRNGKey(0), x, x, lap)
        tx = optax.adam(1e-3)
        st = tx.init(params)

        @jax.jit
        def step(p, s):
            l, g = jax.value_and_grad(loss_fn)(p)
            u, s = tx.update(g, s, p)
            return optax.apply_updates(p, u), s, l

        fwd = jax.jit(loss_fn)
        return fwd, step, params, st

    kw = dict(num_features=2, hidden=32, K=2, label_dim=5,
              activation=True, layer=2)
    m_f = MagNet_node_classification(**kw)
    m_q = MagNet_node_classification(**kw, trainable_q=True)

    fwd_f, step_f, p_f, s_f = mk(m_f, pair)
    fwd_q, step_q, p_q, s_q = mk(m_q, tmpl)

    t_fwd_f = sync_time(fwd_f, p_f)
    t_fwd_q = sync_time(fwd_q, p_q)
    t_step_f = sync_time(lambda p, s: step_f(p, s)[2], p_f, s_f)
    t_step_q = sync_time(lambda p, s: step_q(p, s)[2], p_q, s_q)
    print(f"fwd   frozen {t_fwd_f*1e3:8.3f} ms   trainable {t_fwd_q*1e3:8.3f} ms"
          f"   ratio {t_fwd_q/t_fwd_f:.3f}")
    print(f"step  frozen {t_step_f*1e3:8.3f} ms   trainable {t_step_q*1e3:8.3f} ms"
          f"   ratio {t_step_q/t_step_f:.3f}")
    print(f"bwd-only (step-fwd diff) frozen {(t_step_f-t_fwd_f)*1e3:8.3f} ms"
          f"  trainable {(t_step_q-t_fwd_q)*1e3:8.3f} ms"
          f"   ratio {(t_step_q-t_fwd_q)/(t_step_f-t_fwd_f):.3f}")

    # isolated single dual apply, F=32 lane-stacked (the in-model shape)
    v = jnp.asarray(rng.standard_normal((n, 64)).astype(np.float32))
    D = pair.dual
    from pytorch_geometric_signed_directed_tpu.ops.spmm import (
        dual_spmm_stacked)

    ap_f = jax.jit(lambda v: dual_spmm_stacked(D, v))
    ap_q = jax.jit(lambda v: template_dual_apply(tmpl, jnp.float32(0.25), v))
    g_f = jax.jit(jax.grad(lambda v: (dual_spmm_stacked(D, v) ** 2).sum()))
    g_q = jax.jit(jax.grad(
        lambda v, q: (template_dual_apply(tmpl, q, v) ** 2).sum(),
        argnums=(0, 1)))

    t_ap_f = sync_time(ap_f, v)
    t_ap_q = sync_time(ap_q, v)
    t_g_f = sync_time(g_f, v)
    t_g_q = sync_time(lambda v: g_q(v, jnp.float32(0.25)), v)
    print(f"apply fwd  frozen {t_ap_f*1e3:8.3f} ms  trainable {t_ap_q*1e3:8.3f}"
          f" ms  ratio {t_ap_q/t_ap_f:.3f}")
    print(f"apply grad frozen {t_g_f*1e3:8.3f} ms  trainable {t_g_q*1e3:8.3f}"
          f" ms  ratio {t_g_q/t_g_f:.3f}")

    # elementwise value rebuild alone
    reb = jax.jit(lambda q: (-tmpl.a_norm * jnp.cos(2 * jnp.pi * q * tmpl.theta),
                             tmpl.a_norm * jnp.sin(2 * jnp.pi * q * tmpl.theta)))
    t_reb = sync_time(reb, jnp.float32(0.25))
    ne = tmpl.a_norm.size
    print(f"value rebuild (E2={ne}): {t_reb*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
