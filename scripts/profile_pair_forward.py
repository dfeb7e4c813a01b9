"""Micro-breakdown of the trainable-q apply-grad overhead (VERDICT r3 #1).

profile_trainable_q.py showed: apply fwd at parity (1.001), apply grad
1.274 (28.5 -> 36.3 ms), step ratio 1.45.  This isolates where the
+7.8 ms per apply-grad lives at the bench config (N=65536, E2~4.19M,
f2=64, bf16 messages, mxu tier):

  * frozen dual fwd (precomputed values)      -- the baseline pass
  * pair fwd "vals" only (values rebuilt)     -- rebuild overhead
  * pair fwd "both" (4F lanes fused)          -- lane-widening overhead
  * bare scatter_sum on precomputed [E2,128]  -- kernel cost at 128 lanes
  * bare scatter_sum on precomputed [E2,64]   -- kernel cost at 64 lanes
  * transposed apply (the bwd's dx op)
  * fused dual_scatter_sddmm bwd (the orphaned r2 design) for comparison

Run: python scripts/profile_pair_forward.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


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
        set_matmul_precision, set_message_dtype, get_matmul_precision,
        dual_spmm_stacked)
    from pytorch_geometric_signed_directed_tpu.spectral import (
        magnet_propagators, magnetic_template)
    from pytorch_geometric_signed_directed_tpu.spectral.magnetic import (
        _template_pair_forward, template_dual, _dual_forward_stacked,
        template_dual_apply)
    from pytorch_geometric_signed_directed_tpu.ops.pallas import scatter_mxu

    set_matmul_precision("default")
    set_message_dtype("bf16")

    n, avg_deg = 65536, 30
    e = n * avg_deg
    rng = np.random.default_rng(0)
    ei = np.vstack([rng.integers(0, n, e), rng.integers(0, n, e)])
    w = np.ones(e, np.float32)

    pair = magnet_propagators(ei, w, q=0.25, num_nodes=n, mode="auto")
    tmpl = magnetic_template(ei, w, num_nodes=n, mode="auto")
    print("tier:", tmpl.mode, "| backend:", jax.default_backend(),
          "| E2:", tmpl.a_norm.size, "| col-split:", tmpl.hot_ids is not None)

    x = jnp.asarray(rng.standard_normal((n, 64)).astype(np.float32))
    q = jnp.float32(0.25)

    t_frozen = sync_time(jax.jit(lambda v: dual_spmm_stacked(pair.dual, v)), x)
    t_tmpl_frozen = sync_time(
        jax.jit(lambda v: _dual_forward_stacked(template_dual(tmpl, q), v)), x)
    t_vals = sync_time(
        jax.jit(lambda v: _template_pair_forward(tmpl, q, v)[0]), x)
    t_both = sync_time(
        jax.jit(lambda v: _template_pair_forward(tmpl, q, v)), x)
    print(f"frozen dual fwd (precomputed vals) {t_frozen*1e3:8.3f} ms")
    print(f"template fwd (vals rebuilt)        {t_tmpl_frozen*1e3:8.3f} ms")
    print(f"pair fwd, y only (XLA DCEs y')     {t_vals*1e3:8.3f} ms")
    print(f"pair fwd, y and y' (4F lanes)      {t_both*1e3:8.3f} ms")

    # bare kernel at both widths with plan-ordered precomputed msgs
    if tmpl.plan is not None and tmpl.hot_ids is None:
        m64 = jnp.asarray(
            rng.standard_normal((tmpl.a_norm.size, 64)), jnp.bfloat16)
        m128 = jnp.asarray(
            rng.standard_normal((tmpl.a_norm.size, 128)), jnp.bfloat16)
        k64 = sync_time(jax.jit(
            lambda m: scatter_mxu.scatter_sum(tmpl.plan, m)), m64)
        k128 = sync_time(jax.jit(
            lambda m: scatter_mxu.scatter_sum(tmpl.plan, m)), m128)
        print(f"bare scatter_sum 64 lanes          {k64*1e3:8.3f} ms")
        print(f"bare scatter_sum 128 lanes         {k128*1e3:8.3f} ms")
        g64 = sync_time(jax.jit(lambda v: v[tmpl.col]), x)
        print(f"bare gather x[col] [E2,64]         {g64*1e3:8.3f} ms")

    # the bwd's dx op: transposed apply of the cotangent
    g = jnp.asarray(rng.standard_normal((n, 64)).astype(np.float32))
    t_bwd_dx = sync_time(jax.jit(
        lambda v: _dual_forward_stacked(template_dual(tmpl, q).transposed, v)),
        g)
    print(f"bwd dx (transposed apply)          {t_bwd_dx*1e3:8.3f} ms")

    # full current apply-grad for reference
    t_grad = sync_time(jax.jit(jax.grad(
        lambda v, qq: (template_dual_apply(tmpl, qq, v) ** 2).sum(),
        argnums=(0, 1))), x, q)
    print(f"current apply grad (pair design)   {t_grad*1e3:8.3f} ms")

    print(f"\nimplied: pair-widening={((t_both if isinstance(t_both, float) else t_both)-t_vals)*1e3:.3f} ms, "
          f"rebuild={((t_tmpl_frozen-t_frozen))*1e3:.3f} ms, "
          f"callback-vs-precomputed={(t_vals-t_tmpl_frozen)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
