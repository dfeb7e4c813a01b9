"""A/B the pair-forward message build (VERDICT r3 item 1 follow-up).

profile_pair_forward.py showed the fused 4F pair pass costs 22.3 ms vs
the frozen fwd's 14.8 ms, while the bare 128-lane kernel is FASTER than
the 64-lane one (2.4 vs 4.9 ms) — the overhead is XLA-side message
construction (two 2F parts + a concat relayout on the [E2, 4F] stream).

Candidate: duplicate x's lanes BEFORE the gather (xx = [x | x], [N, 4F])
— the row gather is row-rate-bound and width-free up to 128 lanes, so
xx[col] costs the same as xg[col], and the message build collapses to
ONE fused elementwise quadrant-select (no concat).

Run: python scripts/ab_pair_msgs.py
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
        set_matmul_precision, set_message_dtype, get_matmul_precision)
    from pytorch_geometric_signed_directed_tpu.spectral import (
        magnetic_template)
    from pytorch_geometric_signed_directed_tpu.spectral.magnetic import (
        _template_pair_forward)
    from pytorch_geometric_signed_directed_tpu.ops.pallas.scatter_mxu import (
        scatter_sum)

    set_matmul_precision("default")
    set_message_dtype("bf16")

    n, avg_deg = 65536, 30
    e = n * avg_deg
    rng = np.random.default_rng(0)
    ei = np.vstack([rng.integers(0, n, e), rng.integers(0, n, e)])
    w = np.ones(e, np.float32)
    tmpl = magnetic_template(ei, w, num_nodes=n, mode="auto")
    assert tmpl.plan is not None and tmpl.hot_ids is None

    x = jnp.asarray(rng.standard_normal((n, 64)).astype(np.float32))
    q = jnp.float32(0.25)
    fa, f2 = 32, 64

    cur = jax.jit(lambda v, qq: _template_pair_forward(tmpl, qq, v))
    t_cur = sync_time(lambda v: cur(v, q), x)

    a, th = tmpl.a_norm, tmpl.theta
    lane4 = jnp.arange(2 * f2)

    def cand(v, qq):
        xg = v.astype(jnp.bfloat16)
        xx = jnp.concatenate([xg, xg], axis=1)       # [N, 4F]
        g2 = xx[tmpl.col]                            # one row gather
        ang = 2.0 * jnp.pi * qq * th
        c, s = jnp.cos(ang), jnp.sin(ang)
        scale = 2.0 * jnp.pi * th * a
        va, vb = -a * c, a * s
        wa, wb = scale * s, scale * c
        sel = jnp.where(
            lane4[None, :] < fa, va[:, None],
            jnp.where(lane4[None, :] < f2, vb[:, None],
                      jnp.where(lane4[None, :] < f2 + fa, wa[:, None],
                                wb[:, None])))
        m = (g2 * sel).astype(jnp.bfloat16)
        out = scatter_sum(tmpl.plan, m)
        return out[:, :f2].astype(v.dtype), out[:, f2:]

    cnd = jax.jit(cand)
    t_cand = sync_time(lambda v: cnd(v, q), x)

    y0, yp0 = cur(x, q)
    y1, yp1 = cnd(x, q)
    dy = float(jnp.max(jnp.abs(y0.astype(jnp.float32) - y1.astype(jnp.float32))))
    dp = float(jnp.max(jnp.abs(yp0 - yp1)))
    print(f"current fused pair  {t_cur*1e3:8.3f} ms")
    print(f"candidate (dup-lane gather, single select) {t_cand*1e3:8.3f} ms"
          f"  speedup {t_cur/t_cand:.2f}x")
    print(f"max |dy|={dy:.2e}  |dy'|={dp:.2e}")


if __name__ == "__main__":
    main()
