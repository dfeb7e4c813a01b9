import time
import numpy as np
import jax, jax.numpy as jnp
from pytorch_geometric_signed_directed_tpu.ops.coo import build_coo
from pytorch_geometric_signed_directed_tpu.ops.pallas import scatter_mxu as sm

def timeit_m(fn, m, steps=20):
    @jax.jit
    def run(m0):
        def body(c, _):
            out = fn(c)
            nxt = c.at[:128, :].add(out[:128, : c.shape[1]].astype(c.dtype) * 1e-12)
            return nxt, None
        c, _ = jax.lax.scan(body, m0, None, length=steps)
        return c.sum()
    s = run(m); float(s)
    t0 = time.perf_counter()
    s = run(m); float(s)
    return (time.perf_counter() - t0) / steps

N, E = 65536, 4_000_000
rng = np.random.default_rng(0)
A = build_coo(rng.integers(0, N, E), rng.integers(0, N, E),
              rng.standard_normal(E).astype(np.float32), N)
mxu = sm.mxu_from_coo(A, with_transpose=False)
plan = mxu.plan
E2 = int(mxu.col.shape[0])
dflt = jax.lax.Precision.DEFAULT
for F in (64, 128):
    msgs = jnp.asarray(rng.standard_normal((E2, F)).astype(np.float32))
    dt = timeit_m(lambda m: sm._scatter_matmul(plan.win, plan.local_rows, m, plan.num_windows, precision=dflt), msgs)
    print(f"scatter f32  F={F:4d}: {dt*1e3:7.2f} ms")
    mb = msgs.astype(jnp.bfloat16)
    dt = timeit_m(lambda m: sm._scatter_matmul(plan.win, plan.local_rows, m, plan.num_windows, precision=dflt), mb)
    print(f"scatter bf16 F={F:4d}: {dt*1e3:7.2f} ms")
