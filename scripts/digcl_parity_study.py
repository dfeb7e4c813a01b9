"""DiGCL step-by-step parity study vs an independent float64 replica.

VERDICT r2 item 3: prove (or refute) that the library math behind DiGCL is
identical to the reference's, so the citeseer accuracy gap can be
attributed to recipe, not kernels.  Two independent replicas, neither of
which shares any code with the package:

1. ``fast_appr_power`` — a direct float64 transcription of the Moler-style
   lazy-teleport power iteration the reference uses
   (reference get_adjs_DiGCN.py:10-56, the x = Wx + s(z^T x) recurrence with
   W = (1-a) A^T D^-1), compared entry-wise against
   ``spectral.fast_appr_power``'s flat-vector/transpose-identity rewrite —
   across the full alpha range the reference "log" curriculum actually
   visits (0.89 .. 1.7, i.e. alpha > 1 included).

2. The full DiGCL training step — encoder (PyG-style GCNConv), projection,
   InfoNCE semi loss — replicated in torch float64 with autograd, weights
   copied from the flax params; loss and every parameter gradient compared
   against ``jax.grad`` of ``nn.DiGCL`` in float64.

Run: JAX_PLATFORMS=cpu python scripts/digcl_parity_study.py
Exits nonzero on any parity failure.
"""
import os
import sys

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from pytorch_geometric_signed_directed_tpu.graph import (  # noqa: E402
    gcn_norm_propagator)
from pytorch_geometric_signed_directed_tpu.nn import DiGCL  # noqa: E402
from pytorch_geometric_signed_directed_tpu.spectral import (  # noqa: E402
    cal_fast_appr, fast_appr_power)

torch.set_default_dtype(torch.float64)

FAILURES = []


def check(name, err, tol):
    ok = err <= tol
    print(f"  {'ok ' if ok else 'FAIL'} {name}: max|diff| = {err:.3e}"
          f" (tol {tol:g})")
    if not ok:
        FAILURES.append(name)


# ---------------------------------------------------------------------------
# 1. fast_appr_power vs a float64 Moler-iteration transcription
# ---------------------------------------------------------------------------

def reference_fast_appr(A: sp.csr_matrix, alpha: float, max_iter: int = 100,
                        tol: float = 1e-6):
    """Direct transcription of the reference's Moler-style iteration
    (matrix-form, float64): x = Wx + s (z^T x) with W = (1-a) A^T D^-1,
    s = personalize/((1+a) n), z_j = a(1+a) for out-degree>0 rows and
    (1-a)/(1+a) + a(1+a) for dangling rows; then
    L = (Pi^1/2 P Pi^-1/2 + Pi^-1/2 P^T Pi^1/2)/2 with NaNs zeroed."""
    n = A.shape[0]
    r = np.asarray(A.sum(axis=1)).reshape(-1)
    k = r.nonzero()[0]
    D_1 = sp.csr_matrix((1 / r[k], (k, k)), shape=(n, n))
    personalize = np.ones(n).reshape(n, 1)
    s = 1 / (1 + alpha) / n * personalize
    z_T = ((alpha * (1 + alpha)) * (r != 0)
           + ((1 - alpha) / (1 + alpha) + alpha * (1 + alpha)) * (r == 0)
           )[np.newaxis, :]
    W = (1 - alpha) * A.T @ D_1
    x = s
    oldx = np.zeros((n, 1))
    it = 0
    while np.linalg.norm(x - oldx) > tol:
        oldx = x
        x = W @ x + s @ (z_T @ x)
        it += 1
        if it >= max_iter:
            break
    x = x / sum(x)
    x = x.reshape(-1)
    p = D_1 * A
    with np.errstate(invalid="ignore"):
        pi_sqrt = sp.diags(np.power(x, 0.5))
        pi_inv_sqrt = sp.diags(np.power(x, -0.5))
    L = (pi_sqrt * p * pi_inv_sqrt + pi_inv_sqrt * p.T * pi_sqrt) / 2.0
    L.data[np.isnan(L.data)] = 0.0
    return L, x


def study_fast_appr():
    print("[1] fast_appr_power parity (flat-vector rewrite vs Moler"
          " transcription)")
    rng = np.random.default_rng(7)
    n = 60
    # directed graph with a couple of dangling nodes and weighted edges
    m = 240
    row = rng.integers(0, n - 3, m)       # nodes n-3..n-1 have no out-edges
    col = rng.integers(0, n, m)
    w = rng.uniform(0.5, 2.0, m)
    A = sp.csr_matrix((w, (row, col)), shape=(n, n))
    A.sum_duplicates()

    # the alphas the reference recipes actually visit: DiGCN/DiGCL defaults
    # (0.1/0.2), the linear/exp curriculum range, and the log curriculum's
    # alpha > 1 territory (1.7 at epoch 0).
    for alpha in (0.05, 0.1, 0.2, 0.3, 0.5, 0.89, 0.9, 1.0, 1.3, 1.7):
        L_ref, pi_ref = reference_fast_appr(A.copy(), alpha)
        L_ours, pi_ours = fast_appr_power(A.copy(), alpha=alpha)
        d_pi = float(np.max(np.abs(pi_ref - pi_ours)))
        d_L = float(np.abs((L_ref - L_ours)).max()) if L_ref.nnz + L_ours.nnz \
            else 0.0
        check(f"pi    @ alpha={alpha}", d_pi, 1e-9)
        check(f"L     @ alpha={alpha}", d_L, 1e-9)

    # and through the public cal_fast_appr wrapper (adds self-loops + final
    # sym norm) at one representative alpha
    ei = np.stack([row, col])
    ei_ours, w_ours = cal_fast_appr(0.3, ei, n, w)
    # reference wrapper transcription
    loops = np.arange(n)
    ei2 = np.stack([np.r_[row, loops], np.r_[col, loops]])
    w2 = np.r_[w, np.ones(n)]
    A2 = sp.csr_matrix((w2, (ei2[0], ei2[1])), shape=(n, n))
    L_ref, _ = reference_fast_appr(A2, 0.3)
    L_ref = L_ref.tocoo()
    deg = np.bincount(L_ref.row, weights=L_ref.data, minlength=n)
    with np.errstate(divide="ignore"):
        dis = np.power(deg, -0.5)
    dis[np.isinf(dis)] = 0
    w_ref = dis[L_ref.row] * L_ref.data * dis[L_ref.col]
    ours = sp.csr_matrix((w_ours, (ei_ours[0], ei_ours[1])), shape=(n, n))
    ref = sp.csr_matrix((w_ref, (L_ref.row, L_ref.col)), shape=(n, n))
    check("cal_fast_appr end-to-end", float(np.abs((ours - ref)).max()),
          1e-6)  # returned weights are float32


# ---------------------------------------------------------------------------
# 2. DiGCL training-step parity: torch float64 autograd replica
# ---------------------------------------------------------------------------

class TorchDiGCL(torch.nn.Module):
    """Independent float64 replica of the reference DiGCL
    (reference nn/directed/DiGCL.py:7-199): 2-layer GCN encoder
    (dense-normalized adjacency), elu projection head, InfoNCE semi loss."""

    def __init__(self, f_in, hidden, proj, tau):
        super().__init__()
        self.W0 = torch.nn.Parameter(torch.zeros(f_in, 2 * hidden))
        self.b0 = torch.nn.Parameter(torch.zeros(2 * hidden))
        self.W1 = torch.nn.Parameter(torch.zeros(2 * hidden, hidden))
        self.b1 = torch.nn.Parameter(torch.zeros(hidden))
        self.fc1 = torch.nn.Linear(hidden, proj)
        self.fc2 = torch.nn.Linear(proj, hidden)
        self.tau = tau

    def encode(self, x, N):
        # PyG GCNConv: propagate(x @ W) + bias, activation outside;
        # reference encoder applies relu after every layer.
        x = torch.relu(N @ (x @ self.W0) + self.b0)
        return torch.relu(N @ (x @ self.W1) + self.b1)

    def projection(self, z):
        return self.fc2(torch.nn.functional.elu(self.fc1(z)))

    def sim(self, z1, z2):
        z1 = torch.nn.functional.normalize(z1)
        z2 = torch.nn.functional.normalize(z2)
        return z1 @ z2.t()

    def semi_loss(self, z1, z2):
        f = lambda v: torch.exp(v / self.tau)  # noqa: E731
        refl = f(self.sim(z1, z1))
        between = f(self.sim(z1, z2))
        return -torch.log(between.diag()
                          / (refl.sum(1) + between.diag() - refl.diag()))

    def loss(self, x1, x2, N1, N2):
        z1, z2 = self.encode(x1, N1), self.encode(x2, N2)
        h1, h2 = self.projection(z1), self.projection(z2)
        l1 = self.semi_loss(h1, h2)
        l2 = self.semi_loss(h2, h1)
        return ((l1 + l2) * 0.5).mean()


def gcn_norm_dense(ei, w, n):
    """PyG gcn_norm (add_REMAINING_self_loops fill=1 — existing diagonal
    entries are kept, only missing ones get the fill — then sym norm),
    materialized dense, oriented so out = N @ x aggregates source rows
    into targets."""
    has_loop = np.zeros(n, bool)
    has_loop[ei[0][ei[0] == ei[1]]] = True
    miss = np.nonzero(~has_loop)[0]
    row = np.r_[ei[0], miss]
    col = np.r_[ei[1], miss]
    ww = np.r_[w, np.ones(len(miss))]
    deg = np.bincount(col, weights=ww, minlength=n)
    with np.errstate(divide="ignore"):
        dis = np.power(deg, -0.5)
    dis[np.isinf(dis)] = 0
    norm = dis[row] * ww * dis[col]
    N = np.zeros((n, n))
    np.add.at(N, (col, row), norm)   # aggregate at target (PyG flow)
    return N


def study_training_step():
    print("[2] DiGCL training-step parity (flax/jax float64 vs torch"
          " float64 autograd)")
    rng = np.random.default_rng(3)
    n, f_in, hidden, proj, tau = 50, 13, 8, 5, 0.4
    m = 170
    ei = np.stack([rng.integers(0, n, m), rng.integers(0, n, m)])
    w = rng.uniform(0.5, 1.5, m)
    x1 = rng.normal(size=(n, f_in))
    x2 = rng.normal(size=(n, f_in))

    # two PPR views exactly as the experiment builds them
    ei1, w1 = cal_fast_appr(0.1, ei, n, w)
    ei2, w2 = cal_fast_appr(0.9, ei, n, w)

    P1 = gcn_norm_propagator(ei1, np.asarray(w1, np.float64), n, mode="dense")
    P2 = gcn_norm_propagator(ei2, np.asarray(w2, np.float64), n, mode="dense")
    N1 = torch.tensor(gcn_norm_dense(ei1, np.asarray(w1, np.float64), n))
    N2 = torch.tensor(gcn_norm_dense(ei2, np.asarray(w2, np.float64), n))

    model = DiGCL(in_channels=f_in, activation="relu", num_hidden=hidden,
                  num_proj_hidden=proj, tau=tau, num_layers=2)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x1), P1,
                        method=DiGCL.warmup)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), params)

    tm = TorchDiGCL(f_in, hidden, proj, tau)
    enc = params["params"]["encoder"]
    with torch.no_grad():
        tm.W0.copy_(torch.tensor(np.asarray(enc["_GCNConv_0"]["Dense_0"]["kernel"])))
        tm.b0.copy_(torch.tensor(np.asarray(enc["_GCNConv_0"]["bias"])))
        tm.W1.copy_(torch.tensor(np.asarray(enc["_GCNConv_1"]["Dense_0"]["kernel"])))
        tm.b1.copy_(torch.tensor(np.asarray(enc["_GCNConv_1"]["bias"])))
        tm.fc1.weight.copy_(torch.tensor(np.asarray(params["params"]["fc1"]["kernel"]).T))
        tm.fc1.bias.copy_(torch.tensor(np.asarray(params["params"]["fc1"]["bias"])))
        tm.fc2.weight.copy_(torch.tensor(np.asarray(params["params"]["fc2"]["kernel"]).T))
        tm.fc2.bias.copy_(torch.tensor(np.asarray(params["params"]["fc2"]["bias"])))

    # The dense-normalized operators must agree first.  Residual floor is
    # ~3e-8: build_coo stores Propagator values in float32 (TPU-first layout
    # choice); everything downstream inherits that floor, so "parity" here
    # means agreement at the operator's own storage precision, which rules
    # out any math (as opposed to rounding) divergence.
    check("gcn_norm operator (view 1)",
          float(np.abs(np.asarray(P1.dense) - N1.numpy()).max()), 5e-7)
    check("gcn_norm operator (view 2)",
          float(np.abs(np.asarray(P2.dense) - N2.numpy()).max()), 5e-7)

    def jax_loss(p):
        z1 = model.apply(p, jnp.asarray(x1), P1)
        z2 = model.apply(p, jnp.asarray(x2), P2)
        return model.apply(p, z1, z2, method=DiGCL.loss)

    loss_j, grads_j = jax.value_and_grad(jax_loss)(params)

    loss_t = tm.loss(torch.tensor(x1), torch.tensor(x2), N1, N2)
    loss_t.backward()

    check("loss", abs(float(loss_j) - float(loss_t.detach())), 1e-7)

    pairs = [
        ("encoder.W0", enc["_GCNConv_0"]["Dense_0"]["kernel"], tm.W0),
        ("encoder.b0", enc["_GCNConv_0"]["bias"], tm.b0),
        ("encoder.W1", enc["_GCNConv_1"]["Dense_0"]["kernel"], tm.W1),
        ("encoder.b1", enc["_GCNConv_1"]["bias"], tm.b1),
    ]
    genc = grads_j["params"]["encoder"]
    gmap = {
        "encoder.W0": genc["_GCNConv_0"]["Dense_0"]["kernel"],
        "encoder.b0": genc["_GCNConv_0"]["bias"],
        "encoder.W1": genc["_GCNConv_1"]["Dense_0"]["kernel"],
        "encoder.b1": genc["_GCNConv_1"]["bias"],
        "fc1.kernel": grads_j["params"]["fc1"]["kernel"],
        "fc1.bias": grads_j["params"]["fc1"]["bias"],
        "fc2.kernel": grads_j["params"]["fc2"]["kernel"],
        "fc2.bias": grads_j["params"]["fc2"]["bias"],
    }
    for name, _, tparam in pairs:
        check(f"grad {name}",
              float(np.abs(np.asarray(gmap[name]) - tparam.grad.numpy()).max()),
              1e-6)
    check("grad fc1.kernel",
          float(np.abs(np.asarray(gmap["fc1.kernel"]) - tm.fc1.weight.grad.numpy().T).max()),
          1e-6)
    check("grad fc1.bias",
          float(np.abs(np.asarray(gmap["fc1.bias"]) - tm.fc1.bias.grad.numpy()).max()),
          1e-6)
    check("grad fc2.kernel",
          float(np.abs(np.asarray(gmap["fc2.kernel"]) - tm.fc2.weight.grad.numpy().T).max()),
          1e-6)
    check("grad fc2.bias",
          float(np.abs(np.asarray(gmap["fc2.bias"]) - tm.fc2.bias.grad.numpy()).max()),
          1e-6)

    # batched loss must agree with the full loss's replica too
    z1 = model.apply(params, jnp.asarray(x1), P1)
    z2 = model.apply(params, jnp.asarray(x2), P2)
    lb = model.apply(params, z1, z2, method=DiGCL.loss, batch_size=16)
    # reference batched_semi_loss denominator differs from semi_loss by
    # construction (uses between.sum(1) instead of its diag) — replicate it
    def t_batched(zz1, zz2, bs):
        h1, h2 = tm.projection(zz1), tm.projection(zz2)
        def one(a, b):
            out = []
            nb = (n - 1) // bs + 1
            f = lambda v: torch.exp(v / tau)  # noqa: E731
            for i in range(nb):
                msk = slice(i * bs, min((i + 1) * bs, n))
                refl = f(tm.sim(a[msk], a))
                betw = f(tm.sim(a[msk], b))
                out.append(-torch.log(
                    betw[:, msk].diag()
                    / (refl.sum(1) + betw.sum(1) - refl[:, msk].diag())))
            return torch.cat(out)
        l1 = one(h1, h2)
        l2 = one(h2, h1)
        return ((l1 + l2) * 0.5).mean()

    lb_t = t_batched(torch.tensor(np.asarray(z1)), torch.tensor(np.asarray(z2)), 16)
    check("batched loss (B=16)", abs(float(lb) - float(lb_t.detach())), 1e-10)


if __name__ == "__main__":
    study_fast_appr()
    study_training_step()
    if FAILURES:
        print(f"\n{len(FAILURES)} parity failures: {FAILURES}")
        sys.exit(1)
    print("\nall parity checks passed")
