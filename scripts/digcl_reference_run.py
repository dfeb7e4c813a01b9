"""Run the REFERENCE DiGCL recipe end-to-end in torch on citeseer.

The conv/projection/loss replica here matched our flax model at float64
step-parity (scripts/digcl_parity_study.py), so this script is an
executable stand-in for the reference's examples/digcl_node.py (PyG is
not installed in this image): same log alpha curriculum (a=0.9, b=0.1),
same drop rates, Adam(lr 1e-3, weight_decay 5e-4), fresh model per split,
same GridSearchCV logistic probe.  Whatever accuracy IT reaches on this
citeseer bundle is the reference's own number for this dataset/recipe —
the yardstick for attributing our experiment's result to recipe vs
library.

Run: python scripts/digcl_reference_run.py [--splits 4] [--epochs 200]
"""
import argparse
import os
import sys

import numpy as np
import scipy.sparse as sp
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pytorch_geometric_signed_directed_tpu.data import (  # noqa: E402
    load_directed_real_data)
from pytorch_geometric_signed_directed_tpu.experiments.digcl_node import (  # noqa: E402
    curriculum_alpha)
from pytorch_geometric_signed_directed_tpu.spectral import (  # noqa: E402
    cal_fast_appr)
from pytorch_geometric_signed_directed_tpu.utils import (  # noqa: E402
    pred_digcl_node)


def gcn_norm_sparse(ei, w, n):
    """PyG gcn_norm (add_remaining_self_loops fill=1, sym norm) as a torch
    sparse tensor oriented so out = N @ x aggregates sources into targets."""
    has_loop = np.zeros(n, bool)
    has_loop[ei[0][ei[0] == ei[1]]] = True
    miss = np.nonzero(~has_loop)[0]
    row = np.r_[ei[0], miss]
    col = np.r_[ei[1], miss]
    ww = np.r_[np.asarray(w, np.float64), np.ones(len(miss))]
    deg = np.bincount(col, weights=ww, minlength=n)
    with np.errstate(divide="ignore"):
        dis = np.power(deg, -0.5)
    dis[np.isinf(dis)] = 0
    norm = dis[row] * ww * dis[col]
    idx = torch.tensor(np.vstack([col, row]), dtype=torch.long)
    return torch.sparse_coo_tensor(
        idx, torch.tensor(norm, dtype=torch.float32), (n, n)).coalesce()


class RefDiGCL(torch.nn.Module):
    """float32 version of the parity-proven replica (see
    scripts/digcl_parity_study.py TorchDiGCL)."""

    def __init__(self, f_in, hidden, proj, tau):
        super().__init__()
        k = 1.0 / np.sqrt(hidden)

        def dense_init(*shape):
            return torch.nn.Parameter(
                torch.empty(*shape).uniform_(-k, k))

        # PyG GCNConv uses glorot for W, zeros for bias
        self.W0 = torch.nn.Parameter(torch.empty(f_in, 2 * hidden))
        self.b0 = torch.nn.Parameter(torch.zeros(2 * hidden))
        self.W1 = torch.nn.Parameter(torch.empty(2 * hidden, hidden))
        self.b1 = torch.nn.Parameter(torch.zeros(hidden))
        torch.nn.init.xavier_uniform_(self.W0)
        torch.nn.init.xavier_uniform_(self.W1)
        self.fc1 = torch.nn.Linear(hidden, proj)
        self.fc2 = torch.nn.Linear(proj, hidden)
        self.tau = tau

    def forward(self, x, N):
        x = torch.relu(torch.sparse.mm(N, x @ self.W0) + self.b0)
        return torch.relu(torch.sparse.mm(N, x @ self.W1) + self.b1)

    def projection(self, z):
        return self.fc2(torch.nn.functional.elu(self.fc1(z)))

    @staticmethod
    def sim(z1, z2):
        z1 = torch.nn.functional.normalize(z1)
        z2 = torch.nn.functional.normalize(z2)
        return z1 @ z2.t()

    def semi_loss(self, z1, z2):
        f = lambda v: torch.exp(v / self.tau)  # noqa: E731
        refl = f(self.sim(z1, z1))
        between = f(self.sim(z1, z2))
        return -torch.log(between.diag()
                          / (refl.sum(1) + between.diag() - refl.diag()))

    def loss(self, z1, z2):
        h1, h2 = self.projection(z1), self.projection(z2)
        l1 = self.semi_loss(h1, h2)
        l2 = self.semi_loss(h2, h1)
        return ((l1 + l2) * 0.5).mean()


def drop_feature_t(x, p, gen):
    mask = torch.rand(x.shape[1], generator=gen) < p
    out = x.clone()
    out[:, mask] = 0
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="citeseer")
    ap.add_argument("--splits", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--curr_type", default="log")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    data = load_directed_real_data(args.dataset, name=args.dataset)
    n = data.num_nodes
    X = torch.tensor(np.asarray(data.x, np.float32))
    y = np.asarray(data.y)

    ei1, w1 = cal_fast_appr(0.1, data.edge_index, n, data.edge_weight)
    N1 = gcn_norm_sparse(ei1, w1, n)
    view_cache = {}

    gen = torch.Generator().manual_seed(args.seed)
    torch.manual_seed(args.seed)
    accs = []
    n_splits = min(int(data.train_mask.shape[1]), args.splits)
    for split in range(n_splits):
        model = RefDiGCL(X.shape[1], 64, 32, 0.4)
        opt = torch.optim.Adam(model.parameters(), lr=1e-3,
                               weight_decay=5e-4)
        for epoch in range(args.epochs):
            a = float(curriculum_alpha(args.curr_type, epoch, args.epochs))
            if a not in view_cache:
                ei2, w2 = cal_fast_appr(a, data.edge_index, n,
                                        data.edge_weight)
                view_cache[a] = gcn_norm_sparse(ei2, w2, n)
            N2 = view_cache[a]
            model.train()
            opt.zero_grad()
            x1 = drop_feature_t(X, 0.3, gen)
            x2 = drop_feature_t(X, 0.4, gen)
            loss = model.loss(model(x1, N1), model(x2, N2))
            loss.backward()
            opt.step()
            if (epoch + 1) % 50 == 0:
                print(f"split {split} epoch {epoch + 1}: "
                      f"loss {float(loss):.4f}", flush=True)
        model.eval()
        with torch.no_grad():
            z = model(X, N1).numpy()
        tr = np.nonzero(np.asarray(data.train_mask)[:, split])[0]
        te = np.nonzero(np.asarray(data.test_mask)[:, split])[0]
        pred = pred_digcl_node(z, y, tr, te)
        acc = float((pred == y[te]).mean())
        accs.append(acc)
        print(f"split {split}: reference-recipe torch acc {acc:.4f}",
              flush=True)

    accs = np.asarray(accs)
    print(f"{args.dataset} reference torch replica ({args.curr_type}): "
          f"acc {accs.mean():.4f} +/- {accs.std():.4f} "
          f"over {len(accs)} splits")


if __name__ == "__main__":
    main()
