"""Projected multi-chip scaling efficiency from compiled sharded HLO.

BASELINE.json demands >=80% scaling efficiency (1 chip -> 1 host -> >=2
hosts) but this environment has ONE physical TPU chip, so wall-clock
multi-chip measurement is impossible.  This script produces the
first-principles substitute (VERDICT r4 missing #1):

  1. jit each bench-config sharded train step over the 8-virtual-device
     CPU mesh and compile it (GSPMD partitioning inserts the real
     collectives),
  2. parse the post-partitioning HLO for collective ops and convert
     their shapes to per-step bytes-on-wire per device,
  3. combine with the measured single-chip step time (driver-captured
     BENCH on the real v5e chip) and published v5e link bandwidths to
     project 8-chip (ICI) and 2-host (DCN-cut) efficiency:

        T_compute(8)   = t_1chip / 8          (row-partitioned graph ops)
        T_comm         = wire_bytes / W_link  (ring collectives: the
                         per-link traffic of all-gather/reduce-scatter
                         of S bytes is S*(D-1)/D; all-reduce is 2x that;
                         with 2 hosts the two DCN cut links carry the
                         same per-link traffic, so swap W_ici -> W_dcn)
        efficiency     = T_compute / (T_compute + T_comm)   (no-overlap,
                         i.e. conservative; overlapped would be higher)

Bandwidth constants (public "How to Scale Your Model" book, v5e chapter):
ICI 4.5e10 B/s per link per direction (9e10 bidirectional); DCN ~2.5e10
B/s per host NIC.  Run: python scripts/scaling_projection.py
"""
import argparse
import json
import os
import re
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import jax  # noqa: E402

# the container boot hook registers the remote-TPU backend regardless of
# JAX_PLATFORMS; override back to the virtual 8-device CPU mesh
jax.config.update("jax_platforms", "cpu")

from pytorch_geometric_signed_directed_tpu.ops.spmm import (  # noqa: E402
    set_matmul_precision, set_message_dtype)

# match bench.py's training precision (bf16 message storage / MXU
# passes) so the HLO's collective shapes are the ones the measured step
# times actually move
set_matmul_precision("default")
set_message_dtype("bf16")

W_ICI = 9.0e10    # v5e ICI per-link bidirectional bytes/s
W_DCN = 2.5e10    # per-host DCN bytes/s
NDEV = 8

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8,
                "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1}

_COLLECTIVE_RE = re.compile(
    r"=\s*\(?((?:[a-z0-9]+\[[0-9,]*\][^)\s]*(?:,\s*)?)+)\)?\s*"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(?:-start)?\(")


def _shape_bytes(shapes: str) -> int:
    total = 0
    for m in re.finditer(r"([a-z0-9]+)\[([0-9,]*)\]", shapes):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


_STABLE_RE = re.compile(
    r"stablehlo\.(all_gather|all_reduce|reduce_scatter|collective_permute|"
    r"all_to_all)\"?\(.*?->\s*tensor<([0-9x]*)x?([a-z0-9]+)>")


def _stable_payloads(stablehlo: str):
    """(kind, numel) -> payload element bytes from the lowered module.

    The manual (shard_map) collectives carry their true payload dtype
    here; the CPU backend's simplifier re-widens bf16 collectives to f32
    in the compiled text (verified: the lowered module shows
    convert->bf16 -> all_gather), so the lowered dtype is the one a TPU
    partition would move."""
    out = {}
    for m in _STABLE_RE.finditer(stablehlo):
        kind = m.group(1).replace("_", "-")
        dims, dt = m.group(2), m.group(3)
        n = 1
        for d in dims.split("x"):
            if d:
                n *= int(d)
        if dt in _DTYPE_BYTES:
            out[(kind, n)] = _DTYPE_BYTES[dt]
    return out


def collective_bytes(hlo: str, stablehlo: str = ""):
    """Per-device bytes-on-wire per collective kind (ring algorithms),
    from the post-SPMD HLO text, with payload dtypes corrected from the
    lowered module where a matching manual collective exists."""
    out = {"all-reduce": 0, "all-gather": 0, "reduce-scatter": 0,
           "collective-permute": 0, "all-to-all": 0}
    counts = dict.fromkeys(out, 0)
    payloads = _stable_payloads(stablehlo)
    for m in _COLLECTIVE_RE.finditer(hlo):
        shapes, kind = m.group(1), m.group(2)
        s = _shape_bytes(shapes)
        numel = 0
        for mm in re.finditer(r"[a-z0-9]+\[([0-9,]*)\]", shapes):
            k = 1
            for d in mm.group(1).split(","):
                if d:
                    k *= int(d)
            numel += k
        if (kind, numel) in payloads and numel:
            s = numel * payloads[(kind, numel)]
        d = NDEV
        if kind == "all-reduce":
            wire = 2 * s * (d - 1) / d
        elif kind in ("all-gather", "all-to-all"):
            wire = s * (d - 1) / d
        elif kind == "reduce-scatter":
            wire = s * (d - 1)  # output shape is the 1/d shard
        else:  # collective-permute
            wire = s
        out[kind] += wire
        counts[kind] += 1
    return out, counts


def _train_step(loss_fn, params, aux):
    import jax
    import optax

    tx = optax.adam(1e-2)

    def step(params, opt_state, aux):
        loss, grads = jax.value_and_grad(lambda p: loss_fn(p, aux))(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    return step, (params, tx.init(params), aux)


def hlo_magnet_mxu(n=65536, avg_deg=30):
    """bench magnet_mxu config: N=65536, E~2.46M, K=2, 2 layers."""
    import jax
    import jax.numpy as jnp
    from pytorch_geometric_signed_directed_tpu.data import DSBM
    from pytorch_geometric_signed_directed_tpu.graph import in_out_degree
    from pytorch_geometric_signed_directed_tpu.spectral import (
        magnet_propagators)
    from pytorch_geometric_signed_directed_tpu.nn import (
        MagNet_node_classification)
    from pytorch_geometric_signed_directed_tpu.utils import (
        meta_graph_generation)
    from pytorch_geometric_signed_directed_tpu.parallel import (
        make_mesh, shard_magnet_laplacian)

    F = meta_graph_generation("cyclic", 5, 0.05, False)
    A, labels = DSBM(n, 5, (avg_deg / n) * 5 / 2, F,
                     rng=np.random.default_rng(0))
    edge_index = np.vstack(A.nonzero())
    e = edge_index.shape[1]
    w = A.tocoo().data
    x = in_out_degree(edge_index, n, edge_weight=w)
    x = jnp.asarray(x / max(x.max(), 1.0))
    y = jnp.asarray(labels)
    lap = magnet_propagators(edge_index, w, q=0.25, num_nodes=n, mode="mxu")
    mesh = make_mesh(NDEV, axis_names=("graph",))
    lap_sh = shard_magnet_laplacian(lap, mesh, axis="graph")
    model = MagNet_node_classification(
        num_features=2, hidden=32, K=2, label_dim=5, activation=True,
        layer=2)
    params = model.init(jax.random.PRNGKey(0), x, x, lap)

    def loss_fn(p, aux):
        x_, lap_, y_ = aux
        logp = model.apply(p, x_, x_, lap_)
        return -jnp.mean(logp[jnp.arange(n), y_])

    step, args = _train_step(loss_fn, params, (x, lap_sh, y))
    with mesh:
        lowered = jax.jit(step).lower(*args)
        stable = lowered.as_text()
        compiled = lowered.compile()
    return compiled.as_text(), stable, e


def hlo_snea(n=16384):
    """bench snea config: N=16384, E~1.05M across 3 attn graphs."""
    import jax
    from pytorch_geometric_signed_directed_tpu.nn import SNEA
    from pytorch_geometric_signed_directed_tpu.nn.signed import snea_conv
    from pytorch_geometric_signed_directed_tpu.parallel import (
        make_mesh, shard_attention_graphs)

    rng = np.random.default_rng(0)
    e_pos, e_neg = 400000, 100000
    pos = np.vstack([rng.integers(0, n, e_pos), rng.integers(0, n, e_pos)])
    neg = np.vstack([rng.integers(0, n, e_neg), rng.integers(0, n, e_neg)])
    graphs = snea_conv.snea_graphs(pos, neg, n)
    e = sum(int(g.plan.num_edges) for g in graphs)
    init_emb = rng.standard_normal((n, 32)).astype(np.float32)
    model = SNEA(node_num=n, in_dim=32, out_dim=32, init_emb=init_emb)
    mesh = make_mesh(NDEV, axis_names=("graph",))
    sgraphs = shard_attention_graphs(graphs, mesh)

    def loss_fn(p, g):
        z = model.apply(p, g)
        return (z ** 2).sum()

    params = model.init(jax.random.PRNGKey(0), graphs)
    step, args = _train_step(loss_fn, params, sgraphs)
    with mesh:
        lowered = jax.jit(step).lower(*args)
        stable = lowered.as_text()
        compiled = lowered.compile()
    return compiled.as_text(), stable, e


def hlo_sgcn(n=131072, e_pos=600000, e_neg=120000):
    """bench sgcn config: N=131072, E=720k signed."""
    import jax
    from pytorch_geometric_signed_directed_tpu.nn import SGCN
    from pytorch_geometric_signed_directed_tpu.nn.signed.sgcn import (
        prepare_sgcn_inputs)
    from pytorch_geometric_signed_directed_tpu.parallel import (
        make_mesh)

    rng = np.random.default_rng(0)
    m = e_pos + e_neg
    edge_s = np.column_stack([
        rng.integers(0, n, m), rng.integers(0, n, m),
        np.concatenate([np.ones(e_pos), -np.ones(e_neg)])]).astype(np.int64)
    init_emb = rng.standard_normal((n, 64)).astype(np.float32)
    # round-5 fused union-edge-set dual (the bench path)
    _, _, emb, D, _none = prepare_sgcn_inputs(
        n, edge_s, in_dim=64, init_emb=init_emb, mode="mxu", fused=True)
    model = SGCN(node_num=n, in_dim=64, out_dim=64, init_emb=emb,
                 init_emb_grad=True)
    mesh = make_mesh(NDEV, axis_names=("graph",))
    from pytorch_geometric_signed_directed_tpu.parallel import shard_dual
    Pp, Pn = shard_dual(D, mesh), None

    def loss_fn(p, aux):
        z = model.apply(p, *aux)
        return (z ** 2).sum()

    params = model.init(jax.random.PRNGKey(0), D, None)
    step, args = _train_step(loss_fn, params, (Pp, Pn))
    with mesh:
        lowered = jax.jit(step).lower(*args)
        stable = lowered.as_text()
        compiled = lowered.compile()
    return compiled.as_text(), stable, m


def hlo_digrac(n=65536, e=2_000_000, k=5):
    """bench digrac config: DIMPA trunk + imbalance loss, all four
    operators (P_s, P_t and the raw A / A^T of the loss volumes)
    row-sharded via shard_propagator."""
    import jax
    import jax.numpy as jnp
    from pytorch_geometric_signed_directed_tpu.graph import (
        in_out_degree, norm_propagator, rw_norm_propagator)
    from pytorch_geometric_signed_directed_tpu.nn import (
        DIGRAC_node_clustering)
    from pytorch_geometric_signed_directed_tpu.utils import (
        Prob_Imbalance_Loss)
    from pytorch_geometric_signed_directed_tpu.parallel import (
        make_mesh, shard_propagator)

    rng = np.random.default_rng(0)
    ei = np.vstack([rng.integers(0, n, e), rng.integers(0, n, e)])
    w = np.ones(e, np.float32)
    x = in_out_degree(ei, n, edge_weight=w)
    x = jnp.asarray(x / max(x.max(), 1.0))
    imb = Prob_Imbalance_Loss(k)
    mesh = make_mesh(NDEV, axis_names=("graph",))
    P_s = rw_norm_propagator(ei, w, n, mode="mxu")
    P_t = rw_norm_propagator(ei[[1, 0]], w, n, mode="mxu")
    P_A = norm_propagator(ei[[1, 0]], w, n, mode="mxu")
    P_AT = norm_propagator(ei, w, n, mode="mxu")
    shards = tuple(shard_propagator(P, mesh)
                   for P in (P_s, P_t, P_A, P_AT))
    model = DIGRAC_node_clustering(num_features=int(x.shape[1]),
                                   hidden=32, nclass=k, fill_value=0.5,
                                   hop=2)

    def loss_fn(p, aux):
        Ps_, Pt_, PA_, PAT_, x_ = aux
        _, _, _, prob = model.apply(p, Ps_, Pt_, x_)
        return imb(prob, (PA_, PAT_), k, "vol_sum", "sort")

    params = model.init(jax.random.PRNGKey(0), P_s, P_t, x)
    step, args = _train_step(loss_fn, params, shards + (x,))
    with mesh:
        lowered = jax.jit(step).lower(*args)
        stable = lowered.as_text()
        compiled = lowered.compile()
    return compiled.as_text(), stable, e


# Driver-captured single-chip step seconds on the real v5e chip
# (BENCH_r04.json: value = edges/s, E in unit string -> dt = E / value).
R4_STEP_SECONDS = {
    "magnet_mxu": 2456932 / 22474474.2,
    "snea": 1049092 / 13219593.9,
    # round-5 fused dual measured on the quiet chip (39.72 ms/step)
    "sgcn": 0.03972,
    "digrac": 2000000 / 24146936.9,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="*",
                    default=["magnet_mxu", "snea", "sgcn", "digrac"])
    ap.add_argument("--out", default="results/scaling_projection.json")
    a = ap.parse_args()

    builders = {"magnet_mxu": hlo_magnet_mxu, "snea": hlo_snea,
                "sgcn": hlo_sgcn, "digrac": hlo_digrac}
    rows = []
    for name in a.configs:
        hlo, stable, e = builders[name]()
        bytes_by_kind, counts = collective_bytes(hlo, stable)
        wire = sum(bytes_by_kind.values())
        t1 = R4_STEP_SECONDS[name]
        t_c8 = t1 / NDEV
        t_comm_ici = wire / W_ICI
        t_comm_dcn = wire / W_DCN
        eff_ici = t_c8 / (t_c8 + t_comm_ici)
        eff_dcn = t_c8 / (t_c8 + t_comm_dcn)
        # full-overlap bound: collectives ride under compute
        eff_ici_ov = t_c8 / max(t_c8, t_comm_ici)
        eff_dcn_ov = t_c8 / max(t_c8, t_comm_dcn)
        row = {
            "config": name, "edges": e,
            "per_step_wire_bytes_per_device": int(wire),
            "collective_counts": counts,
            "collective_bytes": {k: int(v)
                                 for k, v in bytes_by_kind.items()},
            "t_1chip_s": round(t1, 5),
            "t_compute_8chip_s": round(t_c8, 6),
            "t_comm_ici_s": round(t_comm_ici, 6),
            "t_comm_dcn_s": round(t_comm_dcn, 6),
            "projected_eff_8chip_ici": round(eff_ici, 4),
            "projected_eff_2host_dcn": round(eff_dcn, 4),
            "projected_eff_8chip_ici_overlapped": round(eff_ici_ov, 4),
            "projected_eff_2host_dcn_overlapped": round(eff_dcn_ov, 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, "w") as f:
        json.dump({"W_ici_bytes_s": W_ICI, "W_dcn_bytes_s": W_DCN,
                   "n_devices": NDEV, "rows": rows}, f, indent=1)
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
