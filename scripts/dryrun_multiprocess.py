"""Cross-process (multi-host mechanics) dry run — VERDICT r3 item 2.

Everything multi-device so far (tests, dryrun_multichip) runs in ONE
process with 8 virtual CPU devices.  This script executes the actual
multi-host code path: 2 OS processes x 4 virtual CPU devices each,
joined by `jax.distributed.initialize` into one 8-device global mesh
(gloo-backed CPU collectives — the DCN stand-in available in this
image), running the SAME sharded train steps as dryrun_multichip
phases 2/4/5/6/7: frozen mxu tier, trainable-q sharded template, the
attention tier (SNEA under shard_map), the signed dual-propagator tier
(SGCN), and the motif-model tier (SDGNN, 4 motif AttnGraphs).  Global
arrays span process boundaries; every collective crosses them.

Parity: process 0 of the 2-process run reports (loss, global param
norm) after one optimizer step; the launcher compares against an
identical single-process 8-device run.  |dloss| must match to ~1e-6 —
the math is device-count invariant, so only the cross-process
mechanics are under test.

Run: python scripts/dryrun_multiprocess.py
(workers are launched internally; results land in PERF.md's table)
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _free_port() -> int:
    """Ephemeral coordinator port — a fixed constant collides when a
    stale worker lingers or two runs (e.g. parallel CI shards) race."""
    import socket

    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def build_problem():
    """Deterministic flagship problem (mirrors __graft_entry__ phases 2/4)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from pytorch_geometric_signed_directed_tpu.data import DSBM
    from pytorch_geometric_signed_directed_tpu.graph import in_out_degree
    from pytorch_geometric_signed_directed_tpu.spectral import (
        magnet_propagators, magnetic_template)
    from pytorch_geometric_signed_directed_tpu.nn import (
        MagNet_node_classification)
    from pytorch_geometric_signed_directed_tpu.utils import (
        meta_graph_generation)

    n = 512
    F = meta_graph_generation("cyclic", 3, 0.05, False)
    A, labels = DSBM(n, 3, 0.3, F, rng=np.random.default_rng(1))
    edge_index = np.vstack(A.nonzero())
    w = A.tocoo().data
    x = in_out_degree(edge_index, n, edge_weight=w)
    x = jnp.asarray(x / max(x.max(), 1.0))
    y = jnp.asarray(labels)
    lap = magnet_propagators(edge_index, w, q=0.25, num_nodes=n, mode="mxu")
    tmpl = magnetic_template(edge_index, w, num_nodes=n, mode="mxu")
    model = MagNet_node_classification(
        num_features=2, hidden=16, K=2, label_dim=3, activation=True,
        layer=2)
    model_q = MagNet_node_classification(
        num_features=2, hidden=16, K=2, label_dim=3, trainable_q=True,
        q=0.25, activation=True, layer=2)
    params = model.init(jax.random.PRNGKey(2), x, x, lap)
    params_q = model_q.init(jax.random.PRNGKey(3), x, x, tmpl)
    return model, model_q, params, params_q, x, y, lap, tmpl, n


def run_steps(sharded: bool):
    """One Adam step of the frozen-mxu, trainable-q, and attention
    (SNEA) models; returns [(loss, norm)] * 3."""
    import jax
    import jax.numpy as jnp
    import optax
    from pytorch_geometric_signed_directed_tpu.parallel import (
        make_mesh, shard_attention_graphs, shard_magnet_laplacian)

    model, model_q, params, params_q, x, y, lap, tmpl, n = build_problem()
    tx = optax.adam(1e-2)

    mesh = make_mesh(len(jax.devices()), axis_names=("graph",))
    if sharded:
        lap = shard_magnet_laplacian(lap, mesh, axis="graph")
        tmpl = shard_magnet_laplacian(tmpl, mesh, axis="graph")
        assert lap.dual.mode == "mxu_sharded" and tmpl.mode == "mxu_sharded"

    out = []
    for mdl, p0, op in ((model, params, lap), (model_q, params_q, tmpl)):
        # the operator must be a jit ARGUMENT: in multi-process runs its
        # arrays span non-addressable devices and cannot be closure
        # constants
        @jax.jit
        def step(p, s, op_):
            def loss_fn(pp):
                logp = mdl.apply(pp, x, x, op_)
                return -jnp.mean(logp[jnp.arange(n), y])

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = tx.update(grads, s)
            return optax.apply_updates(p, updates), s, loss

        p1, _, loss = step(p0, tx.init(p0), op)
        out.append((float(loss), float(optax.global_norm(p1))))

    # attention tier (SNEA model forward under shard_map edge plans)
    import numpy as np
    from pytorch_geometric_signed_directed_tpu.data import SSBM, SignedData
    from pytorch_geometric_signed_directed_tpu.nn import SNEA
    from pytorch_geometric_signed_directed_tpu.nn.signed.snea import (
        prepare_snea_inputs)

    ns = 256
    (A_p, A_n), _ = SSBM(ns, 2, 0.3, 0.1, size_ratio=1,
                         rng=np.random.default_rng(4))
    d = SignedData(A=(A_p, A_n))
    edge_index_s = np.concatenate(
        [d.edge_index.T, np.sign(d.edge_weight)[:, None].astype(np.int64)],
        axis=1)
    _, _, init_emb, graphs = prepare_snea_inputs(ns, edge_index_s,
                                                 in_dim=8)
    snea = SNEA(node_num=ns, in_dim=8, out_dim=8, layer_num=2,
                init_emb=init_emb)
    params_s = snea.init(jax.random.PRNGKey(4), graphs)
    if sharded:
        graphs = shard_attention_graphs(graphs, mesh)

    @jax.jit
    def step_snea(p, s, graphs_):
        def loss_fn(pp):
            return (snea.apply(pp, graphs_) ** 2).sum()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    with mesh:
        p1, _, loss = step_snea(params_s, tx.init(params_s), graphs)
    out.append((float(loss), float(optax.global_norm(p1))))

    # signed dual-propagator tier (SGCN pos/neg under shard_map)
    from pytorch_geometric_signed_directed_tpu.nn import SGCN
    from pytorch_geometric_signed_directed_tpu.nn.signed.sgcn import (
        prepare_sgcn_inputs)
    from pytorch_geometric_signed_directed_tpu.parallel import (
        shard_propagator)

    _, _, emb_g, P_pos, P_neg = prepare_sgcn_inputs(
        ns, edge_index_s, in_dim=8, mode="mxu")
    sgcn = SGCN(node_num=ns, in_dim=8, out_dim=8, layer_num=2,
                init_emb=emb_g)
    params_g = sgcn.init(jax.random.PRNGKey(5), P_pos, P_neg)
    if sharded:
        P_pos = shard_propagator(P_pos, mesh)
        P_neg = shard_propagator(P_neg, mesh)

    @jax.jit
    def step_sgcn(p, s, Pp, Pn):
        def loss_fn(pp):
            return (sgcn.apply(pp, Pp, Pn) ** 2).sum()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    with mesh:
        p1, _, loss = step_sgcn(params_g, tx.init(params_g), P_pos, P_neg)
    out.append((float(loss), float(optax.global_norm(p1))))

    # motif-model tier (SDGNN: 4 motif AttnGraphs dispatched per layer)
    from pytorch_geometric_signed_directed_tpu.nn import SDGNN
    from pytorch_geometric_signed_directed_tpu.nn.signed.sdgnn import (
        prepare_sdgnn_inputs)

    _, _, emb_m, mgraphs, _, _ = prepare_sdgnn_inputs(
        ns, edge_index_s, in_dim=8)
    sdgnn = SDGNN(node_num=ns, in_dim=8, out_dim=8, layer_num=2,
                  init_emb=emb_m)
    params_m = sdgnn.init(jax.random.PRNGKey(6), mgraphs)
    if sharded:
        mgraphs = shard_attention_graphs(mgraphs, mesh)

    @jax.jit
    def step_sdgnn(p, s, graphs_):
        def loss_fn(pp):
            return (sdgnn.apply(pp, graphs_) ** 2).sum()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    with mesh:
        p1, _, loss = step_sdgnn(params_m, tx.init(params_m), mgraphs)
    out.append((float(loss), float(optax.global_norm(p1))))
    return out


def worker(pid: int, nprocs: int, out_path: str, port: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs, process_id=pid)
    assert len(jax.devices()) == 8, jax.devices()
    assert jax.process_count() == nprocs
    results = run_steps(sharded=True)
    if pid == 0:
        with open(out_path, "w") as f:
            json.dump(results, f)
    jax.distributed.shutdown()


def single(out_path: str):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    results = run_steps(sharded=True)
    with open(out_path, "w") as f:
        json.dump(results, f)


def launch():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    with tempfile.TemporaryDirectory() as td:
        ref = os.path.join(td, "single.json")
        env1 = dict(env)
        env1["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        subprocess.run(
            [sys.executable, __file__, "--single", "--out", ref],
            env=env1, check=True, cwd=REPO, timeout=1200)

        out = os.path.join(td, "multi.json")
        env2 = dict(env)
        env2["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, __file__, "--worker", str(i),
                 "--nprocs", "2", "--out", out, "--port", str(port)],
                env=env2, cwd=REPO)
            for i in range(2)
        ]
        rcs = [p.wait(timeout=1200) for p in procs]
        assert rcs == [0, 0], rcs

        with open(ref) as f:
            rs = json.load(f)
        with open(out) as f:
            rm = json.load(f)

    names = ["frozen mxu tier", "trainable-q template",
             "attention tier (SNEA)", "signed dual tier (SGCN)",
             "motif model tier (SDGNN)"]
    ok = True
    for name, (ls, ns), (lm, nm) in zip(names, rs, rm):
        # relative: phases span loss scales from ~1 to sum-square scale
        dl = abs(ls - lm) / max(1.0, abs(ls))
        dn = abs(ns - nm) / max(1.0, abs(ns))
        good = dl < 2e-5 and dn < 2e-4
        ok &= good
        print(f"multiprocess {name}: 1-proc loss={ls:.6f} "
              f"2-proc loss={lm:.6f} rel|dloss|={dl:.2e} "
              f"rel|dnorm|={dn:.2e} {'OK' if good else 'FAIL'}")
    print(json.dumps({"multiprocess_ok": ok, "phases": names,
                      "single": rs, "multi": rm}))
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--single", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--port", type=int, default=None)
    a = ap.parse_args()
    if a.worker is not None:
        if a.port is None:
            ap.error("--worker requires --port (the coordinator port "
                     "the launcher binds; pass any free port when "
                     "launching a worker by hand)")
        worker(a.worker, a.nprocs, a.out, a.port)
    elif a.single:
        single(a.out)
    else:
        sys.exit(launch())


if __name__ == "__main__":
    main()
