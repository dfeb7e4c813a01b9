"""Multi-device sharding: allclose parity between sharded and
single-device execution on the 8-device CPU mesh (SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pytorch_geometric_signed_directed_tpu.data import DSBM
from pytorch_geometric_signed_directed_tpu.graph import in_out_degree
from pytorch_geometric_signed_directed_tpu.nn import MagNet_node_classification
from pytorch_geometric_signed_directed_tpu.parallel import (
    make_mesh,
    replicate,
    shard_magnet_laplacian,
    shard_propagator,
)
from pytorch_geometric_signed_directed_tpu.ops import make_propagator
from pytorch_geometric_signed_directed_tpu.spectral import magnet_propagators
from pytorch_geometric_signed_directed_tpu.utils import meta_graph_generation


@pytest.fixture(scope="module")
def graph():
    F = meta_graph_generation("cyclic", 3, 0.05, False)
    A, labels = DSBM(128, 3, 0.3, F, rng=np.random.default_rng(0))
    edge_index = np.vstack(A.nonzero())
    w = A.tocoo().data
    return edge_index, w, labels


@pytest.mark.parametrize("mode", ["dense", "segment", "mxu"])
def test_sharded_propagator_matches_single(graph, mode):
    edge_index, w, _ = graph
    n = 128
    P = make_propagator(edge_index[0], edge_index[1], w, n, mode=mode)
    x = np.random.default_rng(1).standard_normal((n, 16)).astype(np.float32)
    ref = np.asarray(P(jnp.asarray(x)))

    mesh = make_mesh(8)
    P_sh = shard_propagator(P, mesh)
    with mesh:
        out = np.asarray(jax.jit(lambda p, v: p(v))(P_sh, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_sharded_magnet_forward_matches_single(graph):
    edge_index, w, labels = graph
    n = 128
    x = in_out_degree(edge_index, n, edge_weight=w)
    x = jnp.asarray(x / x.max())
    lap = magnet_propagators(edge_index, w, q=0.25, num_nodes=n)
    model = MagNet_node_classification(num_features=2, hidden=8, K=2,
                                       label_dim=3, activation=True)
    params = model.init(jax.random.PRNGKey(0), x, x, lap)
    ref = np.asarray(model.apply(params, x, x, lap))

    mesh = make_mesh(8)
    lap_sh = shard_magnet_laplacian(lap, mesh)
    params_sh = replicate(params, mesh)
    x_sh = replicate(x, mesh)
    with mesh:
        out = np.asarray(jax.jit(
            lambda p, xr, xi: model.apply(p, xr, xi, lap_sh)
        )(params_sh, x_sh, x_sh))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_sharded_grad_matches_single(graph):
    edge_index, w, labels = graph
    n = 128
    x = in_out_degree(edge_index, n, edge_weight=w)
    x = jnp.asarray(x / x.max())
    y = jnp.asarray(labels)
    lap = magnet_propagators(edge_index, w, q=0.25, num_nodes=n)
    model = MagNet_node_classification(num_features=2, hidden=8, K=2,
                                       label_dim=3)
    params = model.init(jax.random.PRNGKey(0), x, x, lap)

    def loss(p, lap_):
        logp = model.apply(p, x, x, lap_)
        return -jnp.mean(logp[jnp.arange(n), y])

    g_ref = jax.grad(loss)(params, lap)
    mesh = make_mesh(8)
    lap_sh = shard_magnet_laplacian(lap, mesh)
    with mesh:
        g_sh = jax.jit(jax.grad(loss))(replicate(params, mesh), lap_sh)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


class TestEdgePartitionedSpMM:
    def test_matches_single_device(self, graph):
        from pytorch_geometric_signed_directed_tpu.ops import build_coo
        from pytorch_geometric_signed_directed_tpu.parallel import (
            partition_coo, place, sharded_spmm)
        from pytorch_geometric_signed_directed_tpu.ops.spmm import spmm_coo

        edge_index, w, _ = graph
        n = 128
        A = build_coo(edge_index[0], edge_index[1], w, n,
                      sum_duplicates=True)
        x = jnp.asarray(
            np.random.default_rng(3).standard_normal((n, 8)).astype(
                np.float32))
        ref = np.asarray(spmm_coo(A, x))

        mesh = make_mesh(8)
        pcoo = place(partition_coo(A, 8), mesh)
        with mesh:
            out = np.asarray(jax.jit(
                lambda p, v: sharded_spmm(p, v, mesh))(pcoo, x))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_uneven_rows(self):
        from pytorch_geometric_signed_directed_tpu.ops import build_coo
        from pytorch_geometric_signed_directed_tpu.parallel import (
            partition_coo, place, sharded_spmm)
        from pytorch_geometric_signed_directed_tpu.ops.spmm import spmm_coo

        rng = np.random.default_rng(7)
        n = 101  # not divisible by 8
        row = rng.integers(0, n, 700)
        col = rng.integers(0, n, 700)
        val = rng.standard_normal(700).astype(np.float32)
        A = build_coo(row, col, val, n, sum_duplicates=True)
        x = jnp.asarray(rng.standard_normal((n, 5)).astype(np.float32))
        ref = np.asarray(spmm_coo(A, x))
        mesh = make_mesh(8)
        pcoo = place(partition_coo(A, 8), mesh)
        with mesh:
            out = np.asarray(jax.jit(
                lambda p, v: sharded_spmm(p, v, mesh))(pcoo, x))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[1] == 3


@pytest.mark.slow
def test_two_axis_mesh_parallel_trainings():
    """(data x graph) mesh: vmapped independent trainings sharded on
    "data" while graph operators shard on "graph" — matches single-device
    execution."""
    import optax
    from pytorch_geometric_signed_directed_tpu.parallel import (
        make_mesh, replicate, shard_magnet_laplacian)
    from pytorch_geometric_signed_directed_tpu.spectral import (
        magnet_propagators)
    from pytorch_geometric_signed_directed_tpu.nn import (
        MagNet_node_classification)
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(0)
    n, e = 64, 400
    ei = np.vstack([rng.integers(0, n, e), rng.integers(0, n, e)])
    w = rng.random(e).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((n, 4)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, n))
    lap = magnet_propagators(ei, w, q=0.25, num_nodes=n, mode="segment")
    model = MagNet_node_classification(num_features=4, hidden=8, K=2,
                                       label_dim=3, activation=True)
    tx = optax.adam(1e-2)

    def one_step(params, opt_state):
        def loss_fn(p):
            logp = model.apply(p, x, x, lap_s)
            return -jnp.mean(logp[jnp.arange(n), y])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    stack = jax.vmap(lambda k: model.init(k, x, x, lap))(keys)
    opt_stack = jax.vmap(tx.init)(stack)

    # single-device reference
    lap_s = lap
    _, _, ref_losses = jax.jit(jax.vmap(one_step))(stack, opt_stack)

    mesh = make_mesh(shape=(2, 4), axis_names=("data", "graph"))
    lap_s = shard_magnet_laplacian(lap, mesh, axis="graph")
    x = replicate(x, mesh)
    y = replicate(y, mesh)
    ds = lambda t: jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("data"))), t)
    with mesh:
        _, _, losses = jax.jit(jax.vmap(one_step))(ds(stack), ds(opt_stack))
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref_losses),
                               rtol=1e-4, atol=1e-5)


def test_sharded_mxu_propagator_grad(graph):
    """Sharded Pallas tier: backward (transposed-plan forward under
    shard_map) matches the single-device gradient."""
    edge_index, w, _ = graph
    n = 128
    P = make_propagator(edge_index[0], edge_index[1], w, n, mode="mxu")
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((n, 12)).astype(np.float32))

    def loss(p, v):
        return (p(v) ** 2).sum()

    g_ref = np.asarray(jax.grad(loss, argnums=1)(P, x))
    mesh = make_mesh(8)
    P_sh = shard_propagator(P, mesh)
    assert P_sh.mode == "mxu_sharded"
    with mesh:
        g = np.asarray(jax.jit(jax.grad(loss, argnums=1))(P_sh, x))
    np.testing.assert_allclose(g, g_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("streamed", [False, True])
def test_sharded_mxu_dual_matches_flat(streamed):
    """mxu-mode fused dual re-partitioned under shard_map == unsharded,
    for both flat-plan and stream-built duals (exercises the host-side
    plan->COO extraction)."""
    from pytorch_geometric_signed_directed_tpu.ops.spmm import (
        dual_propagator, dual_spmm, dual_spmm_stacked)
    from pytorch_geometric_signed_directed_tpu.ops.coalesce import (
        coalesce_edges)
    from pytorch_geometric_signed_directed_tpu.ops.pallas import (
        scatter_mxu as sm)
    from pytorch_geometric_signed_directed_tpu.parallel import shard_dual

    rng = np.random.default_rng(5)
    n, e = 512, 4000
    row, col, va, vb = coalesce_edges(
        rng.integers(0, n, e), rng.integers(0, n, e),
        rng.standard_normal(e).astype(np.float32),
        rng.standard_normal(e).astype(np.float32), num_cols=n)
    if streamed:
        orig = sm.STREAM_THRESHOLD_EDGES, sm.STREAM_BLOCK_EDGES
        sm.STREAM_THRESHOLD_EDGES, sm.STREAM_BLOCK_EDGES = 1000, 2048
        try:
            D = dual_propagator(row, col, va, vb, n, mode="mxu")
        finally:
            sm.STREAM_THRESHOLD_EDGES, sm.STREAM_BLOCK_EDGES = orig
        assert D.stream is not None
    else:
        D = dual_propagator(row, col, va, vb, n, mode="mxu")
        assert D.plan is not None
    xa = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    xb = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    ya, yb = dual_spmm(D, xa, xb)

    mesh = make_mesh(8)
    Ds = shard_dual(D, mesh)
    assert Ds is not None and Ds.mode == "mxu_sharded"
    with mesh:
        ya_s, yb_s = jax.jit(dual_spmm)(Ds, xa, xb)
    np.testing.assert_allclose(np.asarray(ya_s), np.asarray(ya),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(yb_s), np.asarray(yb),
                               rtol=1e-4, atol=1e-4)

    # backward parity through the stacked custom VJP
    xcat = jnp.concatenate([xa, xb], axis=1)
    g_ref = jax.grad(lambda v: (dual_spmm_stacked(D, v) ** 2).sum())(xcat)
    with mesh:
        g = jax.jit(
            jax.grad(lambda v: (dual_spmm_stacked(Ds, v) ** 2).sum()))(xcat)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_sharded_magnet_mxu_forward_and_grad(graph):
    """Full MagNet model over an mxu-mode Laplacian (fused dual) sharded
    across the mesh — forward and grads match single-device."""
    edge_index, w, labels = graph
    n = 128
    x = in_out_degree(edge_index, n, edge_weight=w)
    x = jnp.asarray(x / x.max())
    y = jnp.asarray(labels)
    lap = magnet_propagators(edge_index, w, q=0.25, num_nodes=n, mode="mxu")
    assert lap.dual is not None and lap.dual.mode == "mxu"
    model = MagNet_node_classification(num_features=2, hidden=8, K=2,
                                       label_dim=3, activation=True)
    params = model.init(jax.random.PRNGKey(0), x, x, lap)

    def loss(p, lap_):
        logp = model.apply(p, x, x, lap_)
        return -jnp.mean(logp[jnp.arange(n), y])

    ref = np.asarray(model.apply(params, x, x, lap))
    g_ref = jax.grad(loss)(params, lap)

    mesh = make_mesh(8)
    lap_sh = shard_magnet_laplacian(lap, mesh)
    assert lap_sh.dual.mode == "mxu_sharded"
    with mesh:
        out = np.asarray(jax.jit(
            lambda p: model.apply(p, x, x, lap_sh))(params))
        g_sh = jax.jit(jax.grad(loss))(replicate(params, mesh), lap_sh)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_sharded_dual_matches_flat():
    """Segment-mode fused dual under GSPMD == unsharded dual."""
    from pytorch_geometric_signed_directed_tpu.ops.spmm import (
        dual_propagator, dual_spmm)
    from pytorch_geometric_signed_directed_tpu.ops.coalesce import (
        coalesce_edges)
    from pytorch_geometric_signed_directed_tpu.parallel import (
        make_mesh, replicate, shard_dual)

    rng = np.random.default_rng(3)
    n, e = 96, 600
    row, col, va, vb = coalesce_edges(
        rng.integers(0, n, e), rng.integers(0, n, e),
        rng.standard_normal(e).astype(np.float32),
        rng.standard_normal(e).astype(np.float32), num_cols=n)
    D = dual_propagator(row, col, va, vb, n, mode="segment")
    xa = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    xb = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    ya, yb = dual_spmm(D, xa, xb)

    mesh = make_mesh(8, axis_names=("graph",))
    Ds = shard_dual(D, mesh)
    with mesh:
        ya_s, yb_s = jax.jit(dual_spmm)(Ds, replicate(xa, mesh),
                                        replicate(xb, mesh))
    np.testing.assert_allclose(np.asarray(ya_s), np.asarray(ya),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(yb_s), np.asarray(yb),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_sharded_dual_from_col_split_operator(monkeypatch):
    """A col-split single-chip dual re-partitions correctly: the
    extraction must map compact hot col ids back to the originals."""
    from pytorch_geometric_signed_directed_tpu.ops.spmm import (
        dual_propagator, dual_spmm)
    from pytorch_geometric_signed_directed_tpu.ops.coalesce import (
        coalesce_edges)
    from pytorch_geometric_signed_directed_tpu.ops.pallas import (
        scatter_mxu as sm)
    from pytorch_geometric_signed_directed_tpu.parallel import shard_dual

    monkeypatch.setattr(sm, "COL_SPLIT_MIN_COLS", 100)
    monkeypatch.setattr(sm, "GATHER_FAST_ROWS", 64)
    monkeypatch.setattr(sm, "COL_SPLIT_MIN_COVERAGE", 0.0)

    rng = np.random.default_rng(9)
    n, e = 512, 6000
    row, col, va, vb = coalesce_edges(
        rng.integers(0, n, e), (rng.zipf(1.3, e) - 1) % n,
        rng.standard_normal(e).astype(np.float32),
        rng.standard_normal(e).astype(np.float32), num_cols=n)
    for streamed in (False, True):
        if streamed:
            monkeypatch.setattr(sm, "STREAM_THRESHOLD_EDGES", 1000)
            monkeypatch.setattr(sm, "STREAM_BLOCK_EDGES", 2048)
        D = dual_propagator(row, col, va, vb, n, mode="mxu")
        assert D.hot_ids is not None
        assert (D.stream is not None) == streamed
        xa = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
        xb = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
        ya, yb = dual_spmm(D, xa, xb)

        mesh = make_mesh(8)
        Ds = shard_dual(D, mesh)
        # the sharded rebuild must itself re-split (same thresholds)
        assert Ds.plan.hot_ids is not None and Ds.plan.hot_chunks > 0
        with mesh:
            ya_s, yb_s = jax.jit(dual_spmm)(Ds, xa, xb)
        np.testing.assert_allclose(np.asarray(ya_s), np.asarray(ya),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(yb_s), np.asarray(yb),
                                   rtol=1e-4, atol=1e-4)

        # backward parity through the sharded split layout
        from pytorch_geometric_signed_directed_tpu.ops.spmm import (
            dual_spmm_stacked)
        xcat = jnp.concatenate([xa, xb], axis=1)
        g_ref = jax.grad(
            lambda v: (dual_spmm_stacked(D, v) ** 2).sum())(xcat)
        with mesh:
            g = jax.jit(jax.grad(
                lambda v: (dual_spmm_stacked(Ds, v) ** 2).sum()))(xcat)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_sharded_mxu_mixed_device_col_split(monkeypatch):
    """Per-device hot tables: devices whose row range sees hub-heavy
    columns split, devices with uniform columns fail the coverage gate —
    the mixed stacked layout must still match the single-chip result."""
    from pytorch_geometric_signed_directed_tpu.ops.spmm import (
        Propagator, make_propagator, spmm_coo)
    from pytorch_geometric_signed_directed_tpu.ops.coalesce import (
        coalesce_edges)
    from pytorch_geometric_signed_directed_tpu.ops.pallas import (
        scatter_mxu as sm)
    from pytorch_geometric_signed_directed_tpu.parallel.mxu_shard import (
        build_sharded_mxu, sharded_mxu_spmm)

    monkeypatch.setattr(sm, "COL_SPLIT_MIN_COLS", 100)
    monkeypatch.setattr(sm, "GATHER_FAST_ROWS", 32)
    monkeypatch.setattr(sm, "COL_SPLIT_MIN_COVERAGE", 0.6)

    rng = np.random.default_rng(11)
    n = 512
    rows_per = n // 8
    # device 0's rows: 90% of edges hit 4 hub columns (splits);
    # devices 1-7: uniform columns (fails the 0.6 coverage gate at 32
    # hot rows out of 512)
    r0 = rng.integers(0, rows_per, 3000)
    c0 = np.where(rng.random(3000) < 0.9, rng.integers(0, 4, 3000),
                  rng.integers(0, n, 3000))
    r1 = rng.integers(rows_per, n, 6000)
    c1 = rng.integers(0, n, 6000)
    row, col, val = coalesce_edges(
        np.concatenate([r0, r1]), np.concatenate([c0, c1]),
        rng.standard_normal(9000).astype(np.float32), num_cols=n)

    mesh = make_mesh(8)
    S = build_sharded_mxu(row, col, val, n, n, mesh)
    assert S.hot_ids is not None and S.hot_ids.shape[0] == 8
    assert S.hot_chunks > 0

    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    ref = spmm_coo(make_propagator(row, col, val, n, mode="segment").coo, x)
    with mesh:
        got = jax.jit(sharded_mxu_spmm)(
            Propagator(coo=None, dense=None, bsr=None, mxu=S,
                       mode="mxu_sharded").mxu, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    with mesh:
        g = jax.jit(jax.grad(
            lambda v: (sharded_mxu_spmm(S, v) ** 2).sum()))(x)
    g_ref = jax.grad(lambda v: (spmm_coo(
        make_propagator(row, col, val, n, mode="segment").coo, v) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-3)


def test_sharded_template_trainable_q(monkeypatch):
    """Multi-chip trainable q: the sharded template apply (per-device
    plans, psum'd fused-SDDMM dq) matches the flat mxu template for
    forward, dx, and dq."""
    from pytorch_geometric_signed_directed_tpu.spectral import (
        magnetic_template, template_dual_apply)
    from pytorch_geometric_signed_directed_tpu.parallel import (
        shard_magnet_laplacian)

    rng = np.random.default_rng(13)
    n = 384
    ei = np.vstack([rng.integers(0, n, 3000), rng.integers(0, n, 3000)])
    w = rng.random(3000).astype(np.float32)
    tmpl = magnetic_template(ei, w, num_nodes=n, mode="mxu")
    mesh = make_mesh(8)
    tmpl_s = shard_magnet_laplacian(tmpl, mesh)
    assert tmpl_s.mode == "mxu_sharded"

    x = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    g_out = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    q0 = 0.21

    def f(t):
        return lambda q, x: (template_dual_apply(t, q, x) * g_out).sum()

    v_flat = float(f(tmpl)(q0, x))
    with mesh:
        v_sh = float(jax.jit(f(tmpl_s))(q0, x))
    np.testing.assert_allclose(v_sh, v_flat, rtol=1e-5)

    dq_f, dx_f = jax.grad(f(tmpl), argnums=(0, 1))(q0, x)
    with mesh:
        dq_s, dx_s = jax.jit(jax.grad(f(tmpl_s), argnums=(0, 1)))(q0, x)
    np.testing.assert_allclose(np.asarray(dx_s), np.asarray(dx_f),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(dq_s), float(dq_f),
                               rtol=1e-3, atol=1e-6)


@pytest.mark.slow
def test_sharded_trainable_q_magnet_model():
    """A trainable-q MagNet grad step over the sharded template matches
    single-device."""
    from pytorch_geometric_signed_directed_tpu.spectral import (
        magnetic_template)
    from pytorch_geometric_signed_directed_tpu.parallel import (
        shard_magnet_laplacian)

    rng = np.random.default_rng(17)
    n = 256
    ei = np.vstack([rng.integers(0, n, 2000), rng.integers(0, n, 2000)])
    tmpl = magnetic_template(ei, None, num_nodes=n, mode="mxu")
    x = jnp.asarray(rng.standard_normal((n, 4)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, n))
    model = MagNet_node_classification(
        num_features=4, hidden=8, K=2, label_dim=3, trainable_q=True,
        q=0.2, activation=True)
    params = model.init(jax.random.PRNGKey(0), x, x, tmpl)

    def loss(p, lap):
        logp = model.apply(p, x, x, lap)
        return -jnp.mean(logp[jnp.arange(n), y])

    g_ref = jax.grad(loss)(params, tmpl)
    mesh = make_mesh(8)
    tmpl_s = shard_magnet_laplacian(tmpl, mesh)
    with mesh:
        g_sh = jax.jit(jax.grad(loss))(replicate(params, mesh), tmpl_s)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_multiprocess_parity():
    """Cross-process mechanics (VERDICT r3 item 2): 2 OS processes x 4
    devices vs 1 process x 8 — scripts/dryrun_multiprocess.py asserts
    loss/param-norm parity for the frozen mxu and trainable-q steps."""
    import subprocess
    import sys
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS",)}
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts",
                                      "dryrun_multiprocess.py")],
        env=env, cwd=repo, timeout=1500, capture_output=True, text=True)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert '"multiprocess_ok": true' in r.stdout


def test_sgcn_fused_dual_sharded_parity():
    """SGCN over the round-5 fused union-edge-set dual, sharded via
    shard_dual, matches the flat fused path (fwd + grad norm)."""
    import optax
    from pytorch_geometric_signed_directed_tpu.nn import SGCN
    from pytorch_geometric_signed_directed_tpu.nn.signed.sgcn import (
        prepare_sgcn_inputs)
    from pytorch_geometric_signed_directed_tpu.parallel import (
        make_mesh, shard_dual)

    rng = np.random.default_rng(21)
    n, e = 256, 2000
    edges = np.column_stack([rng.integers(0, n, e), rng.integers(0, n, e),
                             rng.choice([-1, 1], e)]).astype(np.int64)
    _, _, emb, D, none = prepare_sgcn_inputs(n, edges, in_dim=8,
                                             mode="mxu", fused=True)
    assert none is None
    model = SGCN(node_num=n, in_dim=8, out_dim=8, layer_num=2,
                 init_emb=emb)
    params = model.init(jax.random.PRNGKey(0), D, None)
    mesh = make_mesh(8, axis_names=("graph",))
    D_sh = shard_dual(D, mesh)
    assert D_sh.mode == "mxu_sharded"

    def loss(p, dd):
        return (model.apply(p, dd, None) ** 2).sum()

    with mesh:
        l_sh = jax.jit(loss)(params, D_sh)
        g_sh = jax.jit(jax.grad(loss))(params, D_sh)
    l_f = jax.jit(loss)(params, D)
    g_f = jax.jit(jax.grad(loss))(params, D)
    assert abs(float(l_sh) - float(l_f)) / max(1.0, abs(float(l_f))) < 1e-5
    dn = abs(float(optax.global_norm(g_sh)) - float(optax.global_norm(g_f)))
    assert dn / max(1.0, float(optax.global_norm(g_f))) < 1e-5
