"""Magnetic and signed magnetic Laplacians (host-side) + jit-safe templates.

Numerics follow the reference exactly:
  * get_magnetic_Laplacian — reference
    torch_geometric_signed_directed/utils/directed/get_magnetic_Laplacian.py:10-93
  * get_magnetic_signed_Laplacian — reference
    utils/general/get_magnetic_signed_Laplacian.py:10-99
  * the Chebyshev rescale (2L/lambda_max − I) — reference
    nn/directed/MagNetConv.py:100-120 (__norm__)

TPU-first redesign: instead of re-dispatching a Python scatter per forward
(reference MagNetConv caches (edge_index, norm) tuples), we bake the scaled
Laplacian into a pair of frozen :class:`~...ops.spmm.Propagator` linear
operators once, so a whole model forward jits into one XLA program.  For a
*trainable* phase q, :func:`magnetic_template` precomputes the q-independent
structure (normalized symmetrized weights + phase angles) and
:func:`template_propagators` rebuilds the two operators *inside* jit with
pure elementwise math — no host round-trip per step, which the reference
cannot do at all (it rebuilds the Laplacian on CPU every forward).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..ops.coalesce import coalesce_edges
from ..ops.coo import build_coo
from ..ops.spmm import (
    _DENSE_AUTO_MAX_NODES,
    DualPropagator,
    Propagator,
    _dual_forward_stacked,
    dual_propagator,
    propagator_from_coo,
    propagators_from_dual,
)


@struct.dataclass
class MagneticPair:
    """(L_hat_re, L_hat_im) + optional fused same-structure operator.

    Unpacks like the plain tuple it replaces (``P_re, P_im = pair``).
    ``dual`` is populated on the sparse tiers, where applying both
    operators as one lane-stacked gather+scatter halves the hot-loop cost
    (see ops.spmm.DualPropagator); None on the dense tier.
    """

    re: Propagator
    im: Propagator
    dual: Optional[DualPropagator] = None

    def __iter__(self):
        return iter((self.re, self.im))

    def __len__(self):
        return 2

    def __getitem__(self, i):
        return (self.re, self.im)[i]


def _remove_self_loops(edge_index, edge_weight):
    edge_index = np.asarray(edge_index)
    mask = edge_index[0] != edge_index[1]
    ew = None if edge_weight is None else np.asarray(edge_weight)[mask]
    return edge_index[:, mask], ew


def _symmetrize(edge_index, edge_weight, num_nodes):
    """Coalesced symmetrization: per unique (i, j) with i != j returns
    sym = (w_ij + w_ji)/2, theta = w_ij - w_ji, abs_sym = (|w_ij|+|w_ji|)/2.

    Matches the concat-both-directions + coalesce('add') construction of the
    reference (get_magnetic_Laplacian.py:52-63); output sorted by (row, col).
    """
    if edge_weight is None:
        edge_weight = np.ones(np.asarray(edge_index).shape[1],
                              dtype=np.float64)
    else:
        edge_weight = np.asarray(edge_weight, dtype=np.float64)
    # Giant inputs: fused native pass (keys for both directions built on
    # the fly, self-loops skipped in C++, one threaded radix sort + one
    # accumulate) — replaces ~23s of numpy concat/sort/reduce at WikiTalk
    # scale with ~8s.  Same output contract, float64 accumulation.
    ei_arr = np.asarray(edge_index)
    if ei_arr.shape[1] >= (1 << 20):
        from ..native import symmetrize as native_symmetrize

        out = native_symmetrize(ei_arr[0], ei_arr[1], edge_weight,
                                num_nodes)
        if out is not None:
            row, col, sym, theta, abs_sym = out
            return row, col, sym / 2.0, theta, abs_sym / 2.0
    edge_index, edge_weight = _remove_self_loops(ei_arr, edge_weight)
    row0, col0 = edge_index[0], edge_index[1]
    r = np.concatenate([row0, col0])
    c = np.concatenate([col0, row0])
    sym_attr = np.concatenate([edge_weight, edge_weight])
    theta_attr = np.concatenate([edge_weight, -edge_weight])
    abs_attr = np.concatenate([np.abs(edge_weight), np.abs(edge_weight)])

    row, col, sym, theta, abs_sym = coalesce_edges(
        r, c, sym_attr, theta_attr, abs_attr, num_cols=num_nodes)
    return row, col, sym / 2.0, theta, abs_sym / 2.0


def _maybe_num_nodes(edge_index, num_nodes):
    if num_nodes is not None:
        return int(num_nodes)
    edge_index = np.asarray(edge_index)
    return int(edge_index.max()) + 1 if edge_index.size else 0


def _laplacian_core(
    edge_index,
    edge_weight,
    normalization: Optional[str],
    num_nodes: Optional[int],
    q: float,
    return_lambda_max: bool,
    signed: bool,
    absolute_degree: bool = True,
):
    assert normalization in (None, "sym"), "Invalid normalization"
    num_nodes = _maybe_num_nodes(edge_index, num_nodes)

    # Giant sym-normalized builds: the whole host pipeline (symmetrize +
    # degree + D^-1/2 A D^-1/2 + phase cos/sin + diagonal layout) runs
    # as ONE native call — the numpy path below pays ~5 extra 16M-row
    # float64 passes at WikiTalk scale.  Identical double-precision
    # formulas; cross-checked in tests/test_native.py.
    ei_arr = np.asarray(edge_index)
    if (normalization == "sym" and not return_lambda_max
            and ei_arr.shape[1] >= (1 << 20)):
        from ..native import magnetic_sym_lap

        if edge_weight is None:
            w_in = np.ones(ei_arr.shape[1], np.float64)
        else:
            w_in = np.asarray(edge_weight, np.float64)
        deg_mode = 0 if not signed else (1 if absolute_degree else 2)
        out = magnetic_sym_lap(ei_arr[0], ei_arr[1], w_in, num_nodes,
                               q, deg_mode)
        if out is not None:
            orow, ocol, w_re, w_im = out
            return np.stack([orow, ocol]), w_re, w_im

    row, col, sym, theta, abs_sym = _symmetrize(edge_index, edge_weight, num_nodes)

    if not signed:
        deg_w = sym
    elif absolute_degree:
        deg_w = abs_sym
    else:
        deg_w = np.abs(sym)
    deg = np.bincount(row, weights=deg_w, minlength=num_nodes)

    # exp(i*ang) kept as separate cos/sin — complex128 temporaries double
    # the memory traffic of this pass at giant scale for no precision gain
    ang = (2 * np.pi * q) * theta
    cos_p, sin_p = np.cos(ang), np.sin(ang)

    if normalization is None:
        # L = D - A_sym . exp(i Theta); edges first, then self-loop deg
        # entries — same ordering as the reference's add_self_loops append.
        out_row = np.concatenate([row, np.arange(num_nodes)])
        out_col = np.concatenate([col, np.arange(num_nodes)])
        w_re = np.concatenate([-sym * cos_p, deg])
        w_im = np.concatenate([-sym * sin_p, np.zeros(num_nodes)])
    else:
        deg_inv_sqrt = np.zeros_like(deg)
        nz = deg > 0
        deg_inv_sqrt[nz] = deg[nz] ** -0.5
        norm_w = deg_inv_sqrt[row] * sym * deg_inv_sqrt[col]
        out_row = np.concatenate([row, np.arange(num_nodes)])
        out_col = np.concatenate([col, np.arange(num_nodes)])
        w_re = np.concatenate([-norm_w * cos_p, np.ones(num_nodes)])
        w_im = np.concatenate([-norm_w * sin_p, np.zeros(num_nodes)])

    edge_index_out = np.stack([out_row, out_col])
    if not return_lambda_max:
        return edge_index_out, w_re, w_im
    import scipy.sparse as sp
    from scipy.sparse.linalg import eigsh

    L = sp.coo_matrix((w_re + 1j * w_im, (out_row, out_col)),
                      shape=(num_nodes, num_nodes))
    lambda_max = eigsh(L.tocsr(), k=1, which="LM", return_eigenvectors=False)
    lambda_max = float(np.asarray(lambda_max).real.item())
    return edge_index_out, w_re, w_im, lambda_max


def magnetic_laplacian(
    edge_index,
    edge_weight=None,
    normalization: Optional[str] = "sym",
    num_nodes: Optional[int] = None,
    q: float = 0.25,
    return_lambda_max: bool = False,
):
    """Magnetic Laplacian of a directed graph (MagNet, NeurIPS'21).

    Returns ``(edge_index [2, E'], w_real, w_imag[, lambda_max])`` as numpy.
    Reference: utils/directed/get_magnetic_Laplacian.py:10-93.
    """
    return _laplacian_core(edge_index, edge_weight, normalization, num_nodes,
                           q, return_lambda_max, signed=False)


def magnetic_signed_laplacian(
    edge_index,
    edge_weight=None,
    normalization: Optional[str] = "sym",
    num_nodes: Optional[int] = None,
    q: float = 0.25,
    return_lambda_max: bool = False,
    absolute_degree: bool = True,
):
    """Signed magnetic Laplacian (MSGNN, LoG'22).

    Reference: utils/general/get_magnetic_signed_Laplacian.py:10-99.
    """
    return _laplacian_core(edge_index, edge_weight, normalization, num_nodes,
                           q, return_lambda_max, signed=True,
                           absolute_degree=absolute_degree)


def magnet_propagators(
    edge_index,
    edge_weight=None,
    q: float = 0.25,
    normalization: Optional[str] = "sym",
    num_nodes: Optional[int] = None,
    lambda_max: Optional[float] = None,
    mode: str = "auto",
    signed: bool = False,
    absolute_degree: bool = True,
) -> MagneticPair:
    """Build the scaled Chebyshev operator pair (L_hat_re, L_hat_im).

    L_hat = 2 L / lambda_max − I, exactly the (edge_index, norm) pair the
    reference's MagNetConv.__norm__ caches (nn/directed/MagNetConv.py:100-120)
    — but frozen into MXU-ready Propagators once, ahead of jit.

    Orientation subtlety: the reference's ``setdefault('flow',
    'target_to_source')`` runs AFTER ``super().__init__`` (MagNetConv.py:47
    vs :51, same in MSConv.py:45 vs :49) and is dead code, so PyG's default
    flow applies and its propagate computes ``out[tgt] += norm * x[src]``
    — i.e. the conv multiplies by L_hat^T.  L_re is symmetric, L_im is
    antisymmetric, so matching the reference bit-for-bit means negating the
    imaginary operator; we bake the transpose in here.
    """
    num_nodes = _maybe_num_nodes(edge_index, num_nodes)
    fn = magnetic_signed_laplacian if signed else magnetic_laplacian
    kwargs = dict(normalization=normalization, num_nodes=num_nodes, q=q)
    if signed:
        kwargs["absolute_degree"] = absolute_degree
    if normalization != "sym" and lambda_max is None:
        ei, w_re, w_im, lambda_max = fn(
            edge_index, edge_weight, return_lambda_max=True, **kwargs)
    else:
        ei, w_re, w_im = fn(edge_index, edge_weight, **kwargs)
    if lambda_max is None:
        lambda_max = 2.0

    w_re = 2.0 * w_re / lambda_max
    # minus: the conv applies L^T and L_im is antisymmetric (see docstring)
    w_im = -2.0 * w_im / lambda_max
    # Extra self-loops of -1 on the real part: L_hat = 2L/lambda - I
    # (reference MagNetConv.py:110-111).  The imaginary part keeps explicit
    # zero-weight loops so both operators share one coalesced structure —
    # that shared sparsity is what lets the sparse tiers apply (re, im) as
    # a single lane-stacked gather+scatter (DualPropagator).
    #
    # _laplacian_core returns [unique (row, col)-sorted off-diagonal edges;
    # then the N diagonal entries] — the -I therefore lands entirely on the
    # trailing loop section, and producing the final coalesced layout is a
    # merge of two sorted unique key sequences, not a re-sort of the whole
    # edge list (the full coalesce cost ~9s of preprocessing at WikiTalk
    # scale).
    loops = np.arange(num_nodes)
    e_off = ei.shape[1] - num_nodes
    if not (np.array_equal(ei[0, e_off:], loops)
            and np.array_equal(ei[1, e_off:], loops)):
        raise ValueError("unexpected Laplacian layout (trailing diagonal)")
    w_re[e_off:] -= 1.0
    ke = ei[0, :e_off] * np.int64(num_nodes) + ei[1, :e_off]
    kl = loops * np.int64(num_nodes) + loops
    # the merge requires ke and kl disjoint (off-diagonal edges only —
    # _symmetrize strips self-loops); a violation would silently collide
    # two writes and ship an uninitialized slot, so fail loud instead
    diag_hits = np.searchsorted(ke, kl)
    if len(ke):
        hit = diag_hits < len(ke)
        if np.any(ke[diag_hits[hit]] == kl[hit]):
            raise ValueError(
                "diagonal entry in the Laplacian edge section")
    edge_dst = np.arange(e_off) + np.searchsorted(kl, ke)
    loop_dst = diag_hits + loops
    total = e_off + num_nodes
    row = np.empty(total, np.int64)
    col = np.empty(total, np.int64)
    vre = np.empty(total, w_re.dtype)
    vim = np.empty(total, w_im.dtype)
    for dst, sl in ((edge_dst, slice(None, e_off)),
                    (loop_dst, slice(e_off, None))):
        row[dst] = ei[0, sl]
        col[dst] = ei[1, sl]
        vre[dst] = w_re[sl]
        vim[dst] = w_im[sl]

    dual = dual_propagator(row, col, vre, vim, num_nodes, mode=mode)
    # When the fused dual exists it carries the hot path (MagNetConv /
    # MSConv use it exclusively), and the standalone re/im operators are
    # free VIEWS over its plan-ordered tensors (propagators_from_dual) —
    # same tier, no extra plan construction, no device round-trip.  Before
    # this sharing, building the singles separately was ~2/3 of
    # preprocessing time at WikiTalk scale (4 of 6 host plan builds plus
    # six multi-second device fetches, measured on the tunneled v5e).
    if dual is not None and dual.mode == "mxu":
        P_re, P_im = propagators_from_dual(dual)
        return MagneticPair(re=P_re, im=P_im, dual=dual)
    single_mode = ("segment" if (dual is not None and mode == "auto")
                   else mode)
    A_re = build_coo(row, col, vre, num_nodes)
    A_im = build_coo(row, col, vim, num_nodes)
    return MagneticPair(
        re=propagator_from_coo(A_re, mode=single_mode),
        im=propagator_from_coo(A_im, mode=single_mode),
        dual=dual,
    )


@struct.dataclass
class MagneticTemplate:
    """q-independent structure of the sym-normalized magnetic Laplacian.

    For trainable q (sym normalization, lambda_max = 2): the scaled operator
    is purely off-diagonal, L_hat_re = −A_norm . cos(2 pi q Theta),
    L_hat_im = −A_norm . sin(2 pi q Theta), so rebuilding it inside jit is
    elementwise math on the frozen structure.  The reference instead
    rebuilds the Laplacian on CPU every forward (MagNetConv.py:141-183).

    ``dense`` mode stores A_norm and Theta as [N, N] matrices;
    ``segment`` mode stores padded sorted COO edge structure;
    ``mxu`` mode stores the Pallas scatter plan (flat or streamed) with
    A_norm/Theta in plan order — the plan is q-independent, so trainable-q
    models run the flagship kernel with only the per-edge values traced.
    ``transposed`` (mxu only) carries the same per-edge values in the
    transposed plan's order; applying the identical value formulas to it
    yields the true operator transposes (cos is even, and the backward
    needs B^T's entry at (j,i) to equal B's value at (i,j)).
    """

    a_norm: jnp.ndarray  # dense [N,N], per-edge [E_pad], or [S, E_blk]
    theta: jnp.ndarray   # matching shape
    row: Optional[jnp.ndarray]  # segment mode only
    col: Optional[jnp.ndarray]  # segment + mxu modes
    num_nodes: int = struct.field(pytree_node=False)
    mode: str = struct.field(pytree_node=False)
    plan: Optional[object] = None    # ops.pallas.scatter_mxu.ScatterPlan
    stream: Optional[object] = None  # ops.pallas.scatter_mxu.StreamPlan
    transposed: object = None        # Optional[MagneticTemplate]
    # col-split layouts: hot edges' col ids index x[hot_ids] (see
    # ops.pallas.scatter_mxu.col_degree_split); None = unsplit
    hot_ids: Optional[jnp.ndarray] = None


def _mxu_template(row, col, a_norm, theta, num_nodes: int,
                  with_transpose: bool = True) -> MagneticTemplate:
    # The transposed structure carries the ORIGINAL per-edge values (see
    # class docstring for why the formulas then transpose correctly).
    # Its plan build is independent of the forward's, so overlap the two
    # in a worker thread (same tail-shaving as ops.spmm.dual_propagator).
    t_fut = ex = None
    if with_transpose:
        from concurrent.futures import ThreadPoolExecutor

        ex = ThreadPoolExecutor(max_workers=1)
        t_fut = ex.submit(_mxu_template, col, row, a_norm, theta,
                          num_nodes, False)

    try:
        return _mxu_template_body(row, col, a_norm, theta, num_nodes,
                                  t_fut)
    finally:
        if ex is not None:
            ex.shutdown()


def _mxu_template_body(row, col, a_norm, theta, num_nodes, t_fut):
    from ..ops.pallas.scatter_mxu import (
        STREAM_THRESHOLD_EDGES,
        STREAM_BLOCK_EDGES,
        _build_plan_host,
        _plan_from_host,
        _stream_from_host,
        col_degree_split,
        permute_edge_data,
    )

    split = col_degree_split(col, num_nodes)
    grp, hot_ids = None, None
    if split is not None:
        grp, col, hot_ids = split
        hot_ids = jnp.asarray(hot_ids)
    h = _build_plan_host(row, num_nodes, group=grp)
    if len(h["perm"]) > STREAM_THRESHOLD_EDGES:
        stream, perm = _stream_from_host(h, STREAM_BLOCK_EDGES)
        col_p, a_p, t_p = permute_edge_data(
            perm, np.asarray(col, np.int32), a_norm.astype(np.float32),
            theta.astype(np.float32))
        s = stream.win.shape[0]
        out = MagneticTemplate(
            a_norm=jnp.asarray(a_p).reshape(s, -1),
            theta=jnp.asarray(t_p).reshape(s, -1), row=None,
            col=jnp.asarray(col_p).reshape(s, -1), num_nodes=num_nodes,
            mode="mxu", stream=stream, transposed=None, hot_ids=hot_ids)
    else:
        plan, perm = _plan_from_host(h)
        col_p, a_p, t_p = permute_edge_data(
            perm, np.asarray(col, np.int32), a_norm.astype(np.float32),
            theta.astype(np.float32))
        out = MagneticTemplate(
            a_norm=jnp.asarray(a_p), theta=jnp.asarray(t_p), row=None,
            col=jnp.asarray(col_p), num_nodes=num_nodes, mode="mxu",
            plan=plan, transposed=None, hot_ids=hot_ids)
    if t_fut is not None:
        out = out.replace(transposed=t_fut.result())
    return out


def magnetic_template(
    edge_index,
    edge_weight=None,
    num_nodes: Optional[int] = None,
    signed: bool = False,
    absolute_degree: bool = True,
    mode: str = "auto",
) -> MagneticTemplate:
    """Host-side constructor for the trainable-q operator template."""
    num_nodes = _maybe_num_nodes(edge_index, num_nodes)
    row, col, sym, theta, abs_sym = _symmetrize(edge_index, edge_weight, num_nodes)
    if not signed:
        deg_w = sym
    elif absolute_degree:
        deg_w = abs_sym
    else:
        deg_w = np.abs(sym)
    deg = np.zeros(num_nodes)
    np.add.at(deg, row, deg_w)
    deg_inv_sqrt = np.zeros_like(deg)
    nz = deg > 0
    deg_inv_sqrt[nz] = deg[nz] ** -0.5
    a_norm = deg_inv_sqrt[row] * sym * deg_inv_sqrt[col]

    if mode == "auto":
        mode = "dense" if num_nodes <= _DENSE_AUTO_MAX_NODES else "mxu"
    if mode == "dense":
        A = np.zeros((num_nodes, num_nodes), np.float32)
        T = np.zeros((num_nodes, num_nodes), np.float32)
        A[row, col] = a_norm
        T[row, col] = theta
        return MagneticTemplate(a_norm=jnp.asarray(A), theta=jnp.asarray(T),
                                row=None, col=None, num_nodes=num_nodes,
                                mode="dense")
    if mode == "mxu":
        return _mxu_template(row, col, a_norm, theta, num_nodes)
    # segment mode: reuse build_coo's sort/pad for the structure, then carry
    # theta through the same permutation via a second build with equal order.
    Acoo = build_coo(row, col, a_norm, num_nodes)
    Tcoo = build_coo(row, col, theta, num_nodes)
    return MagneticTemplate(
        a_norm=Acoo.val, theta=Tcoo.val, row=Acoo.row, col=Acoo.col,
        num_nodes=num_nodes, mode="segment",
    )


def _template_values(tmpl: MagneticTemplate, q):
    ang = 2.0 * jnp.pi * q * tmpl.theta
    re_vals = -tmpl.a_norm * jnp.cos(ang)
    # plus: L_im edge values are -a_norm*sin, and the conv applies L^T
    # (antisymmetric imag part -> negate; see magnet_propagators docstring)
    im_vals = tmpl.a_norm * jnp.sin(ang)
    return re_vals, im_vals


def template_propagators(tmpl: MagneticTemplate, q) -> Tuple[Propagator, Propagator]:
    """Jit-safe rebuild of (L_hat_re, L_hat_im) for a (traced) phase q."""
    re_vals, im_vals = _template_values(tmpl, q)
    if tmpl.mode == "dense":
        return (
            Propagator(coo=None, dense=re_vals, bsr=None, mode="dense"),
            Propagator(coo=None, dense=im_vals, bsr=None, mode="dense"),
        )
    n = tmpl.num_nodes
    if tmpl.mode == "mxu":
        from ..ops.pallas.scatter_mxu import MXUCoo

        tt = tmpl.transposed
        re_t, im_t = (_template_values(tt, q) if tt is not None
                      else (None, None))

        def mk(vals, vals_t):
            t = None
            if tt is not None:
                t = MXUCoo(plan=tt.plan, col=tt.col, val=vals_t,
                           num_cols=n, transposed=None, stream=tt.stream,
                           hot_ids=tt.hot_ids)
            return MXUCoo(plan=tmpl.plan, col=tmpl.col, val=vals,
                          num_cols=n, transposed=t, stream=tmpl.stream,
                          hot_ids=tmpl.hot_ids)

        return (
            Propagator(coo=None, dense=None, bsr=None, mode="mxu",
                       mxu=mk(re_vals, re_t)),
            Propagator(coo=None, dense=None, bsr=None, mode="mxu",
                       mxu=mk(im_vals, im_t)),
        )
    from ..ops.coo import COO

    e = tmpl.row.shape[0]
    A_re = COO(row=tmpl.row, col=tmpl.col, val=re_vals, num_nodes=n,
               num_cols=n, nnz=e)
    A_im = COO(row=tmpl.row, col=tmpl.col, val=im_vals, num_nodes=n,
               num_cols=n, nnz=e)
    return (
        Propagator(coo=A_re, dense=None, bsr=None, mode="segment"),
        Propagator(coo=A_im, dense=None, bsr=None, mode="segment"),
    )


def template_dual_apply(tmpl: MagneticTemplate, q, x: jnp.ndarray):
    """[L_re x_a | L_im x_b] for a traced phase q on an mxu template —
    flat, streamed (giant graphs train q through the same fused backward
    one stream block at a time), or sharded (mode="mxu_sharded", built by
    parallel.mxu_shard.build_sharded_template: per-device plans under
    shard_map, dq via a psum of per-device fused SDDMM partials)."""
    if tmpl.mode == "mxu_sharded":
        from ..parallel.mxu_shard import sharded_template_dual_apply

        return sharded_template_dual_apply(tmpl.plan, q, x)
    return _template_dual_apply_mxu(tmpl, q, x)


# widest message row the scatter kernels take in one pass (Mosaic lane
# limit); beyond it the pair forward falls back to two passes
_PAIR_MAX_LANES = 256


def _template_pair_forward(tmpl: MagneticTemplate, q, x: jnp.ndarray):
    """(L(q) x, L'(q) x) stacked through ONE widened scatter pass.

    q is a SCALAR, so its directional derivative is free to carry
    forward: the pass gathers the [E2, 2F] x rows once and scatters
    [x_e * val_e | x_e * dval_e] — 4F lanes, the same MXU cycles as the
    2F-lane frozen pass (the systolic array is 128 lanes wide either
    way) and no extra gather.  Widths beyond _PAIR_MAX_LANES run as two
    passes.  Returns (y [N, 2F] in x.dtype, y' [N, 2F] f32).
    """
    from ..ops.spmm import get_matmul_precision, get_message_dtype

    fa = x.shape[1] // 2
    f2 = 2 * fa
    lane = jnp.arange(f2) < fa
    mdt = get_message_dtype() or x.dtype
    xg = x.astype(mdt)
    two_pi_q = 2.0 * jnp.pi * q
    fused = 2 * f2 <= _PAIR_MAX_LANES
    # Fused narrow layout (2*f2 <= 128): the gather table's lanes are
    # DUPLICATED ([x | x], 4F lanes) so the message build is one
    # elementwise quadrant-select.  The row gather is row-rate-bound
    # (width free up to 128 lanes, PERF.md fact 1), so the doubled
    # gather costs nothing, while the previous two-part build +
    # lane-concat on the [E2, 4F] stream cost ~5 ms per apply at the
    # bench config (scripts/ab_pair_msgs.py: 22.6 -> 17.8 ms,
    # bit-identical output).  Past 128 lanes the duplicated gather is no
    # longer free, so wider shapes keep the two-part build.
    dup = fused and 2 * f2 <= 128
    if dup:
        xg = jnp.concatenate([xg, xg], axis=1)
    x_hot = xg[tmpl.hot_ids] if tmpl.hot_ids is not None else None
    lane4 = jnp.arange(2 * f2)

    def halves(a, th, which):
        ang = two_pi_q * th
        scale = 2.0 * jnp.pi * th * a
        out = []
        if which in ("vals", "both"):
            out.append((-a * jnp.cos(ang), a * jnp.sin(ang)))
        if which in ("derivs", "both"):
            out.append((scale * jnp.sin(ang), scale * jnp.cos(ang)))
        return out

    def msgs(g, a, th, which):
        if which == "both" and dup:
            (va, vb), (wa, wb) = halves(a, th, "both")
            sel = jnp.where(
                lane4[None, :] < fa, va[:, None],
                jnp.where(lane4[None, :] < f2, vb[:, None],
                          jnp.where(lane4[None, :] < f2 + fa, wa[:, None],
                                    wb[:, None])))
            return (g * sel).astype(mdt)
        if which == "both":
            parts = [
                g * jnp.where(lane[None, :], va[:, None], vb[:, None])
                for va, vb in halves(a, th, "both")
            ]
            return jnp.concatenate(parts, axis=1).astype(mdt)
        ((va, vb),) = halves(a, th, which)
        m = g * jnp.where(lane[None, :], va[:, None], vb[:, None])
        return m.astype(mdt)

    def one_pass(which, width):
        if tmpl.stream is not None:
            from ..ops.pallas.scatter_mxu import streamed_scatter

            return streamed_scatter(
                tmpl.stream, tmpl.col,
                lambda g, i: msgs(g, tmpl.a_norm[i], tmpl.theta[i], which),
                xg, width, get_matmul_precision(), x_hot=x_hot)
        if x_hot is not None:
            from ..ops.pallas.scatter_mxu import split_scatter_accum

            return split_scatter_accum(
                tmpl.plan, tmpl.col,
                lambda g, lo, hi: msgs(g, tmpl.a_norm[lo:hi],
                                       tmpl.theta[lo:hi], which),
                xg, x_hot, width, get_matmul_precision())
        from ..ops.pallas.scatter_mxu import scatter_sum

        return scatter_sum(tmpl.plan,
                           msgs(xg[tmpl.col], tmpl.a_norm, tmpl.theta,
                                which))

    if fused:
        out = one_pass("both", 2 * f2)
        return out[:, :f2].astype(x.dtype), out[:, f2:]
    y = one_pass("vals", f2)
    yp = one_pass("derivs", f2)
    return y.astype(x.dtype), yp


@jax.custom_vjp
def _template_dual_apply_mxu(tmpl: MagneticTemplate, q, x: jnp.ndarray):
    """[L_re x_a | L_im x_b] for a traced phase q on an mxu template
    (flat, streamed, or col-split).

    The hot path for trainable-q MagNet/MSGNN (reference rebuilds the
    Laplacian on CPU each forward, MagNetConv.py:141-183).  q is a scalar,
    so its derivative is carried FORWARD: the differentiable forward also
    scatters y' = L'(q) x through the same gather/one-hot pass (extra
    lanes, not extra passes — see _template_pair_forward), and the
    backward is then exactly the frozen backward plus one elementwise
    contraction:

      * dq = <g, y'> — a [N, 2F] dot, no kernel at all,
      * dx rides the plain transposed-plan dual forward — the identical
        op the frozen path uses, so XLA dead-code-eliminates it wherever
        the input cotangent is unused (e.g. the first conv layer, whose
        input is data: the reverse-mode in-kernel SDDMM this replaces
        could not be DCE'd and made layer-1 backwards cost like layer-2's).

    A naive autodiff of template_dual + a value-cotangent SpMM pays two
    additional [E2, 2F] gathers per apply (the XLA gather is row-rate
    bound); measured 4.1x the frozen train step at N=65k vs this way's
    ~1.1x.
    """
    return _dual_forward_stacked(template_dual(tmpl, q), x)


def _tda_fwd(tmpl, q, x):
    y, yp = _template_pair_forward(tmpl, q, x)
    return y, (tmpl, q, yp)


def _tda_bwd(res, g):
    tmpl, q, yp = res
    if tmpl.mode != "mxu" or tmpl.transposed is None:
        raise ValueError("template_dual_apply backward needs an mxu "
                         "template with a transpose")
    dq = jnp.sum(g.astype(jnp.float32) * yp).astype(jnp.asarray(q).dtype)
    # the frozen backward: plain transposed dual apply of the cotangent
    # (template_dual's forward-direction values are dead code here and
    # XLA removes them; so is this whole apply when dx itself is unused)
    dx = _dual_forward_stacked(template_dual(tmpl, q).transposed, g)
    zero = jax.tree.map(
        lambda p: (jnp.zeros_like(p)
                   if jnp.issubdtype(p.dtype, jnp.floating)
                   else np.zeros(p.shape, jax.dtypes.float0)), tmpl)
    return zero, dq, dx.astype(g.dtype)


_template_dual_apply_mxu.defvjp(_tda_fwd, _tda_bwd)


def template_dual(tmpl: MagneticTemplate, q) -> DualPropagator:
    """Jit-safe fused (L_hat_re, L_hat_im) DualPropagator for a traced q
    on the mxu template — the hot path for trainable-q MagNet/MSGNN at
    scale (frozen scatter plan, only the per-edge values retrace)."""
    assert tmpl.mode == "mxu"
    re_vals, im_vals = _template_values(tmpl, q)
    t = None
    if tmpl.transposed is not None:
        re_t, im_t = _template_values(tmpl.transposed, q)
        t = DualPropagator(
            col=tmpl.transposed.col, row=None, val_a=re_t, val_b=im_t,
            plan=tmpl.transposed.plan, num_nodes=tmpl.num_nodes,
            num_cols=tmpl.num_nodes, mode="mxu",
            stream=tmpl.transposed.stream,
            hot_ids=tmpl.transposed.hot_ids)
    return DualPropagator(
        col=tmpl.col, row=None, val_a=re_vals, val_b=im_vals,
        plan=tmpl.plan, num_nodes=tmpl.num_nodes, num_cols=tmpl.num_nodes,
        mode="mxu", transposed=t, stream=tmpl.stream,
        hot_ids=tmpl.hot_ids)
