"""MagNetConv numerical parity vs the reference's exact 4-stream recurrence.

The reference (nn/directed/MagNetConv.py:185-243) runs four propagate
streams; this re-implements that loop verbatim in numpy (propagate ==
dense matvec with the scaled Laplacian) and checks our 2-stream fused
implementation reproduces it to float tolerance — validating the algebraic
rewrite, not just the building blocks.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pytorch_geometric_signed_directed_tpu.nn import MagNetConv
from pytorch_geometric_signed_directed_tpu.spectral import magnet_propagators


def reference_forward(L_re, L_im, x_real, x_imag, weight, bias):
    """Verbatim 4-stream Chebyshev loop of the reference.

    The reference's propagate applies L^T: its flow='target_to_source'
    setdefault runs after super().__init__ (dead code), so PyG's default
    source_to_target flow aggregates out[tgt] += norm * x[src].
    """
    def prop(L, v):
        return L.T @ v

    K1 = weight.shape[0]
    Tx_0_rr, Tx_0_ii = x_real, x_imag
    Tx_0_ir, Tx_0_ri = x_real, x_imag
    out_rr = Tx_0_rr @ weight[0]
    out_ii = Tx_0_ii @ weight[0]
    out_ir = Tx_0_ir @ weight[0]
    out_ri = Tx_0_ri @ weight[0]

    if K1 > 1:
        Tx_1_rr = prop(L_re, x_real)
        out_rr = out_rr + Tx_1_rr @ weight[1]
        Tx_1_ii = prop(L_im, x_imag)
        out_ii = out_ii + Tx_1_ii @ weight[1]
        Tx_1_ir = prop(L_re, x_real)
        out_ir = out_ir + Tx_1_ir @ weight[1]
        Tx_1_ri = prop(L_im, x_imag)
        out_ri = out_ri + Tx_1_ri @ weight[1]

    for k in range(2, K1):
        Tx_2_rr = 2.0 * prop(L_re, Tx_1_rr) - Tx_0_rr
        out_rr = out_rr + Tx_2_rr @ weight[k]
        Tx_0_rr, Tx_1_rr = Tx_1_rr, Tx_2_rr
        Tx_2_ii = 2.0 * prop(L_im, Tx_1_ii) - Tx_0_ii
        out_ii = out_ii + Tx_2_ii @ weight[k]
        Tx_0_ii, Tx_1_ii = Tx_1_ii, Tx_2_ii
        Tx_2_ir = 2.0 * prop(L_re, Tx_1_ir) - Tx_0_ir
        out_ir = out_ir + Tx_2_ir @ weight[k]
        Tx_0_ir, Tx_1_ir = Tx_1_ir, Tx_2_ir
        Tx_2_ri = 2.0 * prop(L_im, Tx_1_ri) - Tx_0_ri
        out_ri = out_ri + Tx_2_ri @ weight[k]
        Tx_0_ri, Tx_1_ri = Tx_1_ri, Tx_2_ri

    out_real = out_rr - out_ii + bias
    out_imag = out_ir + out_ri + bias
    return out_real, out_imag


@pytest.mark.parametrize("K", [1, 2, 3, 4])
@pytest.mark.parametrize("mode", ["dense", "segment"])
def test_magnetconv_matches_reference_recurrence(K, mode):
    rng = np.random.default_rng(K)
    n, f_in, f_out = 40, 6, 5
    row = rng.integers(0, n, 150)
    col = rng.integers(0, n, 150)
    keep = row != col
    row, col = row[keep], col[keep]
    w = rng.uniform(0.5, 1.5, len(row))
    edge_index = np.stack([row, col])

    lap = magnet_propagators(edge_index, w, q=0.25, num_nodes=n, mode=mode)
    # raw (untransposed) scaled Laplacian for the reference loop
    from pytorch_geometric_signed_directed_tpu.spectral import (
        magnetic_laplacian)
    ei_l, wre, wim = magnetic_laplacian(edge_index, w, "sym", n, 0.25)
    L_re = np.zeros((n, n))
    np.add.at(L_re, (ei_l[0], ei_l[1]), wre)
    L_re -= np.eye(n)  # 2L/lambda - I with lambda = 2
    L_im = np.zeros((n, n))
    np.add.at(L_im, (ei_l[0], ei_l[1]), wim)

    x_re = rng.standard_normal((n, f_in)).astype(np.float32)
    x_im = rng.standard_normal((n, f_in)).astype(np.float32)

    conv = MagNetConv(in_channels=f_in, out_channels=f_out, K=K)
    params = conv.init(jax.random.PRNGKey(0), x_re, x_im, lap)
    out_re, out_im = conv.apply(params, x_re, x_im, lap)

    weight = np.asarray(params["params"]["weight"], np.float64)
    bias = np.asarray(params["params"]["bias"], np.float64)
    ref_re, ref_im = reference_forward(L_re, L_im, x_re.astype(np.float64),
                                      x_im.astype(np.float64), weight, bias)
    np.testing.assert_allclose(np.asarray(out_re), ref_re, rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_im), ref_im, rtol=2e-4,
                               atol=2e-4)
