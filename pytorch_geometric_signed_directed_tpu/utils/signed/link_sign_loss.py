"""Link-sign losses (SGCN / SNEA / SiGAT / SDGNN).

Reference: utils/signed/link_sign_loss.py (6 classes).  Losses with
trainable parameters are Flax modules; sampling-dependent losses take the
host-presampled index arrays explicitly (utils.signed.sampling) so the loss
itself stays a pure jit-safe function.
"""
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def _bce_logits(logits, target_ones: bool, weight=None, reduction="sum"):
    # binary_cross_entropy_with_logits: softplus(-x) for y=1, softplus(x) for y=0
    loss = nn.softplus(-logits) if target_ones else nn.softplus(logits)
    if weight is not None:
        loss = loss * weight
    return loss.sum() if reduction == "sum" else loss.mean()


class Sign_Triangle_Loss(nn.Module):
    """BCE on a learned edge score, weighted by per-edge triangle counts.

    Reference :10-51; the triangle weights (from SDGNN's ``tri_weight``
    scipy matrix) are gathered host-side and passed as ``w_pos`` / ``w_neg``.
    """

    emb_dim: int

    @nn.compact
    def __call__(self, z, pos_edge_index, neg_edge_index, w_pos, w_neg):
        lin = nn.Dense(1)
        rs1 = lin(jnp.concatenate(
            [z[pos_edge_index[0]], z[pos_edge_index[1]]], axis=1))
        rs2 = lin(jnp.concatenate(
            [z[neg_edge_index[0]], z[neg_edge_index[1]]], axis=1))
        pos_loss = _bce_logits(rs1, True, w_pos.reshape(-1, 1))
        neg_loss = _bce_logits(rs2, False, w_neg.reshape(-1, 1))
        return pos_loss + neg_loss


class Sign_Direction_Loss(nn.Module):
    """Hinged score-difference loss (SDGNN).  Reference :54-99."""

    emb_dim: int

    @nn.compact
    def __call__(self, z, pos_edge_index, neg_edge_index):
        score1 = nn.Dense(1, name="score_function1")
        score2 = nn.Dense(1, name="score_function2")

        s1 = nn.sigmoid(score1(z[pos_edge_index[0]]))
        s2 = nn.sigmoid(score2(z[pos_edge_index[1]]))
        q = jnp.where((s1 - s2) > -0.5, -0.5, s1 - s2)
        pos_loss = ((q - (s1 - s2)) ** 2).sum()

        s1 = nn.sigmoid(score1(z[neg_edge_index[0]]))
        s2 = nn.sigmoid(score2(z[neg_edge_index[1]]))
        q = jnp.where((s1 - s2) > 0.5, s1 - s2, 0.5)
        neg_loss = ((q - (s1 - s2)) ** 2).sum()
        return pos_loss + neg_loss


def sign_product_entropy_loss(z, pos_edge_index, neg_edge_index):
    """BCE on embedding dot products.  Reference :103-127."""
    p1 = jnp.sum(z[pos_edge_index[0]] * z[pos_edge_index[1]], axis=1)
    p2 = jnp.sum(z[neg_edge_index[0]] * z[neg_edge_index[1]], axis=1)
    return _bce_logits(p1, True) + _bce_logits(p2, False)


class Sign_Product_Entropy_Loss:
    """BCE on embedding dot products of signed edges.

    Reference: utils/signed/link_sign_loss.py:103-127.
    """

    def __call__(self, z, pos_edge_index, neg_edge_index):
        return sign_product_entropy_loss(z, pos_edge_index, neg_edge_index)


def link_sign_product_loss(z, pos_edge_index, neg_edge_index):
    """Logsigmoid product loss, neg class rebalanced by C = |E+|/|E-|.

    Reference :131-157 (SiGAT).
    """
    p1 = jnp.sum(z[pos_edge_index[0]] * z[pos_edge_index[1]], axis=1)
    p2 = jnp.sum(z[neg_edge_index[0]] * z[neg_edge_index[1]], axis=1)
    loss_pos = -jnp.sum(jax.nn.log_sigmoid(p1))
    loss_neg = -jnp.sum(jax.nn.log_sigmoid(-p2))
    C = pos_edge_index.shape[1] / neg_edge_index.shape[1]
    return loss_pos + loss_neg * C


class Link_Sign_Product_Loss:
    """Logsigmoid product loss with the negative class rebalanced by
    C = |E+|/|E-|.

    Reference: utils/signed/link_sign_loss.py:131-157.
    """

    def __call__(self, z, pos_edge_index, neg_edge_index):
        return link_sign_product_loss(z, pos_edge_index, neg_edge_index)


class Link_Sign_Entropy_Loss(nn.Module):
    """3-class (pos/neg/none) discriminator NLL.  Reference :161-226.

    ``none_edge_index`` is the host-sampled non-edge list
    (utils.signed.negative_sampling over pos+neg edges).
    """

    emb_dim: int

    @nn.compact
    def __call__(self, z, pos_edge_index, neg_edge_index, none_edge_index):
        lin = nn.Dense(3)

        def discriminate(edge_index):
            value = jnp.concatenate(
                [z[edge_index[0]], z[edge_index[1]]], axis=1)
            return jax.nn.log_softmax(lin(value), axis=1)

        nll = -discriminate(pos_edge_index)[:, 0].mean()
        nll += -discriminate(neg_edge_index)[:, 1].mean()
        nll += -discriminate(none_edge_index)[:, 2].mean()
        return nll / 3.0


def sign_structure_loss(z, pos_samples, neg_samples):
    """Triplet embedding loss on host-presampled (i, j, k) triples.

    Reference :229-275; ``pos_samples``/``neg_samples`` come from
    utils.signed.structured_negative_sampling on the pos/neg edge lists.
    """
    i, j, k = pos_samples
    out = ((z[i] - z[j]) ** 2).sum(1) - ((z[i] - z[k]) ** 2).sum(1)
    loss_1 = jnp.clip(out, min=0).mean()
    i, j, k = neg_samples
    out = ((z[i] - z[k]) ** 2).sum(1) - ((z[i] - z[j]) ** 2).sum(1)
    loss_2 = jnp.clip(out, min=0).mean()
    return loss_1 + loss_2


class Sign_Structure_Loss:
    """Triplet embedding loss via structured negative sampling.

    Reference: utils/signed/link_sign_loss.py:229-275.
    """

    def __call__(self, z, pos_samples, neg_samples):
        return sign_structure_loss(z, pos_samples, neg_samples)
