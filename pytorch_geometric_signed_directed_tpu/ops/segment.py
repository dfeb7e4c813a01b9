"""Segment primitives: the XLA 'native tier' under every conv layer.

The reference's performance substrate is torch_scatter's CUDA scatter-add
(SURVEY.md §2.6).  On TPU the idiomatic equivalents are XLA's sorted segment
reductions, which lower to efficient one-pass scatters, plus a dense-block
Pallas path (ops/pallas) for the hot SpMM.  Everything here is jit-safe and
differentiable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments: int, indices_are_sorted: bool = False):
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_mean(data, segment_ids, num_segments: int, indices_are_sorted: bool = False):
    s = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    ones = jnp.ones(data.shape[:1], dtype=data.dtype)
    cnt = segment_sum(ones, segment_ids, num_segments, indices_are_sorted)
    cnt = jnp.maximum(cnt, 1.0)
    return s / cnt.reshape((-1,) + (1,) * (data.ndim - 1))


def segment_max(data, segment_ids, num_segments: int, indices_are_sorted: bool = False):
    return jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_softmax(logits, segment_ids, num_segments: int,
                    indices_are_sorted: bool = False):
    """Numerically-stable softmax over edges grouped by destination segment.

    TPU equivalent of PyG's ``softmax(alpha, index)`` used by attention convs
    (reference nn/signed/SNEAConv.py:143).  Out-of-range (padding) ids get
    weight exp(-inf - finite) handled via where-masking.
    """
    valid = segment_ids < num_segments
    neg_inf = jnp.finfo(logits.dtype).min
    maxes = jax.ops.segment_max(
        jnp.where(valid, logits, neg_inf), segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    maxes = jnp.where(jnp.isfinite(maxes), maxes, 0.0)
    gathered_max = jnp.where(valid, maxes[jnp.minimum(segment_ids, num_segments - 1)], 0.0)
    ex = jnp.where(valid, jnp.exp(logits - gathered_max), 0.0)
    denom = segment_sum(ex, segment_ids, num_segments, indices_are_sorted)
    denom = jnp.maximum(denom, jnp.finfo(logits.dtype).tiny)
    return ex / jnp.where(valid, denom[jnp.minimum(segment_ids, num_segments - 1)], 1.0)
