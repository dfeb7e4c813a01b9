"""Gradient-safe L2 normalization.

jnp.linalg.norm has a NaN gradient at exactly-zero rows (sqrt'(0)); the
rsqrt(sumsq + eps) form is smooth everywhere and matches F.normalize to
within eps.
"""
import jax
import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1,
                 eps: float = 1e-12) -> jnp.ndarray:
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)
