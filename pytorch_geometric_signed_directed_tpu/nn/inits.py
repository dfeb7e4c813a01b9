"""Weight initializers matching the reference's PyG conventions."""
import numpy as np
import jax
import jax.numpy as jnp


def glorot(key, shape, dtype=jnp.float32):
    """Uniform(-a, a) with a = sqrt(6 / (fan_in + fan_out)) over the last
    two dims — PyG's ``glorot`` used by MagNetConv/MSConv weights."""
    fan_in, fan_out = shape[-2], shape[-1]
    a = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


def zeros(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)
