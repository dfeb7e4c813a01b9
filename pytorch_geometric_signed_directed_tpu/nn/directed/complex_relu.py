"""Complex ReLU: mask both parts by (real >= 0).

Reference: nn/directed/complex_relu.py:5-34.
"""
import jax.numpy as jnp


def complex_relu(real, imag):
    mask = (real >= 0).astype(real.dtype)
    return mask * real, mask * imag


class complex_relu_layer:
    """Callable shim matching the reference's layer name."""

    def __call__(self, real, imag):
        return complex_relu(real, imag)
