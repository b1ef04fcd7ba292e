"""Exactness tests for the experimental pallas depthwise-conv kernel
(interpret mode on CPU; the kernel is a recorded negative perf result —
see the module docstring — but its VJP contract must stay correct)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pipnet_tpu.ops.pallas_dwconv import (dwconv_xla, make_dwconv7x7)


@pytest.mark.parametrize("shape", [(2, 16, 16, 8), (1, 9, 9, 4)])
def test_forward_matches_grouped_conv(rng, shape):
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal((7, 7, shape[-1])), jnp.float32)
    dw = make_dwconv7x7(interpret=True)
    np.testing.assert_allclose(np.asarray(dw(x, k)),
                               np.asarray(dwconv_xla(x, k)),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_grouped_conv(rng):
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((7, 7, 8)), jnp.float32)
    dw = make_dwconv7x7(interpret=True)

    def loss_p(x, k):
        return jnp.sum(dw(x, k) ** 2)

    def loss_x(x, k):
        return jnp.sum(dwconv_xla(x, k) ** 2)

    gx_p, gk_p = jax.grad(loss_p, argnums=(0, 1))(x, k)
    gx_x, gk_x = jax.grad(loss_x, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_x),
                               rtol=1e-4, atol=1e-3)
