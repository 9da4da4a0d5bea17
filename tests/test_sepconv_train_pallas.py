"""Trainable fused sepconv stack (custom VJP): forward and gradients
vs the XLA reference path, CPU interpret mode, f32."""

import jax
import jax.numpy as jnp
import numpy as np

from neural_rx_tpu.rx.cgnn import _init_conv_stack, _apply_conv_stack
from neural_rx_tpu.kernels.sepconv_train_pallas import sepconv_stack_train


def _setup(cin=18, hidden=(32,), cout=24, n=4, h=14, w=48):
    p = _init_conv_stack(jax.random.PRNGKey(0), cin, list(hidden), cout,
                         "sepconv")
    x = jax.random.normal(jax.random.PRNGKey(1), (n, h, w, cin),
                          jnp.float32)
    return p, x


def test_forward_matches_xla():
    p, x = _setup()
    want = np.asarray(_apply_conv_stack(p, x, "sepconv"))
    got = np.asarray(sepconv_stack_train(p, x, 2, None, True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_grads_match_xla():
    p, x = _setup(cin=10, hidden=(16, 16), cout=8, n=4, h=7, w=24)

    def loss_ref(p_, x_):
        y = _apply_conv_stack(p_, x_, "sepconv")
        return jnp.sum(jnp.sin(y))

    def loss_fused(p_, x_):
        y = sepconv_stack_train(p_, x_, 2, None, True)
        return jnp.sum(jnp.sin(y))

    gp_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(p, x)
    gp, gx = jax.grad(loss_fused, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=5e-4, atol=5e-5)
    for (la, lb) in zip(jax.tree.leaves(gp), jax.tree.leaves(gp_ref)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=5e-4, atol=5e-5)


def test_grads_match_under_batch_blocks():
    """Weight grads accumulate across sequential grid steps: multiple
    batch blocks must agree with a single-block run."""
    p, x = _setup(cin=6, hidden=(8,), cout=4, n=8, h=6, w=16)

    def loss(p_, b_blk):
        y = sepconv_stack_train(p_, x, b_blk, None, True)
        return jnp.sum(y * y)

    g1 = jax.grad(lambda p_: loss(p_, 8))(p)
    g4 = jax.grad(lambda p_: loss(p_, 2))(p)
    for la, lb in zip(jax.tree.leaves(g1), jax.tree.leaves(g4)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-5, atol=1e-6)
