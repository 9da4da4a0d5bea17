"""Deterministic stand-in for E2EModel in multi-process sim_ber tests.

Returns (b, b_hat, crc) purely from the PRNG key and SNR, so a
single-process oracle can reproduce any process's contribution exactly.
"""

import jax
import jax.numpy as jnp


class FakeEvalModel:
    num_tx = 2
    tb = 64

    def __call__(self, params, key, batch_size, ebno_db,
                 mcs_arr_eval_idx=0, num_it=None):
        k1, k2 = jax.random.split(key)
        shape = (batch_size, self.num_tx, self.tb)
        b = jax.random.bernoulli(k1, 0.5, shape).astype(jnp.float32)
        p_flip = 0.2 * jax.nn.sigmoid(-ebno_db)
        flips = jax.random.bernoulli(k2, p_flip, shape).astype(jnp.float32)
        b_hat = jnp.mod(b + flips, 2.0)
        crc = jnp.zeros(shape[:2], jnp.float32)
        return b, b_hat, crc
