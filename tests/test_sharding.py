"""Sharding equivalence tests on the 8-device virtual CPU mesh
(conftest forces XLA_FLAGS=--xla_force_host_platform_device_count=8).

The grid-sharded CGNN (subcarriers split across the "grid" mesh axis;
XLA SPMD inserts conv halo exchanges) must produce bitwise-close results
to the unsharded single-device computation — SURVEY.md §7.3 hard part 3.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from neural_rx_tpu.dist.mesh import make_mesh, constrain
from neural_rx_tpu.rx.cgnn import CGNNConfig, init_cgnn_params, cgnn_apply


def small_cfg():
    return CGNNConfig(num_bits_per_symbol=(4,), num_rx_ant=4, num_it=2,
                      d_s=16, num_units_init=(32,),
                      num_units_agg=((16,), (16,)),
                      num_units_state=((32,), (32,)),
                      num_units_readout=(32,), initial_chest=True)


class TestGridSharding:
    def setup_method(self):
        self.cfg = small_cfg()
        self.params = init_cgnn_params(jax.random.PRNGKey(0), self.cfg)
        b, t, sym, sc = 4, 2, 14, 48
        k = jax.random.PRNGKey(1)
        self.y = jax.random.normal(k, (b, sym, sc, 8))
        self.pe = jax.random.normal(jax.random.PRNGKey(2), (t, sym, sc, 2))
        self.h = jax.random.normal(jax.random.PRNGKey(3), (b, t, sym, sc, 8))
        self.active = jnp.ones((b, t))
        self.mm = jnp.ones((b, t, 1))

    def _fwd(self, mesh):
        def f(params, y, pe, h):
            if mesh is not None:
                y = constrain(y, mesh, batch_axis=0, sc_axis=2)
                h = constrain(h, mesh, batch_axis=0, sc_axis=3)
            llrs, _ = cgnn_apply(params, self.cfg, y, pe, h, self.active,
                                 self.mm)
            return llrs[-1][0]
        if mesh is not None:
            with mesh:
                return np.asarray(jax.jit(f)(self.params, self.y, self.pe,
                                             self.h))
        return np.asarray(jax.jit(f)(self.params, self.y, self.pe, self.h))

    def test_grid_sharded_equals_single_device(self):
        assert len(jax.devices()) >= 8
        ref = self._fwd(None)
        mesh = make_mesh(8, data=2, grid=4)
        out = self._fwd(mesh)
        # conv halo exchange must reproduce interior AND boundary REs
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    def test_grid_only_mesh(self):
        ref = self._fwd(None)
        mesh = make_mesh(4, data=1, grid=4)
        out = self._fwd(mesh)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    def test_boundary_res_exact(self):
        # shard boundaries at sc = 12, 24, 36 for 4-way sharding of 48
        ref = self._fwd(None)
        out = self._fwd(make_mesh(4, data=1, grid=4))
        for sc_b in (11, 12, 13, 23, 24, 25, 35, 36, 37):
            np.testing.assert_allclose(out[..., sc_b, :],
                                       ref[..., sc_b, :],
                                       rtol=2e-4, atol=2e-4)


class TestDataParallelTraining:
    def test_grad_psum_equivalence(self):
        # gradient of the summed loss must match single-device
        cfg = small_cfg()
        params = init_cgnn_params(jax.random.PRNGKey(0), cfg)
        b, t, sym, sc = 8, 2, 14, 24
        y = jax.random.normal(jax.random.PRNGKey(1), (b, sym, sc, 8))
        pe = jax.random.normal(jax.random.PRNGKey(2), (t, sym, sc, 2))
        h = jax.random.normal(jax.random.PRNGKey(3), (b, t, sym, sc, 8))

        def loss(params, y, h):
            llrs, _ = cgnn_apply(params, cfg, y, pe, h,
                                 jnp.ones((y.shape[0], t)),
                                 jnp.ones((y.shape[0], t, 1)))
            return jnp.mean(llrs[-1][0] ** 2)

        g_ref = jax.jit(jax.grad(loss))(params, y, h)
        mesh = make_mesh(8, data=8, grid=1)
        with mesh:
            ys = jax.device_put(y, NamedSharding(
                mesh, P("data", None, None, None)))
            hs = jax.device_put(h, NamedSharding(
                mesh, P("data", None, None, None, None)))
            g_sh = jax.jit(jax.grad(loss))(params, ys, hs)
        flat_r = jax.tree.leaves(g_ref)
        flat_s = jax.tree.leaves(g_sh)
        for a, c in zip(flat_r, flat_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=1e-4, atol=1e-5)
