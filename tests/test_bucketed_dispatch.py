"""Pad-to-bucket deployment dispatch: a non-bucket PRB count served by a
larger bucket engine must reproduce the direct-shape execution's LLRs
over the valid subcarriers (the reference serves arbitrary PRB counts
with dynamic-shape TRT profiles, export_onnx.py:147-160; here one AOT
executable per bucket + a runtime valid-width input)."""

import os
import re
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

TEST_CFG_DIR = os.path.join(os.path.dirname(__file__), "data")


def _params_at(n_prb):
    from neural_rx_tpu.sim.config import Parameters
    src = open(os.path.join(TEST_CFG_DIR, "test_small.cfg")).read()
    src = re.sub(r"n_size_bwp_eval = \d+", f"n_size_bwp_eval = {n_prb}",
                 src)
    with tempfile.TemporaryDirectory() as td:
        with open(os.path.join(td, "test_small.cfg"), "w") as f:
            f.write(src)
        return Parameters("test_small", system="nrx", training=False,
                          config_dir=td)


def _randomize_biases(params, key):
    """Give every bias (1-D leaf) a nonzero value: freshly-initialized
    biases are zero, which makes MLP(0) == 0 and hides pad-column
    bleed-through (aggregation output on bucket-pad columns is
    bias-propagated junk unless explicitly masked)."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    out = [0.5 * jax.random.normal(k, l.shape, l.dtype)
           if l.ndim == 1 else l for l, k in zip(leaves, keys)]
    return jax.tree.unflatten(treedef, out)


def _build(n_prb):
    from neural_rx_tpu.sim.e2e import E2EModel
    from neural_rx_tpu.deploy.aerial import AerialNRX
    p = _params_at(n_prb)
    p.nrx_dtype = jnp.float32
    model = E2EModel(p, training=False)
    engine = AerialNRX(model.receiver.rg, model.receiver.cgnn_cfg,
                       dtype=jnp.float32)
    return model, engine


class TestBucketedDispatch:
    def test_padded_matches_direct(self):
        from neural_rx_tpu.deploy.aot import BucketedReceiver
        from neural_rx_tpu.deploy.data_tools import AerialDataGenerator

        model3, engine3 = _build(3)
        model4, engine4 = _build(4)
        # type-1 comb DMRS never gathers a pilot to the right -> exact
        assert engine4.pad_dispatch_exact

        # CGNN parameter shapes are PRB-agnostic: one weight set serves
        # both grids (the reference trains at 4 PRBs, evaluates at 132).
        # Nonzero biases (trained-weights regime): pad columns must not
        # bleed aggregation-MLP bias into the valid region.
        params = _randomize_biases(
            model4.init_params(jax.random.PRNGKey(0)),
            jax.random.PRNGKey(7))

        gen3 = AerialDataGenerator(model3, engine3)
        inputs3, _ = gen3(jax.random.PRNGKey(1), 2, 10.0)
        llr_direct, h_direct = [np.asarray(o)
                                for o in engine3(params, *inputs3)]

        t = model4.p.max_num_tx
        ant = model4.p.num_rx_antennas

        def make_engine(n_prb):
            assert n_prb == 4
            rng = np.random.default_rng(0)
            sc = engine4.n_sc
            example = (
                jnp.asarray(rng.normal(size=(2, sc, 14, ant)), jnp.float32),
                jnp.asarray(rng.normal(size=(2, sc, 14, ant)), jnp.float32),
                jnp.asarray(rng.normal(size=(2, engine4.num_pilots, t, ant)),
                            jnp.float32),
                jnp.asarray(rng.normal(size=(2, engine4.num_pilots, t, ant)),
                            jnp.float32),
                jnp.ones((2, t), jnp.float32),
            )
            return engine4, example

        rx = BucketedReceiver(make_engine, params, buckets=(4,))
        assert rx.bucket_for(3) == 4
        llr_padded, h_padded = [np.asarray(o) for o in rx.run(3, *inputs3)]

        assert llr_padded.shape == llr_direct.shape
        np.testing.assert_allclose(llr_padded, llr_direct,
                                   rtol=1e-3, atol=5e-4)
        assert h_padded.shape == h_direct.shape
        np.testing.assert_allclose(h_padded, h_direct,
                                   rtol=1e-3, atol=5e-4)

    def test_exact_bucket_passthrough(self):
        from neural_rx_tpu.deploy.aot import BucketedReceiver
        from neural_rx_tpu.deploy.data_tools import AerialDataGenerator

        model4, engine4 = _build(4)
        params = model4.init_params(jax.random.PRNGKey(0))
        gen4 = AerialDataGenerator(model4, engine4)
        inputs4, _ = gen4(jax.random.PRNGKey(2), 2, 10.0)
        want = engine4(params, *inputs4)

        rx = BucketedReceiver(lambda n: (engine4, inputs4), params,
                              buckets=(4,))
        got = rx.run(4, *inputs4)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-4, atol=1e-5)

    def test_serialized_engine_roundtrip(self, tmp_path):
        """serialize_engine / load_engine: the persisted StableHLO
        artifact reproduces the live engine's LLRs (TRT .plan analog)."""
        from neural_rx_tpu.deploy.aot import serialize_engine, load_engine
        from neural_rx_tpu.deploy.data_tools import AerialDataGenerator

        model4, engine4 = _build(4)
        params = model4.init_params(jax.random.PRNGKey(0))
        gen4 = AerialDataGenerator(model4, engine4)
        inputs4, _ = gen4(jax.random.PRNGKey(5), 1, 10.0)
        want = engine4(params, *inputs4)

        path = tmp_path / "engine.jaxengine"
        nbytes = serialize_engine(lambda *a: engine4(params, *a),
                                  inputs4, str(path))
        assert nbytes > 1000 and path.exists()
        got = load_engine(str(path))(*inputs4)
        for g, w in zip(got, want):  # (llr, h_hat)
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-5, atol=1e-6)

    def test_serialized_compiled_executable_roundtrip(self, tmp_path):
        """serialize_compiled / load_compiled: a COMPILED executable
        (the machine-code-level TRT .plan analog — loading skips XLA
        compilation) reproduces the live outputs bit-exactly."""
        # subprocess with ONE CPU device: the suite's 8-virtual-device
        # mesh breaks executable RELOAD (deserialize_and_load rebuilds
        # input shardings over all local devices); the deployment
        # environment is single-device, so test that
        import subprocess
        import sys
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=1")
        code = f"""
import jax, numpy as np, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
from neural_rx_tpu.deploy.aot import serialize_compiled, load_compiled
f = jax.jit(lambda x: (x @ x.T, jnp.sum(x, axis=0)))
x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 8)), jnp.float32)
compiled = f.lower(x).compile()
want = compiled(x)
path = {repr(str(tmp_path))} + "/exe.npe"
n = serialize_compiled(compiled, path)
assert n > 100
got = load_compiled(path)(x)
for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
    np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
print("ROUNDTRIP_OK")
"""
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=240)
        assert "ROUNDTRIP_OK" in r.stdout, (r.stdout[-500:],
                                            r.stderr[-1000:])

    def test_pilot_count_mismatch_rejected(self):
        import pytest
        from neural_rx_tpu.deploy.aot import BucketedReceiver
        from neural_rx_tpu.deploy.data_tools import AerialDataGenerator

        model4, engine4 = _build(4)
        params = model4.init_params(jax.random.PRNGKey(0))
        gen4 = AerialDataGenerator(model4, engine4)
        inputs4, _ = gen4(jax.random.PRNGKey(3), 1, 10.0)
        rx = BucketedReceiver(lambda n: (engine4, inputs4), params,
                              buckets=(4,))
        with pytest.raises(ValueError, match="pilots"):
            rx.run(2, *inputs4)  # 4-PRB pilot axis for a 2-PRB request
