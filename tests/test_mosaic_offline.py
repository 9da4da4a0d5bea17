"""Offline TPU-v5e Mosaic compilation of the shipped pallas kernels.

Interpret-mode tests validate semantics but NOT Mosaic lowering; two
real lowering failures shipped past them in round 2 and one more
(a vector<2xbf16> -> vector<2x1x1x1xbf16> shape cast) in round 3.
The image's libtpu can build a compile-only PJRT topology client, so
lowering is falsifiable hermetically — no chip, no tunnel
(scripts/local_mosaic_check.py is the CLI variant with full error
bodies)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tpu_sharding():
    try:
        from jax.experimental import topologies
        from jax.sharding import SingleDeviceSharding
        topo = topologies.get_topology_desc(
            "v5e:1x1x1", "tpu", chips_per_host_bounds=(1, 1, 1))
        return SingleDeviceSharding(topo.devices[0])
    except Exception as e:  # no libtpu in this environment
        pytest.skip(f"no compile-only TPU topology available: {e}")


def _sds(sh, shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype, sharding=sh)


def _sep_params(rng, c_in, widths):
    layers = []
    cin = c_in
    for w in widths:
        layers.append({
            "dw": jnp.asarray(rng.normal(size=(3, 3, 1, cin)),
                              jnp.bfloat16),
            "pw": jnp.asarray(rng.normal(size=(cin, w)), jnp.bfloat16),
            "b": jnp.zeros((w,), jnp.bfloat16)})
        cin = w
    return {"hidden": layers[:-1], "out": layers[-1]}


def test_fused_conv_stacks_compile(tpu_sharding):
    from neural_rx_tpu.kernels.sepconv_pallas import (
        fused_conv_stack, fused_conv_stack_blocked)
    rng = np.random.default_rng(0)
    p_init = _sep_params(rng, 18, [128, 128])
    jax.jit(lambda x: fused_conv_stack(p_init, x, interpret=False)).lower(
        _sds(tpu_sharding, (2, 14, 1584, 18), jnp.bfloat16)).compile()
    p_upd = _sep_params(rng, 130, [128, 128])
    jax.jit(lambda x: fused_conv_stack_blocked(
        p_upd, x, w_blk=256, interpret=False)).lower(
        _sds(tpu_sharding, (2, 14, 1584, 130), jnp.bfloat16)).compile()


def test_fused_iteration_compiles(tpu_sharding):
    from neural_rx_tpu.kernels.cgnn_iter_pallas import fused_iteration
    rng = np.random.default_rng(0)
    d_s = 56
    it_p = {"agg": {"hidden": [{"w": jnp.asarray(
                        rng.normal(size=(d_s, 64)), jnp.bfloat16),
                    "b": jnp.zeros((64,), jnp.bfloat16)}],
                    "out": {"w": jnp.asarray(
                        rng.normal(size=(64, d_s)), jnp.bfloat16),
                            "b": jnp.zeros((d_s,), jnp.bfloat16)}},
            "update": _sep_params(rng, 2 * d_s + 2, [128, 128, d_s])}
    ro_p = {"hidden": [{"w": jnp.asarray(rng.normal(size=(d_s, 128)),
                                         jnp.bfloat16),
                        "b": jnp.zeros((128,), jnp.bfloat16)}],
            "out": {"w": jnp.asarray(rng.normal(size=(128, 4)),
                                     jnp.bfloat16),
                    "b": jnp.zeros((4,), jnp.bfloat16)}}
    s = _sds(tpu_sharding, (1, 2, 14, 1584, d_s), jnp.bfloat16)
    pe = _sds(tpu_sharding, (2, 14, 1584, 2), jnp.bfloat16)
    act = _sds(tpu_sharding, (1, 2), jnp.float32)
    jax.jit(lambda s_, pe_, a_: fused_iteration(
        it_p, s_, pe_, a_, w_blk=128, interpret=False)).lower(
        s, pe, act).compile()
    jax.jit(lambda s_, pe_, a_: fused_iteration(
        it_p, s_, pe_, a_, w_blk=128, interpret=False,
        readout_p=ro_p)).lower(s, pe, act).compile()


def test_ldpc_decoders_compile(tpu_sharding):
    from neural_rx_tpu.kernels.ldpc_pallas import make_decoder
    from neural_rx_tpu.phy.nr.ldpc import LDPCCode
    for bg, z in ((1, 384), (2, 52), (1, 352)):
        code = LDPCCode(bg=bg, z=z)
        dec = make_decoder(code, num_iter=2, interpret=False)
        llr = _sds(tpu_sharding, (30, code.num_cols * z), jnp.float32)
        jax.jit(dec).lower(llr).compile()


# (the custom-VJP fused training sepconv and its compile test were
# DELETED after the round-4 on-chip A/B: folded-conv XLA training ran
# 68.8 it/s vs 64.2 it/s with the fused kernels — a 7% loss, below the
# ship bar; see STATUS.md round-4 notes)
