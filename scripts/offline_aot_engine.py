"""AOT-compile deployed engines OFFLINE (topology client, no chip) and
serialize the compiled executables as loadable artifacts.

If the axon runtime accepts topology-compiled executables
(deploy/aot.load_compiled), this removes the minutes-long on-chip XLA
compile from the serving cold start entirely — compile on any host,
ship the artifact, load in seconds (the TRT `.plan` build/deploy split,
reference export_onnx.py:196-212 + trtexec).

Usage:
  python scripts/offline_aot_engine.py            # all engines
  python scripts/offline_aot_engine.py mega b1    # name filters
Artifacts land in deploy_out/ with the same cache keys
scripts/bench_deploy_best.py looks up.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

L = 100     # batch-1 chain length (must match bench_deploy_best.L)
L16 = 30    # batch-16 chain length


def main():
    # CRITICAL: the kernels' interpret auto-detect keys off
    # default_backend()=="cpu", which is true under the topology
    # client even though we are targeting real TPU — without this the
    # artifacts silently contain interpret-mode HLO with no Mosaic
    # kernels (10 s "compiles", caught round 5)
    os.environ["NRX_FORCE_MOSAIC"] = "1"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import SingleDeviceSharding
    from neural_rx_tpu.deploy.aot import serialize_compiled

    filters = sys.argv[1:]
    topo = topologies.get_topology_desc(
        "v5e:1x1x1", "tpu", chips_per_host_bounds=(1, 1, 1))
    sh = SingleDeviceSharding(topo.devices[0])
    os.makedirs("deploy_out", exist_ok=True)

    def build(name, env, chain_len, batch, copts=None):
        if filters and not any(f in name for f in filters):
            return
        if os.environ.get("NRX_AOT_SKIP_EXISTING") == "1":
            tag0 = "-".join(f"{k}={env.get(k, '')}"
                            for k in ("NRX_DEPLOY_WBLK_B1",
                                      "NRX_DEPLOY_MEGA"))
            p0 = (f"deploy_out/best_chain_b16_L{chain_len}_"
                  f"NRX_DEPLOY_WBLK_B16="
                  f"{env.get('NRX_DEPLOY_WBLK_B16', '')}.npe"
                  if batch > 1 else
                  f"deploy_out/best_chain_b1_L{chain_len}_{tag0}.npe")
            if os.path.exists(p0):
                print(f"SKIP {name}: {p0} exists", flush=True)
                return
        for k in ("NRX_DEPLOY_WBLK_B1", "NRX_DEPLOY_WBLK_B16",
                  "NRX_DEPLOY_MEGA"):
            os.environ.pop(k, None)
        os.environ.update(env)
        # import fresh each time: entry() reads env at trace time
        import __graft_entry__ as g
        fn, (params, y1) = g.entry()
        y = jnp.tile(y1, (batch, 1, 1, 1, 1)) if batch > 1 else y1

        def body(yy, _):
            out = fn(params, yy)
            acc = sum(jnp.mean(leaf.astype(jnp.float32))
                      for leaf in jax.tree.leaves(out))
            return yy + 1e-6 * acc, ()

        def run(yy):
            y_out, _ = jax.lax.scan(body, yy, None, length=chain_len)
            return jnp.mean(y_out)

        sarg = jax.ShapeDtypeStruct(y.shape, y.dtype, sharding=sh)
        t0 = time.time()
        try:
            lowered = jax.jit(run).lower(sarg)
            compiled = (lowered.compile(compiler_options=copts)
                        if copts else lowered.compile())
            tag = "-".join(f"{k}={env.get(k, '')}"
                           for k in ("NRX_DEPLOY_WBLK_B1",
                                     "NRX_DEPLOY_MEGA"))
            if batch > 1:
                path = (f"deploy_out/best_chain_b16_L{chain_len}_"
                        f"NRX_DEPLOY_WBLK_B16="
                        f"{env.get('NRX_DEPLOY_WBLK_B16', '')}.npe")
            else:
                path = f"deploy_out/best_chain_b1_L{chain_len}_{tag}.npe"
            n = serialize_compiled(compiled, path)
            print(f"OK   {name}: {path} ({n / 2**20:.1f} MiB, "
                  f"compile {time.time() - t0:.1f}s)", flush=True)
            if batch > 1:
                # the measurement also needs the short chain (same
                # compiler options — the vmem budget applies to it too)
                lowered_s = jax.jit(
                    lambda yy: run_short(fn, params, yy)).lower(sarg)
                short = (lowered_s.compile(compiler_options=copts)
                         if copts else lowered_s.compile())
                serialize_compiled(short, path + ".short")
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:800]}",
                  flush=True)

    def run_short(fn, params, yy):
        out = fn(params, yy)
        acc = sum(jnp.mean(leaf.astype(jnp.float32))
                  for leaf in jax.tree.leaves(out))
        return jnp.mean(yy + 1e-6 * acc)

    vm64 = {"xla_tpu_scoped_vmem_limit_kib": "65536"}
    vm96 = {"xla_tpu_scoped_vmem_limit_kib": "98304"}
    build("wholegrid b1", {"NRX_DEPLOY_WBLK_B1": "4096"}, L, 1,
          copts=vm64)
    build("mega b1", {"NRX_DEPLOY_MEGA": "1"}, L, 1, copts=vm96)
    # 96 MB budget: at batch 16 XLA places the kernel's two [16, 14,
    # 1728, 56] state outputs (83 M) on the scoped-vmem stack inside
    # the scan body; the blocked kernel's own working set is ~10 M
    build("w192 b16", {"NRX_DEPLOY_WBLK_B16": "192"}, L16, 16,
          copts=vm96)
    build("mega b16", {"NRX_DEPLOY_MEGA": "1"}, L16, 16, copts=vm96)


if __name__ == "__main__":
    main()
