"""neural_rx_tpu — TPU-native 5G NR PUSCH neural receiver framework.

A from-scratch JAX/XLA/Pallas implementation of a 5G NR-compliant
multi-user MIMO PUSCH neural receiver ("NRX") with the capability
surface of NVlabs/neural-rx (see SURVEY.md):

- Full first-party 5G NR PHY: QAM constellations, OFDM, resource grids,
  DMRS (Gold sequences), LDPC transport-block encoding/decoding,
  rate matching, codebook precoding.
- 3GPP channel simulation: TDL-B100/C300, DoubleTDL, AWGN, CFO impairment.
- CGNN neural receiver (joint channel estimation + equalization + demapping)
  with var-MCS, multiloss, double readout and depth truncation.
- Training/eval harness: optax-based schedule training, Monte-Carlo BLER
  (`sim_ber`) with early stopping, orbax checkpoints.
- TPU-first execution: jit/pjit everywhere, bf16 compute paths,
  shard_map grid sharding over device meshes, Pallas kernels for hot ops.

Package layout:
  phy/       L1 PHY primitives + phy/nr 5G-specific transport chain
  channel/   L2 channel models and impairments
  models/    L4 neural receiver (CGNN) and LS estimation
  baselines/ classical receivers (LMMSE, K-Best)
  ops/       Pallas TPU kernels
  parallel/  mesh construction, grid sharding, halo exchange
  sim/       L3+L5 config system, E2E model, training, Monte-Carlo eval
  utils/     metrics, checkpointing, logging
"""

__version__ = "0.1.0"
