"""neural_rx_tpu — TPU-native 5G NR PUSCH neural receiver framework.

A from-scratch JAX/XLA/Pallas implementation of a 5G NR-compliant
multi-user MIMO PUSCH neural receiver ("NRX") with the capability
surface of the theshubh007/neural_rx reference (see SURVEY.md):

- Full first-party 5G NR PHY: QAM constellations, OFDM, resource grids,
  DMRS (Gold sequences, type 1/2), 38.212 transport chain (CRC, QC-LDPC,
  rate matching, scrambling), 38.214 TBS, codebook precoding.
- 3GPP channel simulation: TDL-A..E, DoubleTDL, UMi/UMa subset, AWGN,
  CFO impairment, ray-traced CIR datasets (native C++ reader).
- CGNN neural receiver (joint channel estimation + equalization +
  demapping) with var-MCS, multiloss, double readout, depth truncation;
  classical baselines (LS/LMMSE chest, LMMSE/K-Best detection).
- Training/eval harness: optax schedule training, Monte-Carlo BLER
  (`sim_ber`) with early stopping, resumable checkpoints, reference
  weight import for parity checking.
- TPU-first execution: jit/AOT everywhere, bf16 compute paths,
  ("data","grid") mesh sharding with conv halo exchange, Pallas
  layered-LDPC kernel, Aerial-ABI deployment engines.

Package layout:
  phy/       L1 PHY primitives + phy/nr 5G transport chain
  channel/   L2 channel models and impairments (+ native/ C++ IO)
  rx/        L4 neural receiver (CGNN) and classical baselines
  kernels/   Pallas TPU kernels
  dist/      mesh construction, sharding, multi-host
  sim/       L3+L5 config system, E2E models, training, Monte-Carlo eval
  deploy/    L6 Aerial ABI, per-PRB-bucket AOT engines, data tooling
  compat/    reference artifact import
  cli/       train / evaluate / export / compute_cov entry points
  utils/     profiling and debug tooling
"""

__version__ = "0.1.0"
