"""Pallas TPU kernels for the hot ops (SURVEY.md §7.2 step 7).

The CGNN itself is MXU-roofline-bound under plain XLA (see
ARCHITECTURE.md), so kernels target the actual bottlenecks: the LDPC
decoder that dominates Monte-Carlo evaluation throughput."""
