"""L4 receivers: the CGNN neural receiver and classical baselines
(TPU-native re-design of reference utils/neural_rx.py and
utils/baseline_rx.py; SURVEY.md §2.1/§2.3)."""
