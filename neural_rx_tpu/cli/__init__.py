"""Command-line entry points (reference scripts/ equivalents):
train, evaluate, bench, export, compute_cov."""
