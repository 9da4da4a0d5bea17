"""Numerical debug tooling (reference -debug eager mode analog,
train_neural_rx.py:74-76): NaN guards via checkify and a context that
enables jax_debug_nans / disable_jit for breakpoint debugging."""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def nan_guard(fn):
    """Wrap a function so jitted execution errors on non-finite outputs.

    Returns a function with the same signature; raises ValueError with
    the offending output name on NaN/Inf.
    """
    def checked(*args, **kwargs):
        out = fn(*args, **kwargs)
        leaves = jax.tree.leaves(out)
        for i, leaf in enumerate(leaves):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                checkify.check(jnp.all(jnp.isfinite(leaf)),
                               "non-finite value in output leaf {i}",
                               i=jnp.int32(i))
        return out

    cfn = checkify.checkify(checked)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out
    return wrapper


@contextlib.contextmanager
def debug_context(nans: bool = True, eager: bool = False):
    """Enable jax_debug_nans and optionally disable jit (eager
    breakpoint debugging — the reference's run_functions_eagerly)."""
    prev_nans = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", nans)
    try:
        if eager:
            with jax.disable_jit():
                yield
        else:
            yield
    finally:
        jax.config.update("jax_debug_nans", prev_nans)
