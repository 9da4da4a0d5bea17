"""Fused sepconv stack under grid (subcarrier) sharding.

The XLA conv path shards transparently: `with_sharding_constraint` on the
grid axis makes XLA's SPMD partitioner insert 1-column halo exchanges per
conv layer (dist/mesh.py). The fused pallas kernel hides the convs from
the partitioner, so this module does the exchange explicitly, once per
STACK instead of once per layer (an overlap-save win on its own: one
ppermute round trip of `n_layers` columns replaces `n_layers` single-
column exchanges):

1. each shard sends its `halo = n_layers` edge columns to both ring
   neighbors over ICI (`ppermute`; band-edge shards receive zeros, which
   matches the "SAME" zero padding of an unsharded run),
2. the fused kernel runs on the extended [W_local + 2*halo] shard with a
   (lo, hi) valid-range that keeps a band edge's missing-neighbor region
   zero through every layer (the same masking the pad-to-bucket path
   uses),
3. the halo columns are cropped; overlap-save makes the core exact.

Use inside shard_map with the subcarrier axis sharded over `axis_name`:
the wrapper is a drop-in for `fused_conv_stack` on the local shard.
Pass `check_rep=False` (or `check_vma=False` on newer jax) to shard_map —
pallas_call does not carry the replication/vma metadata the checker
wants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..kernels.sepconv_pallas import fused_conv_stack


def fused_conv_stack_sharded(p, x, num_shards: int,
                             axis_name: str = "grid",
                             interpret: bool | None = None):
    """x: local shard [N, H, W_local, C_in], W sharded over `axis_name`.
    Returns the local shard of the stack output [N, H, W_local, C_out].
    Must be called inside shard_map over `axis_name`; `num_shards` is
    the static mesh axis size (mesh.shape[axis_name])."""
    halo = len(p["hidden"]) + 1
    n_sh = num_shards
    idx = jax.lax.axis_index(axis_name)
    w_local = x.shape[2]
    assert w_local >= halo, "shard narrower than the stack halo"

    if n_sh > 1:
        # right edge -> right neighbor's left halo; left edge -> left
        # neighbor's right halo. Non-cyclic: band-edge shards get zeros.
        fwd = [(i, i + 1) for i in range(n_sh - 1)]
        bwd = [(i + 1, i) for i in range(n_sh - 1)]
        from_left = jax.lax.ppermute(x[:, :, -halo:], axis_name, fwd)
        from_right = jax.lax.ppermute(x[:, :, :halo], axis_name, bwd)
        x_ext = jnp.concatenate([from_left, x, from_right], axis=2)
    else:
        x_ext = jnp.pad(x, ((0, 0), (0, 0), (halo, halo), (0, 0)))

    # valid range in extended-shard coordinates: the first shard's left
    # halo and the last shard's right halo are outside the band and must
    # stay zero through every layer (SAME semantics at the band edges)
    lo = jnp.where(idx == 0, halo, 0)
    hi = jnp.where(idx == n_sh - 1, halo + w_local, w_local + 2 * halo)
    y = fused_conv_stack(p, x_ext, interpret=interpret,
                         sc_valid=jnp.stack([lo, hi]).astype(jnp.int32))
    return y[:, :, halo:halo + w_local]
