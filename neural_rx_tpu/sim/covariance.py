"""Monte-Carlo estimation of freq/time/space channel covariances.

Library replacement for the reference's subprocess-orchestrated
`scripts/compute_cov_mat.py` (anti-goal: os.system call per eval,
SURVEY.md §7.4): samples channels from the configured training channel
model (UMi with random drops in the reference) at the evaluation
bandwidth and accumulates the three covariance matrices used by the
LMMSE baseline interpolator.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def compute_cov_matrices(sys_parameters, num_batches: int = 8,
                         batch_size: int = 16, seed: int = 123):
    """Returns (cov_freq [sc,sc], cov_time [14,14], cov_space [ant,ant])."""
    p = sys_parameters
    rg = p.transmitters[0].resource_grid
    nsym, nsc = rg.num_ofdm_symbols, rg.num_subcarriers
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def draw(k):
        if p.channel_type_name.startswith("DoubleTDL"):
            h = p.channel_model(k, batch_size, nsym, nsc,
                                p.carrier.subcarrier_spacing)
        elif p.channel_type_name in ("TDL-B100", "TDL-C300"):
            h = p.channel_model(k, batch_size, nsym, nsc,
                                p.carrier.subcarrier_spacing)[:, :, None]
        else:
            h = p.channel_model(k, batch_size, p.max_num_tx, nsym, nsc,
                                p.carrier.subcarrier_spacing)
        # flatten (tx, port) -> treat each link as a sample
        h = h.reshape(h.shape[0], h.shape[1], -1, nsym, nsc)
        # normalize per-sample power
        pw = jnp.mean(jnp.abs(h) ** 2, axis=(-1, -2), keepdims=True)
        h = h / jnp.sqrt(jnp.maximum(pw, 1e-12))
        cf = jnp.einsum("balsf,balsg->fg", h, jnp.conj(h))
        ct = jnp.einsum("balsf,baltf->st", h, jnp.conj(h))
        cs = jnp.einsum("balsf,bclsf->ac", h, jnp.conj(h))
        n_f = h.shape[0] * h.shape[1] * h.shape[2] * nsym
        n_t = h.shape[0] * h.shape[1] * h.shape[2] * nsc
        n_s = h.shape[0] * h.shape[2] * nsym * nsc
        # return real/imag stacked (axon cannot move complex to host)
        out = []
        for c, n in ((cf, n_f), (ct, n_t), (cs, n_s)):
            c = c / n
            out.append(jnp.stack([jnp.real(c), jnp.imag(c)]))
        return tuple(out)

    accs = None
    for i in range(num_batches):
        key, sub = jax.random.split(key)
        res = draw(sub)
        res = [np.asarray(r) for r in res]
        if accs is None:
            accs = res
        else:
            accs = [a + r for a, r in zip(accs, res)]
    covs = [(a[0] + 1j * a[1]) / num_batches for a in accs]
    return covs[0].astype(np.complex64), covs[1].astype(np.complex64), \
        covs[2].astype(np.complex64)
