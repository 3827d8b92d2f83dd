"""LPC -> cepstral modulation coefficients.

Replicates `/root/reference/src/featgen/features.py:233-246`
(computeModSpecFromLpc): with sign-flipped predictor b = [1, -a_1..-a_p],

    cep[0] = log(sqrt(gg))
    cep[1] = b[1]
    cep[n] = sum_{m=1}^{n-1} (m/n) * b[n-m] * cep[m] + b[n]   (n >= 2)

The triangular data-dependent recursion is O(lim^2); we run it as a
lax.scan over n with a masked dot per step, batched over all
(utterance x frame x band) problems so each step is a wide VPU op. The
reversed view b[n-m] is carried as a shift-window register (static
slice+concat per step) rather than gathered — dynamic gathers inside scans
are the TPU slow path and don't lower for f64. Complex inputs
(complex-modulation path) are supported — the recursion is dtype-generic.
"""

import jax
import jax.numpy as jnp


def lpc_to_cepstrum(
    xlpc: jax.Array, gg: jax.Array, lim: int, unroll: int = 1
) -> jax.Array:
    """Compute `lim` cepstral coefficients from LPC polynomial and gain.

    Args:
      xlpc: (..., p+1) LPC polynomial [1, a_1..a_p] (signs as returned by
        lpc_from_autocorr — this function applies the reference's sign flip).
      gg: (...,) gain.
      lim: number of cepstral coefficients (static).

    Returns: (..., lim) cepstra.
    """
    p1 = xlpc.shape[-1]
    # Reference flips sign in place: xlpc[1:] = -xlpc[1:]
    b = jnp.concatenate([xlpc[..., :1], -xlpc[..., 1:]], axis=-1)
    # Reference pads with zeros up to length lim+1 when p+1 < lim.
    pad = max(0, lim + 1 - p1)
    if pad:
        b = jnp.concatenate([b, jnp.zeros(b.shape[:-1] + (pad,), b.dtype)], axis=-1)

    if jnp.iscomplexobj(b):
        cep0 = jnp.log(jnp.sqrt(gg.astype(b.dtype)))
    else:
        cep0 = jnp.log(jnp.sqrt(gg))

    batch = b.shape[:-1]
    cep = jnp.zeros(batch + (lim,), b.dtype)
    cep = cep.at[..., 0].set(cep0)
    if lim > 1:
        cep = cep.at[..., 1].set(b[..., 1])
    if lim <= 2:
        return cep

    rdt = cep.real.dtype
    m_vals = jnp.arange(1, lim, dtype=rdt)  # m = 1..lim-1 (window slots)

    # The b[n-m] window is a sliding view of the *static* input b, so
    # instead of carrying a shift register (a (batch, lim) write per step
    # in an HBM-bound scan) each step takes one contiguous dynamic_slice
    # of a precomputed reversed+padded copy:
    #   brev[t] = b[lim-1-t] (t < lim), 0 (t >= lim)
    #   => window[m-1] = b[n-m] = brev[(lim-n) + (m-1)], m = 1..lim-1.
    brev = jnp.concatenate(
        [b[..., :lim][..., ::-1], jnp.zeros(batch + (lim,), b.dtype)],
        axis=-1,
    )

    b_t = jnp.moveaxis(b, -1, 0)  # (lim+?, ...)
    ns = jnp.arange(2, lim)

    def step(cep, xs):
        n, b_n = xs
        win = jax.lax.dynamic_slice_in_dim(brev, lim - n, lim - 1, axis=-1)
        w = (m_vals / n.astype(rdt)) * (m_vals < n).astype(rdt)
        acc = jnp.sum(w * win * cep[..., 1:lim], axis=-1)
        c_n = acc + b_n
        cep = jax.lax.dynamic_update_index_in_dim(cep, c_n, n, axis=-1)
        return cep, None

    cep, _ = jax.lax.scan(
        step, cep, (ns, b_t[2:lim]), unroll=unroll
    )
    return cep
