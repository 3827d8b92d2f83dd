"""Frame-context splicing (parity:
/root/reference/src/featgen/features.py:157-169 spliceFeats).

The reference zero-pads `context` frames on both sides and concatenates a
2*context+1 window per frame — but, quirk preserved: its python loop stops
at frame_num - context, leaving the last `context` output rows zero. We
replicate that by masking rather than looping.
"""

import jax.numpy as jnp


def splice_feats(feats: jnp.ndarray, context: int) -> jnp.ndarray:
    """Splice (T, D) -> (T, D*(2*context+1)); last `context` rows zero."""
    context = int(context)
    T, D = feats.shape
    padded = jnp.pad(feats, ((context, context), (0, 0)))
    idx = jnp.arange(T)[:, None] + jnp.arange(2 * context + 1)[None, :]
    out = padded[idx].reshape(T, D * (2 * context + 1))
    row_valid = jnp.arange(T) < (T - context)
    return jnp.where(row_valid[:, None], out, 0.0)
