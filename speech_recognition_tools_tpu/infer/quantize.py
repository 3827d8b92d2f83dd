"""Weight-only int8 quantization for serving.

Small-batch online serving is weight-bound: every scheduling round
re-reads the encoder weights from HBM while the activations are tiny
(B x chunk x adim). Storing the big matmul/conv kernels as int8 with a
per-output-channel f32 scale cuts that weight traffic 4x vs f32 (2x vs
bf16); the dequant (`q.astype(f32) * scale`) runs inside the jitted
step, so XLA fuses it into each consumer's read and the f32 copy never
round-trips to HBM. Compute precision is unchanged (matmuls still run
in the model's compute_dtype) — this is memory/bandwidth compression,
not int8 arithmetic, so accuracy loss is bounded by the per-channel
quantization step (max |w - deq(q(w))| <= scale/2, tested).

The reference has no serving mode at all (SURVEY §2.7: offline Kaldi
decode via shell scripts), so this surface is beyond-reference; it
exists to make `srt-serve` deployable at production stream counts.

Only 2D+ kernels named `kernel`/`embedding` are quantized; LayerNorm
scales, biases and other 1D vectors stay f32 (negligible bytes, high
sensitivity). `dequantize_tree` is a structural no-op on unquantized
trees, so every consumer can call it unconditionally.
"""

import jax
import jax.numpy as jnp
import numpy as np

# marker keys for a quantized leaf (a dict node replacing the array)
_QKEYS = frozenset({"int8_q", "int8_scale"})
_QUANT_NAMES = ("kernel", "embedding")
# flax MultiHeadDotProductAttention q/k/v kernels are (in, heads,
# head_dim): BOTH trailing axes are output channels (contraction is
# axis 0 only), unlike Dense (in, out) / the attention out-projection
# (heads, head_dim, out) where only the last axis is
_MHA_QKV = frozenset({"query", "key", "value"})


def _is_qleaf(node):
    return isinstance(node, dict) and set(node.keys()) == _QKEYS


def quantize_leaf(w, n_out_axes: int = 1):
    """Symmetric per-output-channel int8 quantization: one f32 scale per
    slice of the trailing `n_out_axes` axes (the output channels), abs-max
    over the leading contraction axes. Returns the marker dict
    {'int8_q', 'int8_scale'}."""
    w = np.asarray(w, np.float32)
    red = tuple(range(w.ndim - n_out_axes))
    amax = np.max(np.abs(w), axis=red, keepdims=True)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return {"int8_q": jnp.asarray(q), "int8_scale": jnp.asarray(scale)}


def quantize_tree(tree, min_size: int = 1024):
    """Replace every float kernel/embedding leaf (ndim >= 2, size >=
    min_size) in a nested params dict with its int8 form. Returns a new
    nested dict; the input is not mutated. Attention q/k/v kernels
    (3-D, under a query/key/value module) get per-(head, head_dim)
    scales so one outlier weight in a head cannot inflate the step for
    the same column of every other head."""
    def rec(node, parent=None):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (
                    k in _QUANT_NAMES
                    and hasattr(v, "ndim") and v.ndim >= 2
                    and v.size >= min_size
                    and jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating)
                ):
                    n_out = 2 if (parent in _MHA_QKV and v.ndim == 3) else 1
                    out[k] = quantize_leaf(v, n_out_axes=n_out)
                else:
                    out[k] = rec(v, parent=k)
            return out
        return node

    return rec(tree)


def dequantize_tree(tree):
    """Inverse of quantize_tree: rebuild f32 kernels (`q * scale`).
    jit-safe — call it at the top of a jitted step so the weights stay
    int8 in HBM and XLA fuses the dequant into each consumer. No-op
    (structurally) on unquantized subtrees."""
    def rec(node):
        if _is_qleaf(node):
            return node["int8_q"].astype(jnp.float32) * node["int8_scale"]
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return node

    return rec(tree)


def has_quantized(tree):
    def rec(node):
        if _is_qleaf(node):
            return True
        if isinstance(node, dict):
            return any(rec(v) for v in node.values())
        return False

    return rec(tree)


def quantize_encoder(params, min_size: int = 1024):
    """Quantize only the encoder subtree of a TransformerASR params
    tree — the part every streaming round re-reads. The decoder and
    ctc_head (used at finals / per-chunk logits) stay f32, so beam
    finalization and attention-rescored partials are untouched."""
    import flax

    p = flax.core.unfreeze(params)
    if "params" not in p or "encoder" not in p["params"]:
        raise ValueError("expected a TransformerASR params tree with "
                         "['params']['encoder']")
    p["params"]["encoder"] = quantize_tree(
        p["params"]["encoder"], min_size=min_size
    )
    return p


def quantized_bytes(tree):
    """(bytes_quantized_form, bytes_f32_equivalent) over the tree —
    the serving-HBM story in one pair of numbers."""
    qb = fb = 0
    for leaf in jax.tree.leaves(tree):
        arr = np.asarray(leaf)
        qb += arr.nbytes
        fb += arr.size * 4 if arr.dtype == np.int8 else arr.nbytes
    return qb, fb
