"""Self-describing checkpoints.

Like the reference's torch.save dicts carrying constructor hyperparams so
inference scripts can rebuild the model from the file alone
(train_rnn_nnet_classifier.py:273-288, extract_posterior.py:30-36), a
checkpoint here is a directory with
  config.json   — model class name + hyperparams + train history
  state.msgpack — flax-serialised {params, opt_state?} pytree
Resume discovers the newest epoch directory (the babysitter-loop analogue,
train_rnn_hybrid.sh:118-160).
"""

import json
import os
from typing import Any

import flax.serialization


def save_checkpoint(
    directory: str,
    tag: str,
    params: Any,
    config: dict,
    opt_state: Any = None,
    extra: dict | None = None,
):
    path = os.path.join(directory, tag)
    os.makedirs(path, exist_ok=True)
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    with open(os.path.join(path, "state.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(payload))
    meta = dict(config)
    if extra:
        meta["extra"] = extra
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(meta, f, indent=2, default=str)
    return path


def load_checkpoint(path: str, template: Any = None):
    """Returns (payload, config). With `template` (a pytree of the same
    structure) the arrays are restored with proper shapes/dtypes; without,
    returns the raw msgpack dict-of-arrays."""
    with open(os.path.join(path, "config.json")) as f:
        config = json.load(f)
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        data = f.read()
    raw = flax.serialization.msgpack_restore(data)
    if template is not None:
        # restore only the keys the template asks for (a checkpoint may
        # carry opt_state the caller doesn't want)
        payload = {
            k: flax.serialization.from_state_dict(v, raw[k])
            for k, v in template.items()
        }
    else:
        payload = raw
    return payload, config


def latest_checkpoint(directory: str) -> str | None:
    """Newest checkpoint dir by mtime (babysitter-restart discovery)."""
    if not os.path.isdir(directory):
        return None
    entries = [
        os.path.join(directory, d)
        for d in os.listdir(directory)
        if os.path.isdir(os.path.join(directory, d))
        and os.path.exists(os.path.join(directory, d, "state.msgpack"))
    ]
    if not entries:
        return None
    return max(entries, key=os.path.getmtime)
