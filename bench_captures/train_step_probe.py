#!/usr/bin/env python3
"""In-process A/B decomposition of the e2e train step (VERDICT r4 #4).

The featgen probe methodology (2026-08-19_r04_injit_steady_state.md)
applied to training: every variant is measured in ONE process with
dependency-chained iterations (the tunnel memoizes repeated calls on
identical buffers and block_until_ready lies; only a host fetch
synchronises), so the RATIOS between variants are trustworthy even
though absolute numbers ride ~±40% tunnel variance.

Variants:
  step_full       loss + grad + adam update (the train_e2e CLI step)
  grad_only       value_and_grad, no optimizer
  fwd_only        loss forward
  enc_fwd         encoder forward only
  ctc_fwd         loss with mtlalpha=1 (CTC branch + encoder)
  att_fwd         loss with mtlalpha=0 (attention branch, no CTC scan)
  opt_only        adam update on frozen grads
plus batch-size scaling (B16/B32/B64) of step_full to separate
fixed-overhead from FLOP-proportional time.

Usage: python bench_captures/train_step_probe.py [--out FILE.json]
"""

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from speech_recognition_tools_tpu.cli.train_e2e import make_train_step
    from speech_recognition_tools_tpu.models.transformer_asr import (
        TransformerASR,
        TransformerASRConfig,
        asr_loss,
        noam_schedule,
    )

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), flush=True)

    def make(cfg_kw, Bt=16, Tt=800, Ut=112):
        kw = dict(
            vocab_size=52, adim=256, aheads=4, elayers=12, eunits=2048,
            dlayers=6, dunits=2048, dropout=0.1, mtlalpha=0.3,
            compute_dtype="bfloat16",
        )
        kw.update(cfg_kw)
        cfg = TransformerASRConfig(**kw)
        model = TransformerASR(cfg)
        rs = np.random.RandomState(7)
        batch = {
            "feats": jnp.asarray(rs.randn(Bt, Tt, 80).astype(np.float32)),
            "lengths": jnp.full((Bt,), Tt, jnp.int32),
            "tokens": jnp.asarray(rs.randint(1, 50, (Bt, Ut)).astype(np.int32)),
            "token_lengths": jnp.full((Bt,), Ut - 12, jnp.int32),
        }
        params = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            batch["feats"][:1], batch["lengths"][:1], batch["tokens"][:1],
        )
        return cfg, model, params, batch

    results = {}

    def timeit(name, fn, state, iters=None, repeats=None):
        """fn(state) -> (state, scalar dep). Chained: each iteration's
        input depends on the previous output; fetch once per repeat."""
        iters = iters or args.iters
        repeats = repeats or args.repeats
        t0 = time.time()
        state, dep = fn(state)
        float(dep)
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            for _ in range(iters):
                state, dep = fn(state)
            float(dep)
            best = min(best, (time.time() - t0) / iters)
        results[name] = {"ms": round(best * 1000, 2),
                         "compile_s": round(compile_s, 1)}
        print(f"{name}: {best * 1000:.2f} ms (compile {compile_s:.0f}s)",
              flush=True)
        return best

    # ---- full step + sub-variants at the bench geometry (B16 x 800)
    cfg, model, params, batch = make({})
    tx = optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.adam(noam_schedule(cfg.adim, 25000, 10.0)),
    )
    opt_state = tx.init(params)
    step = make_train_step(model, cfg, tx)
    rng = jax.random.PRNGKey(2)

    def full_fn(st):
        p, o, i = st
        p, o, loss, _ = step(p, o, batch, jax.random.fold_in(rng, i))
        return (p, o, i + 1), loss

    # the CLI step donates params/opt_state; give it its own copies so
    # the later variants can still read the originals
    timeit("step_full_B16", full_fn,
           (jax.tree.map(jnp.array, params), tx.init(params), 0))

    # grad only (no optimizer) — params perturbed by a zero scalar from
    # the previous loss so iterations chain without the update
    # eps-perturb INSIDE the jit: an eager tree-map would be one tiny
    # dispatch per param leaf through the tunnel and dominate the time
    grad_fn_jit = jax.jit(
        lambda p, eps, b, r: jax.value_and_grad(
            lambda q: asr_loss(model, q, b, r, cfg)[0]
        )(jax.tree.map(
            lambda x: x + eps if x.dtype == jnp.float32 else x, p))
    )

    def grad_fn(st):
        p, i, eps = st
        loss, g = grad_fn_jit(p, eps, batch, jax.random.fold_in(rng, i))
        return (p, i + 1, loss * 0.0), loss

    timeit("grad_only_B16", grad_fn, (params, 0, jnp.float32(0.0)))

    # forward-only loss
    fwd_jit = jax.jit(lambda p, b, r: asr_loss(model, p, b, r, cfg)[0])

    def fwd_fn(st):
        i, eps = st
        b = dict(batch, feats=batch["feats"] + eps)
        loss = fwd_jit(params, b, jax.random.fold_in(rng, i))
        return (i + 1, loss * 0.0), loss

    timeit("fwd_only_B16", fwd_fn, (0, jnp.float32(0.0)))

    # encoder forward only
    enc_jit = jax.jit(lambda p, f, l: model.apply(
        p, f, l, method=TransformerASR.encode)[0].sum())

    def enc_fn(st):
        i, eps = st
        out = enc_jit(params, batch["feats"] + eps, batch["lengths"])
        return (i + 1, out * 0.0), out

    timeit("enc_fwd_B16", enc_fn, (0, jnp.float32(0.0)))

    # loss-branch ablations (fresh models; param trees differ slightly
    # but encoder/decoder shapes match so the FLOPs are comparable)
    for name, kw in (("ctc_fwd_B16", {"mtlalpha": 1.0}),
                     ("att_fwd_B16", {"mtlalpha": 0.0})):
        cfg2, model2, params2, _ = make({"mtlalpha": kw["mtlalpha"]})
        fwd2 = jax.jit(lambda p, b, r, m2=model2, c2=cfg2:
                       asr_loss(m2, p, b, r, c2)[0])

        def fn2(st, fwd2=fwd2, params2=params2):
            i, eps = st
            b = dict(batch, feats=batch["feats"] + eps)
            loss = fwd2(params2, b, jax.random.fold_in(rng, i))
            return (i + 1, loss * 0.0), loss

        timeit(name, fn2, (0, jnp.float32(0.0)))

    # optimizer-only: adam update on frozen grads (chained via params)
    _, g_frozen = grad_fn_jit(params, jnp.float32(0.0), batch, rng)
    opt_jit = jax.jit(lambda p, o, g: (
        lambda u, o2: (optax.apply_updates(p, u), o2)
    )(*tx.update(g, o, p)))

    def opt_fn(st):
        p, o, _ = st
        p, o = opt_jit(p, o, g_frozen)
        return (p, o, 0), jax.tree_util.tree_leaves(p)[0].ravel()[0]

    timeit("opt_only_B16", opt_fn,
           (jax.tree.map(jnp.array, params), tx.init(params), 0))

    # ---- batch scaling of the full step
    for Bt in (32, 64):
        cfgB, modelB, paramsB, batchB = make({}, Bt=Bt)
        stepB = make_train_step(modelB, cfgB, tx)
        optB = tx.init(paramsB)

        def fullB(st, stepB=stepB, batchB=batchB):
            p, o, i = st
            p, o, loss, _ = stepB(p, o, batchB, jax.random.fold_in(rng, i))
            return (p, o, i + 1), loss

        timeit(f"step_full_B{Bt}", fullB, (paramsB, optB, 0),
               iters=max(2, args.iters // 2))

    # analytic matmul TFLOP (same formula as bench.py) per B16 step
    a, e, d_u, Tt, Ut = 256, 2048, 2048, 800, 112
    Te = Tt // 4
    enc = 12 * (8 * Te * a * a + 4 * Te * Te * a + 4 * Te * a * e)
    dec = 6 * (8 * Ut * a * a + 4 * Ut * Ut * a + 4 * Ut * a * a
               + 4 * Te * a * a + 4 * Ut * Te * a + 4 * Ut * a * d_u)
    for Bt in (16, 32, 64):
        tf = 3.0 * Bt * (enc + dec) / 1e12
        key = f"step_full_B{Bt}"
        if key in results:
            ms = results[key]["ms"]
            results[key]["analytic_tflop"] = round(tf, 3)
            results[key]["mfu_pct_of_197"] = round(
                100.0 * tf / (ms / 1000.0) / 197.0, 1)

    out = {"probe": "train_step_decomposition",
           "geometry": "12enc/6dec adim256 units2048 bf16, T800 U112",
           "results": results,
           "notes": "chained in-process measurements; ratios stable, "
                    "absolutes ride tunnel variance (NOTES.md)"}
    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
