"""Round benchmark: batched FDLP-spectrogram extraction throughput on one
TPU chip (the BASELINE.json metric — real-time factor; north star >= 1000x
real-time with <1e-4 parity).

The HEADLINE config is the reference's production e2e front-end
(/root/reference/e2e/wsj/run_fdlp_e1.sh:56-60: 80 filters, order 150,
fduration 1.5 s, 100 cepstral coefficients), in the default fast (f32)
mode. `detail` reports:
  * the <1e-4-parity 'high' mode (north-star joint clause; 'mixed' is
    an alias) and the light FdlpConfig(),
  * in-process A/B ratios (high/fast, scan/fused-kernel) — immune to
    the shared tunnel's between-process variance and therefore the
    numbers to watch for regressions across rounds,
  * one line per BASELINE.json workload family: melspec batch,
    noise-augmented FDLP, the 8ch mask->GEV->FDLP chain, and real +
    complex M-vectors.

MEASUREMENT CAVEAT: the chip is reached through a shared tunnel whose
between-process variance is ~±40% (NOTES.md); every absolute real-time
factor below carries that error bar. Comparisons inside one process
(the A/B ratios) are sound.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
value = real-time factor of the production config on a 32 x 10 s 16 kHz
batch; vs_baseline = value / 1000 (the BASELINE.json target).
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

# hard ceiling so the driver always gets its JSON line even when the
# tunnel's compile queue is slow: lower-priority workloads are skipped
# once the budget is spent (their detail fields read "skipped")
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))
T0 = time.time()


def _left():
    return BUDGET_S - (time.time() - T0)


def _arm_watchdog():
    """The budget checks run *between* measurements; a wedged tunnel can
    hang the very first device call forever (observed: a trivial 8x8
    matmul blocking >30 min). This timer guarantees the driver still
    gets one parseable JSON line, then hard-exits (the RPC can't be
    cancelled from Python)."""
    import threading

    def fire():
        print(json.dumps({
            "metric": "fdlp_spectrogram_realtime_factor",
            "value": None,
            "unit": "x_realtime_per_chip",
            "vs_baseline": None,
            "detail": f"TPU tunnel stalled: no measurement completed "
                      f"within BENCH_BUDGET_S+120={BUDGET_S + 120:.0f}s",
        }), flush=True)
        os._exit(2)

    t = threading.Timer(BUDGET_S + 120.0, fire)
    t.daemon = True
    t.start()
    return t


def _note(msg):
    print(f"[bench +{time.time()-T0:5.0f}s] {msg}", file=sys.stderr, flush=True)


def _speech_batch(B, n, srate, seed=0):
    rs = np.random.RandomState(seed)
    x = rs.randn(B, n).astype(np.float32)
    for a in (0.9, 0.7):
        x[:, 1:] += a * x[:, :-1]
    t = np.arange(n) / srate
    x *= (0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * t) ** 2)[None, :]
    return (x / np.abs(x).max() * 8000.0).astype(np.float32)


def main():
    watchdog = _arm_watchdog()
    import jax

    jax.config.update("jax_enable_x64", True)  # for the high mode
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".cache", "jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from speech_recognition_tools_tpu.dsp import (
        FdlpConfig,
        MelConfig,
        ModSpecConfig,
        fdlp_spectrogram_batch,
        mel_spectrum_batch,
        modulation_spectrum_batch,
    )

    B, secs, srate = 32, 10, 16000
    n = secs * srate
    audio_seconds = B * secs
    x = _speech_batch(B, n, srate)
    lens = np.full(B, n, np.int32)
    xd = jnp.asarray(x)
    lensd = jnp.asarray(lens)
    jax.block_until_ready((xd, lensd))

    def measure(fn, iters=10, repeats=3, arg=None):
        # The tunnel runtime (a) memoizes repeated calls on identical
        # resident buffers and (b) reports block_until_ready before
        # remote compute finishes; only a host fetch synchronises. So:
        # perturb the input each iteration with a device scalar derived
        # from the previous output (chained fresh executions, no host
        # transfer inside the loop) and fetch one scalar at the end.
        a = xd if arg is None else arg
        out = fn(a)  # compile
        dep = jax.tree_util.tree_leaves(out)[0].ravel()[0] * 0.0
        float(dep)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            d = dep
            for _ in range(iters):
                out = fn(a + d)
                d = jax.tree_util.tree_leaves(out)[0].ravel()[0] * 0.0
            float(d)
            best = min(best, (time.time() - t0) / iters)
        return best

    prod = dict(
        nfilters=80, order=150, fduration=1.5, coeff_num=100,
        coeff_range="1,100",
    )

    def fdlp_fn(cfg):
        return lambda xin: fdlp_spectrogram_batch(xin, lensd, cfg)[0]

    def guarded(label, thunk, min_left=60.0):
        """Run a measurement unless the time budget is spent; returns
        None when skipped/failed so the detail field reads "skipped"
        and the driver still gets its JSON line."""
        if _left() < min_left:
            _note(f"SKIP {label} (budget)")
            return None
        _note(f"measuring {label}")
        try:
            dt = thunk()
        except Exception as e:  # e.g. a backend-specific lowering gap
            _note(f"FAILED {label}: {type(e).__name__}: {e}")
            return None
        _note(f"{label}: {dt * 1000:.1f} ms")
        return dt

    # priority order: headline first, then the parity modes and A/B
    # partners, then the workload family — later entries are skipped
    # (reported as "skipped") if the tunnel's compile queue eats the
    # budget, so the driver always gets its JSON line.
    dt_prod = measure(fdlp_fn(FdlpConfig(**prod)))
    _note(f"prod fast: {dt_prod * 1000:.1f} ms")
    dt_prod_high = guarded(
        "prod high (north-star <1e-4 mode)",
        lambda: measure(fdlp_fn(FdlpConfig(**prod, precision="high")),
                        iters=4),
        min_left=240.0,
    )
    dt_light = guarded("light", lambda: measure(fdlp_fn(FdlpConfig())))
    dt_prod_scan = guarded(
        "prod scan-backend",
        lambda: measure(fdlp_fn(FdlpConfig(**prod, lpc_backend="scan"))),
        min_left=120.0,
    )


    # ---- BASELINE.json workload family one-liners ----
    from speech_recognition_tools_tpu.dsp.augment import add_noise_snr

    mel_cfg = MelConfig(nfilters=80)
    dt_mel = guarded(
        "melspec",
        lambda: measure(lambda xin: mel_spectrum_batch(xin, lensd, mel_cfg)[0]),
    )

    # noise-augmented FDLP (BASELINE "noise-mixing augmentation")
    noise = jnp.asarray(_speech_batch(1, n, srate, seed=1)[0])
    key = jax.random.PRNGKey(0)
    fast_cfg = FdlpConfig(**prod)

    @jax.jit
    def noisy_fdlp(xin):
        mixed_sig = add_noise_snr(key, xin, noise, 10.0)
        return fdlp_spectrogram_batch(mixed_sig, lensd, fast_cfg)[0]

    dt_noisy = guarded("noisy fdlp", lambda: measure(noisy_fdlp))

    # real + complex M-vectors (10 s x 8 utts; the complex path's
    # shared-lag treatment is VERDICT r2 #5)
    Bm = 8
    lm = jnp.asarray(lens[:Bm])

    def mod_fn(cfg):
        return lambda xin: modulation_spectrum_batch(xin[:Bm], lm, cfg)[0]

    dt_mod_real = guarded(
        "mvector real", lambda: measure(mod_fn(ModSpecConfig()), iters=3),
        min_left=180.0,
    )
    dt_mod_cplx = guarded(
        "mvector complex",
        lambda: measure(mod_fn(ModSpecConfig(complex_modulation=True)),
                        iters=3),
        min_left=180.0,
    )

    # 8ch enhancement front-end: STFT -> quantile masks -> GEV (+BAN) ->
    # iSTFT -> FDLP (BASELINE "8ch beamformit/WPE front-end + FDLP").
    # Primary path: the WHOLE chain as one on-device program — the GEV
    # eigensolve lowers to TPU via ops/clinalg's real embedding and no
    # complex array ever reaches the host (enhance/onchip.py). Fallback
    # if that fails to lower on the current backend: host enhancement +
    # on-chip featgen (the pre-round-3 deployed split).
    from speech_recognition_tools_tpu.enhance.onchip import gev_enhance_chain

    rs = np.random.RandomState(2)
    n8 = 4 * srate
    clean8 = _speech_batch(1, n8, srate, seed=3)[0]
    delays = rs.randint(0, 8, size=8)
    mc = np.stack([np.roll(clean8, d) for d in delays]) + \
        rs.randn(8, n8).astype(np.float32) * 200.0
    mcd = jnp.asarray(mc)
    len8 = jnp.asarray([n8], jnp.int32)
    fdlp8_cfg = FdlpConfig(**prod)

    @jax.jit
    def chain8_onchip(xin):
        y = gev_enhance_chain(xin)
        return fdlp_spectrogram_batch(y[None], len8, fdlp8_cfg)[0]

    dt_8ch = guarded(
        "8ch gev chain (on-chip)",
        lambda: measure(chain8_onchip, iters=3, arg=mcd),
        min_left=180.0,
    )
    if dt_8ch is None:
        from speech_recognition_tools_tpu.enhance.beamforming import (
            gev_beamform,
        )
        from speech_recognition_tools_tpu.enhance.masks import quantile_mask
        from speech_recognition_tools_tpu.enhance.stft import istft, stft

        def chain8_split(_xin):
            with jax.default_device(jax.devices("cpu")[0]):
                X = stft(jnp.asarray(mc))  # (ch, T, F)
                sp = np.asarray(quantile_mask(np.asarray(X)))
                spf = np.median(np.transpose(sp, (2, 0, 1)), axis=1)
                Y = gev_beamform(
                    np.asarray(jnp.transpose(X, (2, 0, 1))), spf, 1.0 - spf
                )
                y = np.asarray(istft(jnp.asarray(Y.T)))[:n8]
            return fdlp_spectrogram_batch(
                jnp.asarray(y)[None], len8, fdlp8_cfg
            )[0]

        def run_8ch_split():
            jax.block_until_ready(chain8_split(None))
            t0 = time.time()
            for _ in range(3):
                jax.block_until_ready(chain8_split(None))
            return (time.time() - t0) / 3

        dt_8ch = guarded(
            "8ch gev chain (host/chip split fallback)", run_8ch_split,
            min_left=120.0,
        )

    rt = audio_seconds / dt_prod

    def xrt(dt, seconds=audio_seconds):
        return round(seconds / dt, 1) if dt else "skipped"

    def ratio(dt):
        return round(dt / dt_prod, 2) if dt else "skipped"

    result = {
        "metric": "fdlp_spectrogram_realtime_factor",
        "value": round(rt, 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rt / 1000.0, 3),
        "detail": {
            "config": "production e2e front-end (80 mel bands, order 150, "
                      "1.5 s windows, 100 ceps; e2e/wsj/run_fdlp_e1.sh)",
            "batch": B, "utt_seconds": secs, "srate": srate,
            "variance_note": "absolute factors ride a shared tunnel with "
                             "~±40% between-process variance (NOTES.md); "
                             "the ab_ratios are in-process and stable",
            "ms_per_batch_prod_fast": round(dt_prod * 1000, 1),
            "prod_high_precision_realtime_factor": xrt(dt_prod_high),
            "light_config_realtime_factor": xrt(dt_light),
            "parity": {
                "fast": "~1e-4 synthetic / up to ~1e-1 on silence-heavy "
                        "real speech (f32 transform error on quiet bands)",
                "high": "<1e-4 guaranteed by tests/test_dsp_parity.py::"
                        "test_mixed_precision_production_config vs the "
                        "reference oracle (~2e-7 synthetic; worst of the "
                        "70 reference wavs 5e-7; 'mixed' is an alias)",
            },
            "ab_ratios": {
                "high_over_fast": ratio(dt_prod_high),
                "scan_over_fused_kernel": ratio(dt_prod_scan),
            },
            "workloads_x_realtime": {
                "melspec_80band": xrt(dt_mel),
                "fdlp_noise_augmented": xrt(dt_noisy),
                "mvector_real": xrt(dt_mod_real, Bm * secs),
                "mvector_complex": xrt(dt_mod_cplx, Bm * secs),
                "gev8ch_to_fdlp": xrt(dt_8ch, n8 / srate),
            },
        },
    }
    watchdog.cancel()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
