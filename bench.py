"""Round benchmark: batched FDLP-spectrogram extraction throughput on one
TPU chip (the BASELINE.json metric — real-time factor; north star >= 1000x
real-time with <1e-4 parity, which the precision='high' path meets — see
tests/test_dsp_parity.py).

The HEADLINE config is the reference's production e2e front-end
(/root/reference/e2e/wsj/run_fdlp_e1.sh:56-60: 80 filters, order 150,
fduration 1.5 s, 100 cepstral coefficients), in the default fast (f32)
mode. The lighter FdlpConfig() default (20 bands, order 50, 0.5 s) and the
<1e-4-parity precision='high' mode are reported in `detail`.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
value = real-time factor of the production config on a 32 x 10 s 16 kHz
batch; vs_baseline = value / 1000 (the BASELINE.json target).
"""

import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_enable_x64", True)  # for the high-precision mode

    from speech_recognition_tools_tpu.dsp import FdlpConfig, fdlp_spectrogram_batch

    B, secs, srate = 32, 10, 16000
    n = secs * srate
    rs = np.random.RandomState(0)
    # speech-like: AR-filtered noise with slow envelope, int16 scale
    x = rs.randn(B, n).astype(np.float32)
    for a in (0.9, 0.7):
        x[:, 1:] += a * x[:, :-1]
    t = np.arange(n) / srate
    x *= (0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * t) ** 2)[None, :]
    x = (x / np.abs(x).max() * 8000.0).astype(np.float32)
    lens = np.full(B, n, np.int32)

    import jax.numpy as jnp

    xd = jnp.asarray(x)
    lensd = jnp.asarray(lens)
    jax.block_until_ready((xd, lensd))

    def measure(cfg, iters=10, repeats=3):
        # The chip is reached through a remote tunnel whose runtime (a)
        # memoizes repeated calls on identical resident buffers and (b)
        # reports block_until_ready before remote compute finishes; only a
        # host fetch synchronises. So: perturb the input each iteration
        # with a device scalar derived from the previous output (forces
        # fresh, chained executions with no host transfer inside the loop)
        # and fetch one scalar at the end to sync the whole chain.
        f, _ = fdlp_spectrogram_batch(xd, lensd, cfg)  # compile
        dep = f[0, 0, 0] * 0.0
        float(dep)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            d = dep
            for _ in range(iters):
                f, _ = fdlp_spectrogram_batch(xd + d, lensd, cfg)
                d = f[0, 0, 0] * 0.0
            float(d)  # sync the chain
            best = min(best, (time.time() - t0) / iters)
        return best

    prod = dict(
        nfilters=80, order=150, fduration=1.5, coeff_num=100,
        coeff_range="1,100",
    )
    dt_prod = measure(FdlpConfig(**prod))
    dt_prod_high = measure(FdlpConfig(**prod, precision="high"))
    dt_light = measure(FdlpConfig())
    dt_light_high = measure(FdlpConfig(precision="high"))

    audio_seconds = B * secs
    rt = audio_seconds / dt_prod
    result = {
        "metric": "fdlp_spectrogram_realtime_factor",
        "value": round(rt, 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rt / 1000.0, 3),
        "detail": {
            "config": "production e2e front-end (80 mel bands, order 150, "
                      "1.5 s windows, 100 ceps; e2e/wsj/run_fdlp_e1.sh)",
            "batch": B,
            "utt_seconds": secs,
            "srate": srate,
            "ms_per_batch_prod_fast": round(dt_prod * 1000, 1),
            "prod_high_precision_realtime_factor": round(
                audio_seconds / dt_prod_high, 1
            ),
            "light_config_realtime_factor": round(
                audio_seconds / dt_light, 1
            ),
            "light_high_precision_realtime_factor": round(
                audio_seconds / dt_light_high, 1
            ),
            "high_precision_parity": "max |dlog-feat| 2.4e-7 vs f64 CPU ref "
                                     "(tests/test_dsp_parity.py)",
            "light_config": "FdlpConfig() defaults (20 bands, order 50, "
                            "0.5 s windows)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
