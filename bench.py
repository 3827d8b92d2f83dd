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
  * analytic roofline (`mfu`): FLOPs + HBM bytes per batch for the fast
    and high modes, and the achieved fraction of chip peak,
  * one line per BASELINE.json workload family: melspec batch,
    noise-augmented FDLP, the 8ch mask->GEV->FDLP chain, and real +
    complex M-vectors.

OUTAGE RESILIENCE (round 4; the round-3 capture was nulled by a >12 h
tunnel wedge): before importing jax in-process, the tunnel is probed in
a timeout-guarded subprocess and re-probed with backoff across the
budget window. Every completed measurement is persisted immediately to
.cache/bench_partial.json, and the watchdog emits the best partial
result instead of a bare null. If the tunnel never answers, the output
falls back to (a) a mid-round hardware capture persisted by
.cache/tunnel_watch.sh to .cache/bench_last_good.json if one exists,
else (b) a small CPU-mesh A/B chain (high/fast ratio evidence only),
with the fallback clearly labelled in `detail.capture`.

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
import subprocess
import sys
import time

import numpy as np

# hard ceiling so the driver always gets its JSON line even when the
# tunnel's compile queue is slow: lower-priority workloads are skipped
# once the budget is spent (their detail fields read "skipped")
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))
T0 = time.time()
_REPO = os.path.dirname(os.path.abspath(__file__))
_PARTIAL_PATH = os.path.join(_REPO, ".cache", "bench_partial.json")
_LAST_GOOD_PATH = os.path.join(_REPO, ".cache", "bench_last_good.json")

# measurements completed so far — the watchdog and the fallback path
# both read this, so a mid-run wedge still yields every number captured
# before it
PARTIAL = {}


def _persist_partial():
    try:
        os.makedirs(os.path.dirname(_PARTIAL_PATH), exist_ok=True)
        with open(_PARTIAL_PATH, "w") as f:
            json.dump({"t_rel_s": round(time.time() - T0, 1), **PARTIAL}, f)
    except OSError:
        pass


def _load_last_good():
    try:
        with open(_LAST_GOOD_PATH) as f:
            return json.load(f)
    except Exception:
        pass
    # .cache/ does not survive an environment recycle; the committed
    # bench_captures/ hardware JSONs do. Newest one is the last tier
    # before null.
    import glob

    # Newest usable capture wins; accept both shapes — a bare result
    # line and the wrapped {captured_utc, bench_rc, result} form that
    # tunnel_watch.sh persists (and we commit verbatim).
    caps = sorted(glob.glob(
        os.path.join(_REPO, "bench_captures", "*_hardware*.json")))
    for path in reversed(caps):
        try:
            with open(path) as f:
                doc = json.load(f)
        except Exception:
            continue
        if not isinstance(doc, dict):
            continue
        wrapped = isinstance(doc.get("result"), dict)
        result = doc["result"] if wrapped else doc
        if not result.get("value"):
            continue
        name = os.path.basename(path)
        return {"captured_utc": doc.get("captured_utc",
                                        name.split("_")[0]) if wrapped
                else name.split("_")[0],
                "bench_rc": 0, "result": result,
                "source": f"bench_captures/{name} (committed "
                          "mid-round hardware capture)"}
    return None


def _left():
    return BUDGET_S - (time.time() - T0)


def _emit_best_available(reason):
    """Build the most informative JSON line from whatever completed:
    partial in-process measurements first, then a persisted mid-round
    hardware capture, then null."""
    dt = PARTIAL.get("ms_per_batch_prod_fast")
    if dt:
        rt = PARTIAL.get("audio_seconds", 320.0) / (dt / 1000.0)
        return {
            "metric": "fdlp_spectrogram_realtime_factor",
            "value": round(rt, 1),
            "unit": "x_realtime_per_chip",
            "vs_baseline": round(rt / 1000.0, 3),
            "detail": {
                "capture": f"PARTIAL ({reason}); measurements completed "
                           "before the stall are reported",
                **PARTIAL,
            },
        }
    lg = _load_last_good()
    if lg and lg.get("result") and lg["result"].get("value"):
        r = dict(lg["result"])
        det = dict(r.get("detail") or {})
        det["capture"] = (
            f"mid-round hardware capture "
            f"({lg.get('source', '.cache/bench_last_good.json')}) from "
            f"{lg.get('captured_utc')} (tunnel down again at round-end "
            f"capture: {reason})"
        )
        r["detail"] = det
        return r
    return {
        "metric": "fdlp_spectrogram_realtime_factor",
        "value": None,
        "unit": "x_realtime_per_chip",
        "vs_baseline": None,
        "detail": f"TPU tunnel unavailable and no mid-round capture "
                  f"exists: {reason}",
    }


def _arm_watchdog():
    """The budget checks run *between* measurements; a wedged tunnel can
    hang the very first device call forever (observed: a trivial 8x8
    matmul blocking >30 min, twice, rounds 3 and 4). This timer
    guarantees the driver still gets one parseable JSON line — the best
    partial available — then hard-exits (the RPC can't be cancelled from
    Python)."""
    import threading

    def fire():
        print(json.dumps(_emit_best_available(
            f"no further measurement completed within "
            f"BENCH_BUDGET_S+120={BUDGET_S + 120:.0f}s")), flush=True)
        os._exit(2)

    t = threading.Timer(BUDGET_S + 120.0, fire)
    t.daemon = True
    t.start()
    return t


def _note(msg):
    print(f"[bench +{time.time()-T0:5.0f}s] {msg}", file=sys.stderr, flush=True)


def _probe_tunnel_once(timeout_s):
    """One guarded tunnel probe: a subprocess runs a trivial device op so
    a wedged RPC times out instead of blocking this process forever."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))"],
            capture_output=True, text=True, timeout=timeout_s, cwd=_REPO,
        )
        return proc.returncode == 0
    except Exception:
        return False


def _probe_tunnel_with_backoff(reserve_s=420.0):
    """Probe, then retry with backoff across the budget window, keeping
    `reserve_s` for the fallback path. Returns True the moment the
    tunnel answers."""
    timeout = 150.0  # first compile through the tunnel can take ~40 s
    while True:
        _note(f"probing tunnel (timeout {timeout:.0f}s, "
              f"{_left():.0f}s budget left)")
        if _probe_tunnel_once(timeout):
            _note("tunnel is UP")
            return True
        if _left() < reserve_s + timeout:
            _note("tunnel still down; out of probe budget")
            return False
        _note("tunnel down; backing off 60s")
        time.sleep(min(60.0, max(0.0, _left() - reserve_s - timeout)))
        timeout = 120.0


def _speech_batch(B, n, srate, seed=0):
    rs = np.random.RandomState(seed)
    x = rs.randn(B, n).astype(np.float32)
    for a in (0.9, 0.7):
        x[:, 1:] += a * x[:, :-1]
    t = np.arange(n) / srate
    x *= (0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * t) ** 2)[None, :]
    return (x / np.abs(x).max() * 8000.0).astype(np.float32)


# ---------------------------------------------------------------------------
# Analytic roofline (VERDICT r3 weak #6): FLOPs + HBM bytes per batch for
# the production config, per precision mode. Shapes are static, so the
# counts are exact up to the noted approximations. Peak numbers are the
# public v5e litepod chip specs.
PEAK_BF16_TFLOPS = 197.0   # v5e MXU peak (bf16); f32-HIGHEST dots run as
                           # multi-pass bf16 so this is the honest ceiling
PEAK_HBM_GBPS = 819.0      # v5e HBM bandwidth


def _roofline(cfg_kw, B, n):
    """Per-stage analytic FLOPs/bytes for fdlp_spectrogram_batch at the
    production config. Mirrors dsp/fdlp.py's stage structure:
    framing -> DCT (FFT) -> banded autocorr (dense f32 einsum | compact
    f64) -> Levinson -> cepstrum -> envelope matmul -> OLA -> log."""
    srate = 16000
    nf = cfg_kw["nfilters"]
    order = cfg_kw["order"]
    C = cfg_kw["coeff_num"]
    fdur = cfg_kw["fduration"]
    overlap_used = 0.75
    flength = int(fdur * srate)            # 24000 analysis samples
    hop = int(overlap_used * fdur * srate)  # 18000
    frames = max(1, (n - flength) // hop + 1)
    P = B * frames                          # flattened problems
    L = order + 2                           # lags kept
    lanes = P * nf                          # Levinson/cepstrum lanes
    kk = int(round(fdur * 100))             # envelope length (frate=100)
    nfft = 1 << int(np.ceil(np.log2(2 * flength)))  # pow2 FFT for DCT

    fft_flops = P * 5.0 * nfft * np.log2(nfft)
    # fast path: dense factored autocorr — per lag an (P,ndct)x(nf,ndct)
    # contraction on the MXU
    ac_dense = 2.0 * P * nf * flength * L
    # high path: support-compacted — mel supports total ~2*ndct lanes
    # across all bands, bucketed into 4 width classes (ops/autocorr)
    ac_compact = 2.0 * P * (2.0 * flength) * L
    lev = 4.0 * lanes * order * order / 2.0      # Levinson recursion
    cep = 2.0 * lanes * C * C / 2.0              # cepstrum recursion
    env = 2.0 * lanes * C * kk                   # envelope matmul
    misc = P * flength * 10.0                    # window/OLA/log etc.

    bytes_in = B * n * 4.0
    # dominant HBM traffic: frames tensor (P, flength) read+written per
    # major stage (frame, window+DCT in, DCT out, autocorr read)
    work_bytes = P * flength * 4.0

    def mode(ac, f64):
        flops = fft_flops + ac + lev + cep + env + misc
        # f64 is software-emulated on v5e: every op costs ~O(10) f32 ops
        # and tensors are 8 B/elem
        eff_flops = flops * (10.0 if f64 else 1.0)
        byts = bytes_in + work_bytes * (8.0 if f64 else 4.0) * 4.0
        return flops, eff_flops, byts

    return {
        "fast": mode(ac_dense, False),
        "high": mode(ac_compact, True),
    }


def _mfu_detail(cfg_kw, B, n, dt_fast, dt_high):
    rl = _roofline(cfg_kw, B, n)
    out = {
        "peak_assumed": f"v5e: {PEAK_BF16_TFLOPS:.0f} TFLOP/s bf16 MXU, "
                        f"{PEAK_HBM_GBPS:.0f} GB/s HBM",
        "note": "analytic stage counts (dsp/fdlp.py structure); "
                "eff_flops scales f64 by the ~10x emulation cost",
    }
    for name, dt in (("fast", dt_fast), ("high", dt_high)):
        flops, eff, byts = rl[name]
        d = {
            "alg_gflops_per_batch": round(flops / 1e9, 1),
            "hbm_gbytes_per_batch": round(byts / 1e9, 2),
        }
        if dt:
            d["achieved_tflops"] = round(flops / dt / 1e12, 2)
            d["mxu_util_pct"] = round(100.0 * eff / dt / (PEAK_BF16_TFLOPS * 1e12), 1)
            d["hbm_util_pct"] = round(100.0 * byts / dt / (PEAK_HBM_GBPS * 1e9), 1)
        out[name] = d
    return out


def _cpu_ab_fallback():
    """Tunnel-dead fallback evidence: a tiny-geometry high/fast A/B on
    the CPU backend, run in a subprocess with the axon plugin dropped
    (JAX_PLATFORMS=cpu alone still hangs on plugin init — NOTES.md).
    Ratio evidence only; absolute CPU times say nothing about the TPU."""
    code = r"""
import json, time, sys
sys.path.insert(0, %r)
import numpy as np, jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from speech_recognition_tools_tpu.dsp import FdlpConfig, fdlp_spectrogram_batch
B, n = 2, 32000
rs = np.random.RandomState(0)
x = jnp.asarray(rs.randn(B, n) * 2000, jnp.float32)
lens = jnp.full((B,), n, jnp.int32)
out = {}
for name, cfg in [
    ("fast", FdlpConfig(nfilters=80, order=150, fduration=1.5,
                        coeff_num=100, coeff_range="1,100")),
    ("high", FdlpConfig(nfilters=80, order=150, fduration=1.5,
                        coeff_num=100, coeff_range="1,100",
                        precision="high")),
]:
    f = jax.jit(lambda s: fdlp_spectrogram_batch(s, lens, cfg)[0])
    jax.block_until_ready(f(x))
    t0 = time.time()
    for _ in range(3):
        jax.block_until_ready(f(x + 1.0))
    out[name] = (time.time() - t0) / 3
print("CPUAB " + json.dumps(out))
""" % (_REPO,)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=max(60.0, min(360.0, _left() - 30.0)), cwd=_REPO, env=env,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("CPUAB "):
                d = json.loads(line[6:])
                return {
                    "cpu_ms_fast": round(d["fast"] * 1000, 1),
                    "cpu_ms_high": round(d["high"] * 1000, 1),
                    "cpu_high_over_fast": round(d["high"] / d["fast"], 2),
                }
    except Exception as e:
        return {"error": f"{type(e).__name__}: {e}"}
    return {"error": f"rc={proc.returncode}: {proc.stderr[-300:]}"}


def main():
    watchdog = _arm_watchdog()

    if not _probe_tunnel_with_backoff():
        # tunnel never answered within the budget: emit the best
        # persisted evidence + a CPU A/B chain, clearly labelled
        _note("running CPU A/B fallback")
        result = _emit_best_available("tunnel down for the whole bench "
                                      "budget window despite backoff retries")
        if isinstance(result.get("detail"), str):
            result["detail"] = {"capture": result["detail"]}
        result["detail"]["cpu_ab_fallback"] = _cpu_ab_fallback()
        result["detail"]["parity_evidence"] = (
            "the <1e-4 half of the joint clause is CPU-verified every "
            "round: tests/test_dsp_parity.py::test_mixed_precision_"
            "production_config (2e-7 synthetic; worst real wav 5.4e-7)"
        )
        watchdog.cancel()
        print(json.dumps(result))
        return

    import jax

    jax.config.update("jax_enable_x64", True)  # for the high mode
    cache = os.path.join(_REPO, ".cache", "jax")
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
    PARTIAL["audio_seconds"] = audio_seconds
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

    def guarded(label, thunk, min_left=60.0, partial_key=None):
        """Run a measurement unless the time budget is spent; returns
        None when skipped/failed so the detail field reads "skipped"
        and the driver still gets its JSON line. Completed values are
        persisted immediately (PARTIAL + .cache/bench_partial.json) so
        a later wedge can't erase them."""
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
        if partial_key:
            PARTIAL[partial_key] = round(dt * 1000, 1)
            _persist_partial()
        return dt

    # priority order: headline first, then the parity modes and A/B
    # partners, then the workload family — later entries are skipped
    # (reported as "skipped") if the tunnel's compile queue eats the
    # budget, so the driver always gets its JSON line.
    dt_prod = measure(fdlp_fn(FdlpConfig(**prod)))
    _note(f"prod fast: {dt_prod * 1000:.1f} ms")
    PARTIAL["ms_per_batch_prod_fast"] = round(dt_prod * 1000, 1)
    _persist_partial()
    # Everything past the headline runs inside _rest(): a TPU
    # worker crash (observed mid-compile on the offline-decode
    # program, 2026-08-20) must still emit the persisted-partial
    # JSON line instead of dying with a traceback and no artifact.
    def _rest():
        dt_prod_high = guarded(
            "prod high (north-star <1e-4 mode)",
            lambda: measure(fdlp_fn(FdlpConfig(**prod, precision="high")),
                            iters=4),
            min_left=240.0, partial_key="ms_per_batch_prod_high",
        )
        # ---- priority tier 2 (VERDICT r4 #3): train + serving MUST land in
        # the driver capture, so they run immediately after the north-star
        # lines, before the A/B partners and the workload family. Each line
        # is compile-dominated through the tunnel (~2-5 min), so ordering —
        # not iteration counts — is what decides what fits in the budget.

        # e2e training step (the production wsj geometry, bf16 compute):
        # full value_and_grad + adam update through the SAME make_train_step
        # the train_e2e CLI jits. Reported as steps/s + analytic matmul MFU
        # (this is the MXU-bound workload, unlike the VPU-bound featgen).
        train_tflops = [0.0]

        def run_train_step():
            import optax

            from speech_recognition_tools_tpu.cli.train_e2e import (
                make_train_step,
            )
            from speech_recognition_tools_tpu.models.transformer_asr import (
                TransformerASR,
                TransformerASRConfig,
                noam_schedule,
            )

            tcfg = TransformerASRConfig(
                vocab_size=52, adim=256, aheads=4, elayers=12, eunits=2048,
                dlayers=6, dunits=2048, dropout=0.1, mtlalpha=0.3,
                compute_dtype="bfloat16",
            )
            tmodel = TransformerASR(tcfg)
            Bt, Tt, Ut = 16, 800, 100
            rs_t = np.random.RandomState(7)
            batch = {
                "feats": jnp.asarray(rs_t.randn(Bt, Tt, 80).astype(np.float32)),
                "lengths": jnp.full((Bt,), Tt, jnp.int32),
                "tokens": jnp.asarray(
                    rs_t.randint(1, 50, (Bt, Ut)).astype(np.int32)
                ),
                "token_lengths": jnp.full((Bt,), Ut, jnp.int32),
            }
            params = tmodel.init(
                {"params": jax.random.key(0), "dropout": jax.random.key(1)},
                batch["feats"][:1], batch["lengths"][:1], batch["tokens"][:1],
            )
            tx = optax.chain(
                optax.clip_by_global_norm(5.0),
                optax.adam(noam_schedule(tcfg.adim, 25000, 10.0)),
            )
            opt_state = tx.init(params)
            step = make_train_step(tmodel, tcfg, tx)
            rng = jax.random.PRNGKey(2)

            # analytic fwd matmul flops (2mn k per GEMM), x3 for fwd+bwd
            a, e, d_u = tcfg.adim, tcfg.eunits, tcfg.dunits
            Te = Tt // 4  # conv2d subsampling
            enc = tcfg.elayers * (8 * Te * a * a + 4 * Te * Te * a
                                  + 4 * Te * a * e)
            dec = tcfg.dlayers * (
                8 * Ut * a * a + 4 * Ut * Ut * a        # self-attn
                + 4 * Ut * a * a + 4 * Te * a * a       # cross-attn q/o + k/v
                + 4 * Ut * Te * a                       # cross scores+context
                + 4 * Ut * a * d_u
            )
            train_tflops[0] = 3.0 * Bt * (enc + dec) / 1e12

            # dependency-chained: params/opt_state thread through the loop,
            # so the tunnel runtime cannot memoize; fetch loss at the end
            params, opt_state, loss, _ = step(params, opt_state, batch, rng)
            float(loss)  # compile + sync
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                for i in range(4):
                    params, opt_state, loss, _ = step(
                        params, opt_state, batch, jax.random.fold_in(rng, i)
                    )
                float(loss)
                best = min(best, (time.time() - t0) / 4)
            return best

        dt_train = guarded(
            "e2e train step (wsj geometry, bf16)", run_train_step,
            min_left=240.0, partial_key="s_train_step_e2e",
        )

        # online serving: 8 concurrent streams through StreamBatcher (one
        # padded batched encoder step per scheduling round; production-size
        # 12-layer chunked-attention encoder). Reported as AGGREGATE
        # x-realtime = streams * audio_seconds / wall — host scheduling
        # included, i.e. honest serving throughput, not a kernel number.
        _serving_model_cache = []

        def _serving_model():
            # built once, shared by the 8-stream and 64-stream lines — a
            # second init would pay another tunneled forward pass for the
            # identical (model, params) pair
            if _serving_model_cache:
                return _serving_model_cache[0]
            from speech_recognition_tools_tpu.models.transformer_asr import (
                TransformerASR,
                TransformerASRConfig,
            )

            scfg = TransformerASRConfig(
                vocab_size=52, adim=256, aheads=4, elayers=12, eunits=2048,
                dlayers=1, dunits=256, dropout=0.0,
                attn_chunk=16, attn_left_chunks=4,
            )
            smodel = TransformerASR(scfg)
            sparams = smodel.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                jnp.zeros((1, 80, 80), jnp.float32), jnp.asarray([80]),
                jnp.zeros((1, 4), jnp.int32),
            )
            _serving_model_cache.append((smodel, sparams))
            return smodel, sparams

        def _drive_streams(smodel, params, n_streams, frames=1000):
            # ONE batcher for warmup + timing: its jitted step compiles
            # on the first drive; the timed drive reuses the compiled
            # program (finished streams are released, no state build-up).
            # defer_s enables dynamic batching (the serve.py default):
            # per-stream pushes coalesce into FULL batched rounds.
            from speech_recognition_tools_tpu.infer.streaming_asr import (
                StreamBatcher,
            )

            rs_s = np.random.RandomState(5)
            featss = rs_s.randn(n_streams, frames, 80).astype(np.float32)
            sb = StreamBatcher(
                smodel, params, max_streams=n_streams, store_memory=False,
                defer_s=0.03,
            )

            def drive(lat=None):
                sids = [sb.open() for _ in range(n_streams)]
                for off in range(0, frames, 100):
                    t0 = time.time()
                    for i, sid in enumerate(sids):
                        sb.push(sid, featss[i, off : off + 100])
                    if lat is not None:
                        lat.append(time.time() - t0)
                for sid in sids:
                    sb.finish(sid)
                    sb.release(sid)

            drive()  # compile + warm
            lat = []  # per-round (1 s of audio x n_streams) latency
            t0 = time.time()
            drive(lat)
            dt = time.time() - t0
            lat_ms = np.sort(np.asarray(lat)) * 1000
            n = len(lat_ms)

            def pct(q):  # nearest-rank percentile
                return round(
                    float(lat_ms[min(n - 1, max(0, -(-q * n // 100) - 1))]), 1
                )

            return dt, {
                "p50": pct(50),
                "p90": pct(90),
                "max": round(float(lat_ms[-1]), 1),
                "budget": 1000.0,
            }

        serve_lat = serve_lat8 = None

        def run_serve_f32():
            nonlocal serve_lat
            smodel, sparams = _serving_model()
            dt, serve_lat = _drive_streams(smodel, sparams, 8)
            return dt

        dt_serve = guarded(
            "online serving (8-stream StreamBatcher, f32)", run_serve_f32,
            min_left=200.0, partial_key="s_serve_8x10s",
        )

        # ---- priority tier 3: A/B partners of the headline ----
        dt_light = guarded("light", lambda: measure(fdlp_fn(FdlpConfig())),
                           partial_key="ms_per_batch_light")
        dt_prod_scan = guarded(
            "prod scan-backend",
            lambda: measure(fdlp_fn(FdlpConfig(**prod, lpc_backend="scan"))),
            min_left=120.0, partial_key="ms_per_batch_prod_scan",
        )


        # ---- BASELINE.json workload family one-liners ----
        from speech_recognition_tools_tpu.dsp.augment import add_noise_snr

        mel_cfg = MelConfig(nfilters=80)
        dt_mel = guarded(
            "melspec",
            lambda: measure(lambda xin: mel_spectrum_batch(xin, lensd, mel_cfg)[0]),
            partial_key="ms_per_batch_melspec",
        )

        # noise-augmented FDLP (BASELINE "noise-mixing augmentation")
        noise = jnp.asarray(_speech_batch(1, n, srate, seed=1)[0])
        key = jax.random.PRNGKey(0)
        fast_cfg = FdlpConfig(**prod)

        @jax.jit
        def noisy_fdlp(xin):
            mixed_sig = add_noise_snr(key, xin, noise, 10.0)
            return fdlp_spectrogram_batch(mixed_sig, lensd, fast_cfg)[0]

        dt_noisy = guarded("noisy fdlp", lambda: measure(noisy_fdlp),
                           partial_key="ms_per_batch_noisy_fdlp")

        # real + complex M-vectors (10 s x 8 utts; the complex path's
        # shared-lag treatment is VERDICT r2 #5)
        Bm = 8
        lm = jnp.asarray(lens[:Bm])

        def mod_fn(cfg):
            return lambda xin: modulation_spectrum_batch(xin[:Bm], lm, cfg)[0]

        dt_mod_real = guarded(
            "mvector real", lambda: measure(mod_fn(ModSpecConfig()), iters=3),
            min_left=180.0, partial_key="ms_per_batch_mvector_real",
        )
        dt_mod_cplx = guarded(
            "mvector complex",
            lambda: measure(mod_fn(ModSpecConfig(complex_modulation=True)),
                            iters=3),
            min_left=180.0, partial_key="ms_per_batch_mvector_complex",
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
            min_left=180.0, partial_key="ms_per_batch_gev8ch",
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
                min_left=120.0, partial_key="ms_per_batch_gev8ch_split",
            )

        # offline batch decode: the reference's slowest stage is decode
        # (decode_dnn.sh / asr_recog.py fan out a grid of single-utterance
        # jobs, e2e/wsj/run_fdlp_e1.sh:527-543); here B utterances run as ONE
        # jitted joint CTC/attention beam search program (beam 10, max_len
        # 100 — conf/decode.yaml), with and without RNNLM shallow fusion.
        decode_meta = {}

        def run_offline_decode(with_lm):
            from speech_recognition_tools_tpu.decode.beam_jit import (
                beam_search_jit_batched,
            )
            from speech_recognition_tools_tpu.models.rnnlm import (
                RNNLM,
                make_jit_fusion_scorer,
            )
            from speech_recognition_tools_tpu.models.transformer_asr import (
                TransformerASR,
                TransformerASRConfig,
            )

            dcfg = TransformerASRConfig(
                vocab_size=52, adim=256, aheads=4, elayers=12, eunits=2048,
                dlayers=6, dunits=2048, dropout=0.0,
            )
            dmodel = TransformerASR(dcfg)
            Bd, Td = 4, 800  # 4 x 8 s utterances per program
            rs_d = np.random.RandomState(11)
            dfeats = jnp.asarray(rs_d.randn(Bd, Td, 80).astype(np.float32))
            dlens = jnp.full((Bd,), Td, jnp.int32)
            dparams = dmodel.init(
                {"params": jax.random.key(3), "dropout": jax.random.key(4)},
                dfeats[:1], dlens[:1], jnp.zeros((1, 4), jnp.int32),
            )
            # the bench process runs with x64 enabled (high mode), which
            # makes init produce f64 params — the beam search would then
            # run on software-emulated f64 matmuls (~10x slow; measured
            # 29.4 s/batch vs the rehearsal's ~1 s/utt). Serve/decode is
            # an f32 surface: cast.
            dparams = jax.tree.map(
                lambda x: x.astype(jnp.float32)
                if x.dtype == jnp.float64 else x, dparams)
            lm_apply = None
            if with_lm:
                lm_model = RNNLM(vocab_size=52, embed_dim=256, hidden=1000)
                lm_params = lm_model.init(
                    jax.random.key(5), jnp.zeros((1, 4), jnp.int32)
                )
                lm_params = jax.tree.map(
                    lambda x: x.astype(jnp.float32)
                    if x.dtype == jnp.float64 else x, lm_params)
                lm_apply = make_jit_fusion_scorer(lm_model, lm_params)

            def decode(f):
                toks, scores = beam_search_jit_batched(
                    dmodel, dparams, f, dlens, beam_size=10, max_len=100,
                    ctc_weight=0.3, lm_apply=lm_apply, lm_weight=0.7,
                )
                return scores

            # dependency-chained (same rationale as measure()): perturb the
            # feats by a zero scalar derived from the previous scores
            s = decode(dfeats)  # compile
            d = s.ravel()[0] * 0.0
            float(d)
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                for _ in range(2):
                    s = decode(dfeats + d)
                    d = s.ravel()[0] * 0.0
                float(d)
                best = min(best, (time.time() - t0) / 2)
            decode_meta["batch"] = Bd
            decode_meta["utt_seconds"] = Td / 100.0
            return best

        dt_dec = guarded(
            "offline decode (beam 10, no LM)",
            lambda: run_offline_decode(False),
            min_left=240.0, partial_key="s_offline_decode_beam10",
        )
        dt_dec_lm = guarded(
            "offline decode (beam 10 + RNNLM fusion)",
            lambda: run_offline_decode(True),
            min_left=200.0, partial_key="s_offline_decode_beam10_rnnlm",
        )

        # int8 serving variant (weight-only int8 encoder, infer/quantize.py):
        # same stack, the big matmul weights stay int8 in HBM (dequant fused
        # per use). Lower priority than the f32 line — it is an A/B partner,
        # not the representative serving number.
        def run_serve_int8():
            nonlocal serve_lat8
            from speech_recognition_tools_tpu.infer.quantize import (
                quantize_encoder,
            )

            smodel, sparams = _serving_model()
            dt, serve_lat8 = _drive_streams(smodel, quantize_encoder(sparams), 8)
            return dt

        dt_serve8 = guarded(
            "online serving int8 (8-stream StreamBatcher)", run_serve_int8,
            min_left=150.0, partial_key="s_serve_8x10s_int8",
        )

        # serving CAPACITY: how many live real-time streams one chip
        # sustains. 64 concurrent streams through one batcher; the chip
        # keeps up as long as each 1-s-of-audio scheduling round stays
        # under 1 s wall (p90 < budget). f32 only; lowest budget priority,
        # so it runs LAST — a hang here cannot starve any headline line.
        serve_cap_lat = None

        def run_serving_capacity():
            nonlocal serve_cap_lat
            smodel, sparams = _serving_model()
            dt, serve_cap_lat = _drive_streams(smodel, sparams, 64)
            return dt

        dt_serve64 = guarded(
            "serving capacity (64-stream StreamBatcher)", run_serving_capacity,
            min_left=400.0, partial_key="s_serve_64x10s",
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
                "mfu": _mfu_detail(prod, B, n, dt_prod, dt_prod_high),
                "workloads_x_realtime": {
                    "melspec_80band": xrt(dt_mel),
                    "fdlp_noise_augmented": xrt(dt_noisy),
                    "mvector_real": xrt(dt_mod_real, Bm * secs),
                    "mvector_complex": xrt(dt_mod_cplx, Bm * secs),
                    "gev8ch_to_fdlp": xrt(dt_8ch, n8 / srate),
                    "online_serve_8stream_aggregate": xrt(dt_serve, 8 * 10.0),
                    "online_serve_8stream_aggregate_int8": xrt(
                        dt_serve8, 8 * 10.0
                    ),
                    "offline_decode_beam10": xrt(
                        dt_dec,
                        decode_meta.get("batch", 0)
                        * decode_meta.get("utt_seconds", 0.0),
                    ),
                    "offline_decode_beam10_rnnlm": xrt(
                        dt_dec_lm,
                        decode_meta.get("batch", 0)
                        * decode_meta.get("utt_seconds", 0.0),
                    ),
                },
                # jitted batched joint CTC/attention beam search (decode/
                # beam_jit.py) at production geometry; p50 per-utt latency =
                # batch wall / B (all B decode in one program)
                "offline_decode": (
                    {
                        "geometry": "12 enc / 6 dec, adim 256, units 2048, "
                                    "beam 10, max_len 100, ctc_weight 0.3, "
                                    f"B{decode_meta.get('batch')} x "
                                    f"{decode_meta.get('utt_seconds')} s utts",
                        "utts_per_s": round(
                            decode_meta.get("batch", 0) / dt_dec, 2
                        ),
                        "p50_per_utt_ms": round(
                            dt_dec * 1000 / max(decode_meta.get("batch", 1), 1),
                            1,
                        ),
                        "utts_per_s_rnnlm": (
                            round(decode_meta.get("batch", 0) / dt_dec_lm, 2)
                            if dt_dec_lm else "skipped"
                        ),
                    }
                    if dt_dec
                    else "skipped"
                ),
                # wall latency to advance all 8 streams by 1 s of audio (one
                # scheduling round over the batched chunked encoder); under
                # budget=1000 ms means live serving keeps up with real time
                "train_step_e2e": (
                    {
                        "geometry": "B16 x 800 frames, elayers 12 / dlayers 6, "
                                    "adim 256, units 2048, bf16 compute, adam "
                                    "+ noam (the train_e2e CLI's step)",
                        "ms_per_step": round(dt_train * 1000, 1),
                        "steps_per_s": round(1.0 / dt_train, 2),
                        "analytic_matmul_tflops_per_step": round(
                            train_tflops[0], 2
                        ),
                        "achieved_tflops": round(train_tflops[0] / dt_train, 1),
                        "mxu_util_pct_of_197tflops_bf16": round(
                            100.0 * train_tflops[0] / dt_train / 197.0, 1
                        ),
                    }
                    if dt_train
                    else "skipped"
                ),
                "serve_chunk_latency_ms": serve_lat or "skipped",
                "serve_chunk_latency_ms_int8": serve_lat8 or "skipped",
                # capacity: 64 live streams on one chip; sustained iff p90
                # round latency stays under the 1 s budget
                "serve_capacity_64stream": (
                    {
                        "aggregate_x_realtime": xrt(dt_serve64, 64 * 10.0),
                        "round_latency_ms": serve_cap_lat,
                        "sustains_realtime": bool(
                            serve_cap_lat and serve_cap_lat["p90"] < 1000.0
                        ),
                    }
                    if dt_serve64
                    else "skipped"
                ),
                # measured (r4, in-process A/B at this geometry): the step is
                # dispatch-bound through the tunneled chip (~6-8 ms/step for
                # f32 == bf16 == int8 alike), so the int8 line tracks the f32
                # one within tunnel variance. int8's value is the 4x smaller
                # weight HBM footprint (production-size encoders / many
                # resident models), not latency at this size.
                "serve_int8_note": "weight-HBM compression, not a latency "
                                   "optimization; step is dispatch-bound at "
                                   "this geometry",
            },
        }
        return result

    try:
        result = _rest()
    except BaseException as e:  # incl. runtime UNAVAILABLE after a worker crash
        _note(f"CRASH mid-bench: {type(e).__name__}: {e}")
        result = _emit_best_available(
            f"bench crashed mid-run ({type(e).__name__}); persisted "
            "partial measurements reported")
    watchdog.cancel()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
