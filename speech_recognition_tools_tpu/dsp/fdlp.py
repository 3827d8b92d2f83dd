"""FDLP spectrogram — the flagship front-end — as one batched XLA program.

Pipeline (parity target: /root/reference/src/featgen/computeFDLPSpectrogram.py
getFeats, :29-237):

  1. long analysis windows (fduration sec) at a low frame rate
     lfr = 1/(overlap_fraction * fduration)                       [framing]
  2. DCT of each window / sqrt(2 * srate * fduration)             [dct]
  3. per mel/cochlear band: mask the DCT, circular-autocorrelate,
     Levinson-Durbin LPC(order), LPC->cepstrum(coeff_num), optional
     mask / lifter / gamma weights / odd-zero                     [lpc]
  4. pole-model Hilbert envelope |exp(FFT(cepstrum))| — computed here as
     exp(cepstrum @ cos-DFT matrix), a small matmul               [envelope]
  5. hanning/window-compensated overlap-add back to `frate` Hz frames
     (reference adds +-1 frame random jitter per step; optional here via a
     PRNG key, pinned to 0 for parity)                            [ola]
  6. log(clip(., 1e-14))

TPU-first structure: the whole batch of utterances runs as one jitted
program; the per-(frame x band) LPC problems are flattened into a single
wide problem axis so the sequential order/cepstrum scans are elementwise
over thousands of lanes. The banded autocorrelation factors the per-band
masked lag products into signal lag products (shared across bands) times
host-derivable filterbank lag products, contracted on the MXU — one
einsum per lag block instead of per-band shifted stacks (ops/autocorr).

Precision modes: the Levinson recursion amplifies *non-realizable*
autocorrelation rounding — lag errors that are not the exact
autocorrelation of any signal — by the Toeplitz condition number of
narrowband mel channels; separately, any f32 *transform's* absolute
error (~eps * ||frame||) lands on near-silent mel bands of real speech
and costs up to ~5e-3. Round-3 kernel work made the full-f64 chain
cheap (the O(N log N) mixed-radix Stockham f64 FFT/DCT in ops/fft64
replaces the O(N^2) emulated matmul, and the f64 lag contraction is
compacted to the mel band supports, ~30x less work), so there are two
real modes:
  * precision="fast": float32 throughout — ~1e-4 max deviation on
    synthetic speech, up to ~1e-1 on silence-heavy real speech; right
    for feature extraction feeding a network.
  * precision="high" (alias "mixed" — the names merged in round 3):
    the framing stays pure data movement; everything from the (cheap)
    window multiply on runs f64. Meets the ≥1000x-realtime AND <1e-4
    north star with max |Δlog-feat| ~2e-7 synthetic / ~5e-7 on the
    worst real reference wav.
"""

from dataclasses import dataclass
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from speech_recognition_tools_tpu.dsp.filterbanks import parse_fbank_type
from speech_recognition_tools_tpu.ops.autocorr import (
    banded_autocorr,
    banded_autocorr_compact,
    banded_support_plan,
    banded_supports_separable,
)
from speech_recognition_tools_tpu.ops.cepstrum import lpc_to_cepstrum
from speech_recognition_tools_tpu.ops.dct import dct2
from speech_recognition_tools_tpu.ops.framing import (
    bucketed_min_samples,
    frame_count,
    frame_params,
    frame_signal,
    frame_signal_time_sharded,
)
from speech_recognition_tools_tpu.ops.levinson import lpc_from_autocorr
from speech_recognition_tools_tpu.ops.ola import ola_positions, overlap_add
from speech_recognition_tools_tpu.ops.windows import WINDOWS


@dataclass(frozen=True)
class FdlpConfig:
    """Static FDLP configuration (CLI-flag parity with the reference)."""

    srate: int = 16000
    nfilters: int = 20
    coeff_num: int = 50
    coeff_range: str = "1,20"
    order: int = 50
    fduration: float = 0.5
    frate: int = 100
    overlap_fraction: float = 0.25  # input convention; used = 1 - this
    fbank_type: str = "mel,1"
    odd_mod_zero: bool = False
    gamma_weight: str = "None"  # 'scale,shape,pk'
    lifter_config: tuple | None = None
    window: str = "hamming"
    # 'fast' (f32) | 'high' (f64 from the window multiply on: <1e-4
    # parity at >=1000x realtime; 'mixed' is an equivalent alias)
    precision: str = "fast"
    # LPC+cepstrum recursion backend: 'scan' = two XLA lax.scans
    # ('scan:unroll=N' unrolls the scans N-fold); 'fused' = single
    # Pallas kernel (ops/pallas_lpc, f32/TPU only); 'blocked[:B]' =
    # blocked Schur/Szego Levinson (ops/levinson, real lags) + unrolled
    # cepstrum scan; 'auto' = fused on the TPU fast path, blocked on
    # every f64 path (sharded too — bit-exact under GSPMD), scan
    # elsewhere.
    lpc_backend: str = "auto"

    @property
    def overlap_used(self) -> float:
        return 1.0 - self.overlap_fraction

    @property
    def lfr(self) -> float:
        return 1.0 / (self.overlap_used * self.fduration)


@lru_cache(maxsize=32)
def _host_constants(cfg: FdlpConfig):
    """All data-independent constants, in float64 on the host."""
    fp = frame_params(cfg.srate, cfg.lfr, cfg.fduration)
    ndct = fp.flength_samples

    nfft_fb = int(2 * cfg.fduration * cfg.srate)
    fbank = parse_fbank_type(cfg.fbank_type, cfg.nfilters, nfft_fb, cfg.srate)
    fbank = fbank[:, :-1]  # reference uses fbank[j, 0:-1]
    assert fbank.shape[1] == ndct, (fbank.shape, ndct)

    win = WINDOWS[cfg.window](ndct)

    lowpass, highpass = (int(x) for x in cfg.coeff_range.split(","))
    idx = np.arange(cfg.coeff_num)
    mask = ((idx >= lowpass) & (idx <= highpass)).astype(np.float64)

    weights = mask.copy()
    if cfg.lifter_config is not None:
        weights = weights * np.asarray(cfg.lifter_config, dtype=np.float64)
    gw = cfg.gamma_weight.strip().split(",")
    if gw[0] != "None":
        import scipy.stats as stats

        scale, shape, pk_required = float(gw[0]), float(gw[1]), float(gw[2])
        x = np.linspace(0, cfg.order - 1, cfg.order)
        res = 2 * cfg.fduration
        pk_required = pk_required * res
        pk = (shape - 1) * scale
        loc = -pk + pk_required
        mod_wts = stats.gamma.pdf(x, a=shape, loc=loc, scale=scale) * 3 * scale
        # reference multiplies the (coeff_num,) cepstra by the (order,) gamma
        # weights; shapes must agree there, as they do in its recipes.
        weights = weights * mod_wts[: cfg.coeff_num]
    if cfg.odd_mod_zero:
        weights = weights * (1.0 - (idx % 2))

    # envelope constants
    kk = int(np.round(cfg.fduration * cfg.frate))
    kkb2 = int(np.round(cfg.fduration * cfg.frate / 2))
    hop = int(np.round(cfg.fduration * cfg.frate * cfg.overlap_used))
    nfft_env = 2 * int(cfg.fduration * cfg.frate)
    # Re(FFT(c, nfft_env))[k] = sum_n c[n] cos(2 pi k n / nfft_env), k < kk
    nidx = np.arange(cfg.coeff_num)[:, None]
    kidx = np.arange(kk)[None, :]
    cosmat = np.cos(2.0 * np.pi * nidx * kidx / nfft_env)
    env_win = np.hanning(kk) / WINDOWS[cfg.window](kk)

    return dict(
        fp=fp,
        fbank=fbank,
        win=win,
        weights=weights,
        kk=kk,
        kkb2=kkb2,
        hop=hop,
        cosmat=cosmat,
        env_win=env_win,
    )


def _band_cepstra(cos_dct, fbank, order, coeff_num, backend="scan",
                  ac_plan=None):
    """Per-band LPC cepstra for all (utt x frame) problems.

    cos_dct: (P, ndct); fbank: (nb, ndct) in the work dtype.
    Returns (P, nb, coeff_num). The banded autocorrelation shares the
    signal lag products across all bands (one MXU einsum per lag block;
    see ops/autocorr.banded_autocorr); in f64 (mixed/high precision) the
    dense einsum is software-emulated and dominates the whole pipeline
    (~720 of 880 ms at the production config), so a static support plan
    switches to the ~30x-less-work compacted form
    (ops/autocorr.banded_autocorr_compact). The two sequential
    recursions (Levinson + cepstrum) then run over P*nb flattened
    lanes — either as XLA scans or as the fused Pallas kernel
    (backend='fused') that keeps all recursion state in VMEM.
    """
    if ac_plan is not None:
        r = banded_autocorr_compact(cos_dct, fbank, order + 2, ac_plan)
    else:
        r = banded_autocorr(cos_dct, fbank, order + 2)  # (P, nb, order+2)
    if r.dtype == jnp.float32:
        # f32 fast path only: tiny diagonal loading (white-noise ridge)
        # bounds the LPC pole radii. On near-periodic audio a band's
        # order-150 predictor legitimately carries ~1e21-scale
        # coefficients whose cancellation the f64 reference survives but
        # f32 cannot (NaN cepstra poisoned a whole synthetic corpus —
        # round-5 dress rehearsal). 1e-5 collapses max|a| from 3e21 to
        # ~4 on the pathological bands and shifts healthy-band features
        # well inside fast mode's documented ~1e-4 synthetic tolerance.
        # The f64 (mixed/high) path is untouched: it needs no ridge and
        # must keep <1e-4 reference conformance.
        r = r.at[..., 0].mul(1.0 + 1e-4)
    if backend == "fused":
        from speech_recognition_tools_tpu.ops.pallas_lpc import (
            lpc_cepstra_pallas,
        )

        P, nb, L = r.shape
        cep = lpc_cepstra_pallas(r.reshape(P * nb, L), order, coeff_num)
        return cep.reshape(P, nb, coeff_num)
    unroll = 1
    block = None
    if backend.startswith("scan:unroll="):
        unroll = int(backend.split("=", 1)[1])
    elif backend == "blocked" or backend.startswith("blocked:"):
        # blocked Schur/Szego Levinson (ops/levinson): ~1.7x over the
        # unrolled scan on the f64 high path; the cepstrum recursion
        # keeps its best scan form (unroll=4).
        block = int(backend.split(":", 1)[1]) if ":" in backend else 15
        unroll = 4
    xlpc, gg = lpc_from_autocorr(r, order, unroll=unroll, block=block)
    return lpc_to_cepstrum(xlpc, gg, coeff_num, unroll=unroll)  # (P, nb, C)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_samples", "shard", "min_samples", "input_sharded"
    ),
)
def _fdlp_impl(
    signals, num_samples, fbank_arr, cfg: FdlpConfig, max_samples: int, jitter,
    shard=None, min_samples=None, input_sharded=False,
):
    # fbank_arr is passed as a TRACED argument (not a closure constant) so
    # XLA cannot constant-fold the per-lag filterbank products in
    # banded_autocorr into the executable — folding them materialises an
    # (nb, order, ndct) literal that blows past protobuf limits at the
    # production config (80 bands, order 150, 1.5 s windows).
    c = _host_constants(cfg)
    fp = c["fp"]
    dtype = signals.dtype
    B = signals.shape[0]
    # Since round 3 'mixed' and 'high' are the same path: the framing is
    # exact data movement, so the f64 chain starts at the (cheap) window
    # multiply, the DCT is the O(N log N) Stockham f64 (ops/fft64), and
    # the lag contraction is support-compacted — the whole f64 chain
    # costs ~4.5x the f32 path instead of the old ~30x. 'mixed' is kept
    # as an alias.
    high = cfg.precision in ("high", "mixed")
    front_dtype = jnp.float64 if high else dtype
    lpc_dtype = jnp.float64 if high else dtype

    # An f32 DCT's absolute error (~eps * ||frame||) lands on
    # near-silent mel bands and costs up to ~5e-3 on real speech (worst
    # reference wav); the f64 DCT is the O(N log N) mixed-radix
    # Stockham (ops/fft64), not the O(N^2) matmul.
    dct_dtype = front_dtype
    # Sequence (time-axis) parallelism, SURVEY §5: every stage between
    # framing and the OLA is independent per analysis frame, so the frame
    # axis shards cleanly over the mesh's `time_axis`; the OLA's shifted
    # adds only couple ceil(kk/hop)-1 neighbouring frames, which GSPMD
    # turns into halo exchanges over ICI. `shard` is a static
    # (mesh, data_axis, time_axis) triple; constraints below anchor the
    # partitioner, everything between them is propagated.
    if shard is not None:
        mesh, data_ax, time_ax = shard
        flat_ax = tuple(a for a in (data_ax, time_ax) if a is not None)

        def cstr(x, spec):
            return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
    else:
        flat_ax = ()

        def cstr(x, spec):
            return x

    max_frames = int(frame_count(max_samples, fp))
    if input_sharded:
        # sample-sharded framing: the waveform itself is sharded over the
        # time axis and only flength-scale halos move between devices —
        # per-device HBM for the input scales 1/n_time (VERDICT r2 #4)
        frames = frame_signal_time_sharded(
            signals, fp, max_frames, mesh, data_ax, time_ax
        )
        max_frames = int(frames.shape[1])  # padded to a multiple of nt
        num_frames = frame_count(num_samples, fp)
    else:
        # frame with a unit window (gather of exact samples); the window
        # is applied in the work dtype so the f64 path sees no f32
        # rounding.
        ones = jnp.ones((fp.flength_samples,), dtype)
        frames, num_frames = frame_signal(
            signals, num_samples, fp, ones, max_frames,
            min_samples=min_samples,
        )
    frames = frames.astype(front_dtype) * jnp.asarray(c["win"], front_dtype)
    if shard is not None:
        frames = cstr(frames, P(data_ax, time_ax))

    # DCT-II (scipy.fftpack scaling) / sqrt(2 * srate*fduration), as blocked
    # cosine matmuls (XLA FFT at non-pow2 lengths is pathologically slow on
    # TPU, and f64 FFT does not compile).
    scale = jnp.asarray(1.0 / np.sqrt(2 * int(cfg.srate * cfg.fduration)), dct_dtype)
    cos_dct = dct2(frames, dtype=dct_dtype, allow_fft=shard is None) * scale
    cos_dct = cos_dct.reshape(B * max_frames, -1)
    cos_dct = cstr(cos_dct, P(flat_ax or None))

    nb = c["fbank"].shape[0]
    # resolve the LPC backend: the fused Pallas kernel is f32/TPU-only
    # (jax.default_backend() is a trace-time constant under jit); the
    # sharded path stays on scans (pallas_call + GSPMD partitioning of
    # the flattened lane axis is not supported).
    lpc_backend = cfg.lpc_backend
    if lpc_backend == "auto":
        on_tpu = jax.default_backend() in ("tpu", "axon")
        if on_tpu and shard is None and lpc_dtype == jnp.float32:
            lpc_backend = "fused"
        elif lpc_dtype == jnp.float64:
            # blocked Schur/Szego Levinson: 86 -> 51 ms on the v5e at
            # the production shape vs the unrolled scan, machine-eps
            # agreement (ops/levinson.levinson_durbin_blocked). Under
            # GSPMD the solver partitions trivially (the LPC stage is
            # elementwise over fully-sharded lanes): bit-exact vs the
            # scan on the virtual data x time mesh
            # (tests/test_parallel_featgen.py), and the driver dryrun
            # revalidates the sharded path every round.
            lpc_backend = "blocked:15"
        else:
            lpc_backend = "scan"
    # f64 lags: route through the support-compacted form (exact; ~30x
    # less contraction work than the dense emulated-f64 einsum)
    ac_plan = (
        banded_support_plan(np.asarray(c["fbank"]), cfg.order + 2)
        if lpc_dtype == jnp.float64
        else None
    )
    ceps = _band_cepstra(
        cos_dct.astype(lpc_dtype), fbank_arr.astype(lpc_dtype),
        cfg.order, cfg.coeff_num, backend=lpc_backend, ac_plan=ac_plan,
    )
    ceps = cstr(ceps, P(flat_ax or None))

    # Envelope projection: the dot result *is* the log-envelope, so MXU
    # f32-HIGHEST (bf16 6-pass, ~1e-6 rel) would inject ~1e-4 absolute error
    # straight into the final log feature. In high mode the tiny (C x kk)
    # projection therefore stays f64 through the exp; fast mode accepts it.
    ceps = ceps * jnp.asarray(c["weights"], lpc_dtype)[None, None, :]
    log_env = jnp.einsum(
        "pbc,ck->pbk",
        ceps,
        jnp.asarray(c["cosmat"], lpc_dtype),
        preferred_element_type=lpc_dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    # A pole sitting on a band harmonic (near-periodic audio) can push
    # the log-envelope past exp's dtype range; the f64 reference returns
    # a huge-but-finite value, f32 would return inf and poison CMVN/
    # training with NaNs (caught by the corpus dress rehearsal on
    # synthetic speech). Saturate the exponent dtype-safely: 75 keeps
    # exp(.) * kk-window OLA sums inside f32; only pathological frames
    # engage the clamp.
    env_cap = 700.0 if lpc_dtype == jnp.float64 else 75.0
    env = jnp.exp(jnp.minimum(log_env, env_cap)).astype(dtype)
    env = env * jnp.asarray(c["env_win"], dtype)[None, None, :]
    env = env.reshape(B, max_frames, nb, c["kk"])
    if shard is not None:
        env = cstr(env, P(data_ax, time_ax))

    # output lengths: T_b = ceil(n_b * frate / srate) (exact int arithmetic)
    out_len = -((-num_samples * cfg.frate) // cfg.srate)
    max_out = int(-((-max_samples * cfg.frate) // cfg.srate))

    if jitter is None:
        pos, valid = ola_positions(max_frames, c["hop"], c["kk"], c["kkb2"])
        feats = overlap_add(
            env, pos, valid, num_frames, out_len, max_out,
            hop=c["hop"], kkb2=c["kkb2"],
        )
    else:
        pos, valid = jax.vmap(
            lambda j: ola_positions(max_frames, c["hop"], c["kk"], c["kkb2"], j)
        )(jitter)
        valid = valid[0]
        feats = overlap_add(env, pos, valid, num_frames, out_len, max_out)
    # TPU's native f32 log has ~1e-4 absolute error; in mixed/high modes
    # take the final log in f64 (emulated, ~1e-14) and cast back.
    feats = jnp.clip(feats, min=jnp.asarray(1e-14, dtype))
    feats = jnp.log(feats.astype(lpc_dtype)).astype(dtype)
    if shard is not None:
        # gather the (small) output: replicated over time, sharded on data
        feats = cstr(feats, P(data_ax))
    return jnp.swapaxes(feats, 1, 2), out_len  # (B, T, nfilters), (B,)


def fdlp_spectrogram_batch(
    signals,
    num_samples,
    cfg: FdlpConfig = FdlpConfig(),
    *,
    jitter_key=None,
    dtype=jnp.float32,
    _shard=None,
):
    """FDLP spectrogram for a zero-padded batch of waveforms.

    Args:
      signals: (B, Nmax) waveforms (int16-scale floats, like the reference
        which does not normalise).
      num_samples: (B,) true sample counts.
      cfg: static configuration.
      jitter_key: optional PRNG key enabling the reference's +-1-frame OLA
        jitter (randrange(2)); None pins jitter to 0 for reproducibility.
      dtype: I/O + benign-stage dtype (float32 on TPU; float64 for CPU
        parity tests).

    Returns:
      feats: (B, Tmax, nfilters) log FDLP spectrogram (rows past each
        utterance's true length are garbage; mask with num_out_frames).
      num_out_frames: (B,) true output frame counts.
    """
    if cfg.precision in ("high", "mixed") and not jax.config.read(
        "jax_enable_x64"
    ):
        raise ValueError(
            f"FdlpConfig(precision={cfg.precision!r}) needs jax_enable_x64 "
            "(jax.config.update('jax_enable_x64', True))"
        )
    signals = jnp.asarray(signals, dtype)
    num_samples = jnp.asarray(num_samples, jnp.int32)
    max_samples = int(signals.shape[1])
    jitter = None
    if jitter_key is not None:
        fp = frame_params(cfg.srate, cfg.lfr, cfg.fduration)
        max_frames = int(frame_count(max_samples, fp))
        jitter = jax.random.bernoulli(
            jitter_key, 0.5, (signals.shape[0], max_frames)
        ).astype(jnp.int32)
    # banded autocorrelation is exact for the circular reference form only
    # when no band's support wraps the spectrum ends (true for every
    # mel/cochlear bank the reference builds) — asserted host-side.
    fbank = np.asarray(_host_constants(cfg)["fbank"])
    assert banded_supports_separable(fbank, cfg.order + 2), (
        "a filterbank band wraps the spectrum ends; banded_autocorr "
        "would drop its circular wrap terms"
    )
    fb_dtype = (
        jnp.float64 if cfg.precision in ("high", "mixed") else signals.dtype
    )
    # static length floor enables the gather-free framing fast path
    # (ops/framing.py); bucketed so it takes only two values. When this
    # function is itself called under jit (num_samples is a tracer, e.g.
    # featgen fused into a training step) the lengths are unknown at
    # trace time — fall back to the gather-fixup framing.
    fp = frame_params(cfg.srate, cfg.lfr, cfg.fduration)
    min_samples = bucketed_min_samples(num_samples, fp)
    return _fdlp_impl(
        signals, num_samples, jnp.asarray(fbank, fb_dtype), cfg,
        max_samples, jitter, shard=_shard, min_samples=min_samples,
    )


def fdlp_spectrogram_input_sharded(
    signals,
    num_samples,
    cfg: FdlpConfig,
    mesh,
    *,
    time_axis: str = "time",
    data_axis: str | None = None,
    dtype=jnp.float32,
):
    """Sequence-parallel FDLP with the *waveform itself* sharded.

    `fdlp_spectrogram_sharded` shards the analysis-frame compute but
    replicates the input signal on every device; for hour-long
    utterances the waveform dominates HBM. Here the sample axis lives
    sharded over `time_axis` (shard_map framing with <= flength-sample
    ppermute halos, ops/framing.frame_signal_time_sharded), so
    per-device input bytes scale 1/n_time; the rest of the chain runs
    under the same GSPMD frame sharding as the frame-parallel path.

    Restrictions: all utterances full length (num_samples == N; pad the
    batch equal or use the frame-sharded variant for ragged), N
    divisible by the time-axis size, no OLA jitter.
    """
    ns = np.asarray(num_samples)
    if not (ns == signals.shape[1]).all():
        raise ValueError(
            "input-sharded featgen requires full-length utterances "
            "(num_samples == signals.shape[1]); use "
            "fdlp_spectrogram_sharded for ragged batches"
        )
    signals = jnp.asarray(signals, dtype)
    fbank = np.asarray(_host_constants(cfg)["fbank"])
    assert banded_supports_separable(fbank, cfg.order + 2)
    fb_dtype = (
        jnp.float64 if cfg.precision in ("high", "mixed") else dtype
    )
    if cfg.precision in ("high", "mixed") and not jax.config.read(
        "jax_enable_x64"
    ):
        raise ValueError(
            f"FdlpConfig(precision={cfg.precision!r}) needs jax_enable_x64"
        )
    return _fdlp_impl(
        signals, jnp.asarray(num_samples, jnp.int32),
        jnp.asarray(fbank, fb_dtype), cfg, int(signals.shape[1]), None,
        shard=(mesh, data_axis, time_axis), input_sharded=True,
    )


def fdlp_spectrogram_sharded(
    signals,
    num_samples,
    cfg: FdlpConfig,
    mesh,
    *,
    time_axis: str | None = "time",
    data_axis: str | None = None,
    jitter_key=None,
    dtype=jnp.float32,
):
    """Sequence-parallel FDLP extraction over a device mesh (SURVEY §5).

    Shards the *analysis-frame* axis over `mesh`'s `time_axis` (and
    optionally the utterance axis over `data_axis`): each device runs the
    DCT → banded autocorrelation → Levinson → cepstrum → envelope chain
    for its contiguous block of frames, and the overlap-add — an
    associative add coupling only ceil(kk/hop)-1 neighbouring frames —
    is stitched by GSPMD halo exchanges over ICI. Use for long-utterance
    featgen where a single chip's HBM cannot hold the (F, NB, kk)
    envelope tensor, or to cut wall-clock linearly in the mesh size.

    Same contract as `fdlp_spectrogram_batch`; output is replicated over
    `time_axis` (sharded over `data_axis` if given).
    """
    return fdlp_spectrogram_batch(
        signals, num_samples, cfg, jitter_key=jitter_key, dtype=dtype,
        _shard=(mesh, data_axis, time_axis),
    )
