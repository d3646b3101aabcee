"""Fused waveform → log-mel front end, TPU-native.

Numerically replicates the reference front end — HF ``Speech2TextFeatureExtractor``
as wrapped by ``CustomFeatureExtractor`` (reference:
src/utilities/feature_extractors.py:14-61) — which computes Kaldi-compatible
80-dim log-mel fbank: 25 ms povey-windowed frames every 10 ms, per-frame DC
removal, 0.97 pre-emphasis, 512-point power spectrum, Kaldi-mel triangular
filters (20 Hz .. Nyquist, no norm), natural log with a mel floor, and
per-utterance or global CMVN.

TPU-first design notes:
  * The DFT is expressed as two (frame_length × num_bins) matmuls (cos/sin
    bases with the zero-padding to fft_length folded in), which run on the
    MXU and fuse with windowing/mel projection — faster on TPU than a small
    batched FFT on the VPU, and exact to fp tolerance.
  * Everything is shape-static and batched: input is a padded (B, S) waveform
    batch plus lengths; output is (B, T, num_mel) plus frame lengths. The
    whole pipeline jits into a handful of fused XLA kernels and can run
    inside the training step (no host featurization needed).
  * CMVN is masked (computed over valid frames only), matching the
    reference's ``utterance_cmvn`` which normalizes over ``input_length``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def povey_window(window_length: int = 400) -> np.ndarray:
    """Symmetric povey window: hann(N, sym)**0.85 (Kaldi's default fbank window)."""
    n = np.arange(window_length, dtype=np.float64)
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / (window_length - 1))
    return np.power(hann, 0.85)


def _hz_to_mel_kaldi(freq):
    return 1127.0 * np.log(1.0 + np.asarray(freq, dtype=np.float64) / 700.0)


def kaldi_mel_filter_bank(
    num_frequency_bins: int = 257,
    num_mel_filters: int = 80,
    min_frequency: float = 20.0,
    max_frequency: float = 8000.0,
    sampling_rate: int = 16000,
) -> np.ndarray:
    """Kaldi-style triangular mel filter bank, triangularized in mel space.

    Matches HF ``mel_filter_bank(..., norm=None, mel_scale="kaldi",
    triangularize_in_mel_space=True)``, which is what the reference's
    feature extractor uses when torchaudio is absent.
    Returns (num_frequency_bins, num_mel_filters), float64.
    """
    mel_min = _hz_to_mel_kaldi(min_frequency)
    mel_max = _hz_to_mel_kaldi(max_frequency)
    mel_freqs = np.linspace(mel_min, mel_max, num_mel_filters + 2)

    # FFT bin center frequencies, converted to mel (triangularize in mel space).
    fft_bin_width = sampling_rate / ((num_frequency_bins - 1) * 2)
    fft_freqs = _hz_to_mel_kaldi(fft_bin_width * np.arange(num_frequency_bins))

    fdiff = np.diff(mel_freqs)
    ramps = mel_freqs.reshape(-1, 1) - fft_freqs.reshape(1, -1)
    down_slopes = -ramps[:-2] / fdiff[:-1].reshape(-1, 1)
    up_slopes = ramps[2:] / fdiff[1:].reshape(-1, 1)
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))
    return fb.T


@dataclasses.dataclass(frozen=True)
class LogMelConfig:
    sampling_rate: int = 16000
    num_mel_bins: int = 80
    frame_length: int = 400  # 25 ms
    hop_length: int = 160  # 10 ms
    fft_length: int = 512
    preemphasis: float = 0.97
    remove_dc_offset: bool = True
    mel_floor: float = 1.192092955078125e-07  # 2**-23, HF Speech2Text default
    min_frequency: float = 20.0
    # CMVN. norm_type mirrors CustomFeatureExtractor: "utterance" | "global" | "none"
    norm_type: str = "utterance"
    normalize_means: bool = True
    normalize_vars: bool = True
    # Kaldi compliance: HF multiplies the waveform by 2**15 before framing.
    waveform_scale: float = 32768.0
    compute_dtype: jnp.dtype = jnp.float32
    # TPU matmul passes for the DFT/mel matmuls: "highest" = full fp32
    # (6 bf16 passes; bit-parity with the golden features), "high" = 3 passes
    # (~1e-6 relative feature error; ~2x faster front end for serving).
    matmul_precision: str = "highest"

    @property
    def num_frequency_bins(self) -> int:
        return self.fft_length // 2 + 1

    def num_frames(self, num_samples) -> jnp.ndarray:
        """1 + floor((S - frame_length) / hop) — center=False framing."""
        return 1 + (num_samples - self.frame_length) // self.hop_length


def _dft_bases(cfg: LogMelConfig) -> Tuple[np.ndarray, np.ndarray]:
    """Real-DFT bases with zero-padding to fft_length folded in.

    X[k] = sum_{n<frame_length} x[n] * exp(-2πi k n / fft_length), so the
    power spectrum is (x @ C)**2 + (x @ S)**2 with C/S of shape
    (frame_length, num_bins). Two MXU matmuls replace the FFT.
    """
    n = np.arange(cfg.frame_length, dtype=np.float64).reshape(-1, 1)
    k = np.arange(cfg.num_frequency_bins, dtype=np.float64).reshape(1, -1)
    ang = 2.0 * np.pi * n * k / cfg.fft_length
    return np.cos(ang), -np.sin(ang)


class LogMelFrontEnd:
    """Batched, jit-compilable log-mel extractor.

    Usage:
        fe = LogMelFrontEnd(LogMelConfig())
        feats, feat_lens = fe(waveforms, lengths)   # (B,S),(B,) -> (B,T,80),(B,)
    """

    def __init__(
        self,
        config: LogMelConfig = LogMelConfig(),
        global_means: Optional[np.ndarray] = None,
        global_stds: Optional[np.ndarray] = None,
    ):
        self.config = config
        cfg = config
        window = povey_window(cfg.frame_length)
        cos_b, sin_b = _dft_bases(cfg)
        # Fold the window into the DFT bases: (w*x) @ C == x @ (diag(w) C).
        dtype = cfg.compute_dtype
        self._cos = np.asarray(window[:, None] * cos_b, dtype=dtype)
        self._sin = np.asarray(window[:, None] * sin_b, dtype=dtype)
        self._mel = np.asarray(
            kaldi_mel_filter_bank(
                num_frequency_bins=cfg.num_frequency_bins,
                num_mel_filters=cfg.num_mel_bins,
                min_frequency=cfg.min_frequency,
                max_frequency=cfg.sampling_rate / 2,
                sampling_rate=cfg.sampling_rate,
            ),
            dtype=dtype,
        )
        if cfg.norm_type == "global":
            if global_means is None or global_stds is None:
                raise ValueError("norm_type='global' requires global_means/global_stds")
            self._gmeans = np.asarray(global_means, dtype=dtype)
            self._gstds = np.asarray(global_stds, dtype=dtype)
        else:
            self._gmeans = self._gstds = None

    def output_length(self, num_samples):
        return self.config.num_frames(num_samples)

    def __call__(
        self, waveforms: jnp.ndarray, lengths: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """waveforms: (B, S) float in [-1, 1]; lengths: (B,) int samples.

        Returns (features (B, T, num_mel) float32, feat_lengths (B,) int32).
        Padding frames are zeroed.
        """
        cfg = self.config
        if waveforms.ndim == 1:
            waveforms = waveforms[None]
        B, S = waveforms.shape
        if lengths is None:
            lengths = jnp.full((B,), S, dtype=jnp.int32)
        x = waveforms.astype(cfg.compute_dtype) * cfg.waveform_scale

        num_frames = int(cfg.num_frames(S))
        # Frame gather: (B, T, frame_length)
        starts = np.arange(num_frames) * cfg.hop_length
        idx = starts[:, None] + np.arange(cfg.frame_length)[None, :]
        frames = x[:, idx]

        if cfg.remove_dc_offset:
            frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
        if cfg.preemphasis:
            first = frames[..., :1] * (1.0 - cfg.preemphasis)
            rest = frames[..., 1:] - cfg.preemphasis * frames[..., :-1]
            frames = jnp.concatenate([first, rest], axis=-1)

        # Windowed real DFT as two MXU matmuls (window folded into bases).
        # Precision.HIGHEST: TPU f32 matmuls otherwise run as bf16 passes,
        # which is far too coarse for near-silent spectral bins under log().
        # "high" (3-pass) keeps ~19 mantissa bits — ample for serving.
        hi = (
            jax.lax.Precision.HIGHEST
            if cfg.matmul_precision == "highest"
            else jax.lax.Precision.HIGH
        )
        re = jnp.einsum("btn,nk->btk", frames, self._cos,
                        preferred_element_type=jnp.float32, precision=hi)
        im = jnp.einsum("btn,nk->btk", frames, self._sin,
                        preferred_element_type=jnp.float32, precision=hi)
        power = re * re + im * im

        mel = jnp.einsum("btk,km->btm", power, self._mel,
                         preferred_element_type=jnp.float32, precision=hi)
        log_mel = jnp.log(jnp.maximum(mel, cfg.mel_floor))

        feat_lengths = cfg.num_frames(lengths).astype(jnp.int32)
        feat_lengths = jnp.clip(feat_lengths, 0, num_frames)
        mask = (
            jnp.arange(num_frames, dtype=jnp.int32)[None, :] < feat_lengths[:, None]
        )

        log_mel = self._normalize(log_mel, mask)
        return jnp.where(mask[..., None], log_mel, 0.0), feat_lengths

    def _normalize(self, feats: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        if cfg.norm_type == "utterance":
            m = mask[..., None].astype(feats.dtype)
            count = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
            if cfg.normalize_means:
                mean = jnp.sum(feats * m, axis=1, keepdims=True) / count
                feats = feats - mean
            if cfg.normalize_vars:
                var = jnp.sum(jnp.square(feats) * m, axis=1, keepdims=True) / count
                if not cfg.normalize_means:
                    mean = jnp.sum(feats * m, axis=1, keepdims=True) / count
                    var = var - jnp.square(mean)
                feats = feats / jnp.sqrt(var + 0.0)
        elif cfg.norm_type == "global":
            feats = (feats - self._gmeans) / self._gstds
        return feats


def compute_global_stats(
    frontend: LogMelFrontEnd, batches
) -> Tuple[np.ndarray, np.ndarray]:
    """Streaming per-mel-bin mean/std over batches of (waveforms, lengths).

    TPU equivalent of the reference's compute_dataset_statistics.py:12-24
    (global CMVN stats). `frontend` should have norm_type='none'.
    """
    total = np.zeros(frontend.config.num_mel_bins, dtype=np.float64)
    total_sq = np.zeros_like(total)
    count = 0.0
    for waveforms, lengths in batches:
        feats, feat_lens = jax.jit(frontend.__call__)(waveforms, lengths)
        feats = np.asarray(feats, dtype=np.float64)
        mask = np.arange(feats.shape[1])[None, :] < np.asarray(feat_lens)[:, None]
        total += (feats * mask[..., None]).sum(axis=(0, 1))
        total_sq += (np.square(feats) * mask[..., None]).sum(axis=(0, 1))
        count += mask.sum()
    mean = total / count
    std = np.sqrt(total_sq / count - np.square(mean))
    return mean, std
