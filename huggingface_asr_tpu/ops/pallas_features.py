"""Fused waveform → log-mel Pallas TPU kernel.

The XLA front end (ops/features.py) materializes the (B, T, 400) frame
tensor in HBM (~205 MB at B=128×10 s) and runs the fp32 DFT at HIGHEST
precision — ~11.5 ms of the serving batch. This kernel streams the waveform
HBM→VMEM in overlapping frame blocks and computes everything in one pass:

  * Frame construction WITHOUT a gather or concat: the block's samples are
    viewed as hop-rows (r, 160); frame r spans rows r..r+2, so the frame
    matmul decomposes into 3 partial matmuls against hop-row bands of the
    bases (zero-padded so the trailing band ignores out-of-frame samples).
  * DC removal and pre-emphasis are LINEAR per-frame operators, so they are
    folded into the windowed DFT bases offline:
        bases' = (I - 11^T/400) @ P @ diag(w) @ [C | S]
    (P = bidiagonal pre-emphasis). The kernel then does exactly two fp32
    matmuls (cos/sin), square-add, one (257→80) mel matmul, and log.
  * CMVN stays in XLA (one cheap pass; it needs full-utterance statistics).

Grid: (B, ceil(T/128)); the utterance's hop-rows are one per-batch VMEM
block (<=1 MB at 10 s) sliced per frame block — the BlockSpec pipeline does
the HBM->VMEM staging.

Reference behavior: HF Speech2TextFeatureExtractor as wrapped by the
reference's CustomFeatureExtractor (src/utilities/feature_extractors.py:14-61);
numerics identical to ops/features.py by construction (linear-operator fold).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from huggingface_asr_tpu.ops.features import (
    LogMelConfig,
    _dft_bases,
    kaldi_mel_filter_bank,
    povey_window,
)

FRAMES_PER_BLOCK = 128


def folded_bases(cfg: LogMelConfig) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(cos', sin', mel) with window, DC-removal and pre-emphasis folded in."""
    L = cfg.frame_length
    cos_b, sin_b = _dft_bases(cfg)
    w = povey_window(L)
    wc = w[:, None] * cos_b
    ws = w[:, None] * sin_b
    # pre-emphasis: pre[0] = (1-p)*x[0]; pre[n] = x[n] - p*x[n-1]
    p = cfg.preemphasis
    P = np.eye(L)
    if p:
        P[0, 0] = 1.0 - p
        for n in range(1, L):
            P[n, n - 1] = -p
    # DC removal BEFORE pre-emphasis (matches ops/features.py order)
    D = np.eye(L) - np.full((L, L), 1.0 / L) if cfg.remove_dc_offset else np.eye(L)
    M = (P @ D) if cfg.remove_dc_offset or p else np.eye(L)
    mel = kaldi_mel_filter_bank(
        num_frequency_bins=cfg.num_frequency_bins,
        num_mel_filters=cfg.num_mel_bins,
        min_frequency=cfg.min_frequency,
        max_frequency=cfg.sampling_rate / 2,
        sampling_rate=cfg.sampling_rate,
    )
    return (
        (M.T @ wc).astype(np.float32),
        (M.T @ ws).astype(np.float32),
        mel.astype(np.float32),
    )


def _mel_kernel(wav_ref, cos_ref, sin_ref, mel_ref, o_ref,
                *, hop, n_bands, rows, n_blocks, scale, floor, precision):
    F = FRAMES_PER_BLOCK
    hi = (
        jax.lax.Precision.HIGHEST
        if precision == "highest"
        else jax.lax.Precision.HIGH
    )

    # One program per batch item; all frame blocks computed in an unrolled
    # loop (a separate grid dimension left each program too small — the
    # per-program overhead dominated the matmuls).
    for fb in range(n_blocks):
        v = wav_ref[0, fb * F : fb * F + rows, :] * scale   # (rows, hop)

        # Frame r spans hop-rows r..r+n_bands-1, so frames @ bases decomposes
        # into n_bands partial matmuls against row-bands of the bases — no
        # concat (Mosaic can't concat mismatched sublane offsets); the zero
        # rows padding the last band nullify out-of-frame samples.
        def dft(b_ref):
            acc = None
            for j in range(n_bands):
                part = jax.lax.dot_general(
                    v[j : F + j], b_ref[j], (((1,), (0,)), ((), ())),
                    precision=hi, preferred_element_type=jnp.float32,
                )
                acc = part if acc is None else acc + part
            return acc

        power = dft(cos_ref) ** 2 + dft(sin_ref) ** 2
        mel = jax.lax.dot_general(
            power, mel_ref[...], (((1,), (0,)), ((), ())),
            precision=hi, preferred_element_type=jnp.float32,
        )
        o_ref[0, fb * F : (fb + 1) * F, :] = jnp.log(jnp.maximum(mel, floor))


class PallasLogMelFrontEnd:
    """Drop-in replacement for LogMelFrontEnd (non-global-CMVN configs).

    Computes identical features to ops/features.py (the DC/pre-emphasis fold
    is exact in exact arithmetic; fp differences are ~1e-5 relative).
    """

    def __init__(self, config: LogMelConfig = LogMelConfig(), interpret: bool = False):
        if config.norm_type == "global":
            raise NotImplementedError("use LogMelFrontEnd for global CMVN")
        self.config = config
        self.interpret = interpret
        cosb, sinb, mel = folded_bases(config)

        # split the (frame_len, bins) bases into hop-row bands padded to a
        # full hop of rows: (n_bands, hop, bins) — see _mel_kernel.
        hop, L = config.hop_length, config.frame_length
        nb = -(-L // hop)
        def band(b):
            out = np.zeros((nb, hop, b.shape[1]), np.float32)
            for j in range(nb):
                rows = b[j * hop : min((j + 1) * hop, L)]
                out[j, : rows.shape[0]] = rows
            return out

        self._n_bands = nb
        self._cos = jnp.asarray(band(cosb))
        self._sin = jnp.asarray(band(sinb))
        self._mel = jnp.asarray(mel)

    def output_length(self, num_samples):
        return self.config.num_frames(num_samples)

    def __call__(
        self, waveforms: jnp.ndarray, lengths: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        if waveforms.ndim == 1:
            waveforms = waveforms[None]
        B, S = waveforms.shape
        if lengths is None:
            lengths = jnp.full((B,), S, dtype=jnp.int32)

        F = FRAMES_PER_BLOCK
        hop, L = cfg.hop_length, cfg.frame_length
        num_frames = int(cfg.num_frames(S))
        FB = -(-num_frames // F)
        block_samples = (F - 1) * hop + L                  # 20,720 @ defaults
        rows = -(-block_samples // hop) + 1                # +1 spare row
        rows = -(-rows // 8) * 8                           # DMA slices need 8-aligned rows
        # pad so every block's `rows` hop-rows exist: last block starts at
        # hop-row (FB-1)*F and reads `rows` rows.
        n_rows = (FB - 1) * F + rows
        S_pad = n_rows * hop
        if S_pad > S:
            waveforms = jnp.pad(waveforms, ((0, 0), (0, S_pad - S)))
        elif S_pad < S:
            waveforms = waveforms[:, :S_pad]
        waveforms = waveforms.reshape(B, n_rows, hop)

        out = pl.pallas_call(
            partial(
                _mel_kernel, hop=hop, n_bands=self._n_bands, rows=rows,
                n_blocks=FB, scale=np.float32(cfg.waveform_scale),
                floor=np.float32(cfg.mel_floor),
                precision=cfg.matmul_precision,
            ),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, n_rows, hop), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(self._cos.shape, lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(self._sin.shape, lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(self._mel.shape, lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, FB * F, cfg.num_mel_bins), lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (B, FB * F, cfg.num_mel_bins), jnp.float32
            ),
            interpret=self.interpret,
        )(waveforms.astype(jnp.float32), self._cos, self._sin, self._mel)

        log_mel = out[:, :num_frames]
        feat_lengths = cfg.num_frames(lengths).astype(jnp.int32)
        feat_lengths = jnp.clip(feat_lengths, 0, num_frames)
        mask = (
            jnp.arange(num_frames, dtype=jnp.int32)[None, :]
            < feat_lengths[:, None]
        )
        # masked utterance CMVN (identical to LogMelFrontEnd._normalize)
        if cfg.norm_type == "utterance":
            m = mask[..., None].astype(jnp.float32)
            count = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
            if cfg.normalize_means:
                mean = jnp.sum(log_mel * m, axis=1, keepdims=True) / count
                log_mel = log_mel - mean
            if cfg.normalize_vars:
                var = jnp.sum(jnp.square(log_mel) * m, axis=1, keepdims=True) / count
                if not cfg.normalize_means:
                    mean = jnp.sum(log_mel * m, axis=1, keepdims=True) / count
                    var = var - jnp.square(mean)
                log_mel = log_mel / jnp.sqrt(var)
        return jnp.where(mask[..., None], log_mel, 0.0), feat_lengths
