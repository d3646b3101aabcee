"""Fused waveform → log-mel Pallas TPU kernel.

The XLA front end (ops/features.py) materializes the (B, T, 400) frame
tensor in HBM (~205 MB at B=128×10 s), runs several elementwise passes over
it (DC removal, pre-emphasis) and a lane-hostile DFT (N=257 pads to 384).
This kernel streams the waveform HBM→VMEM and computes everything in one
pass with MXU-friendly tiles:

  * Frame construction WITHOUT a gather: the waveform is viewed as hop-rows
    (r, 160); frame r spans rows r..r+2, so the frame matmul decomposes into
    3 partial matmuls against hop-row bands of the bases — each ONE
    (n_rows, hop) @ (hop, 512) dot over ALL frames (band j's operand is a
    sublane-offset read, which Mosaic lowers to a cheap rotate; the
    frame-blocked formulation with 24 small dots per program was 5x
    slower). Waveforms can be passed pre-reshaped as (B, rows, hop) —
    ``rows_alloc`` — which removes the XLA pad+reshape relayout (~half the
    front-end runtime at B=128); a (B, S) input is reshaped on device.
  * cos and sin bases are CONCATENATED along the output axis and the
    all-zero Nyquist bin is dropped (the Kaldi mel bank's last triangle
    ends exactly at f_max, weight 0 — asserted offline), so each DFT matmul
    is (F, 160) @ (160, 512): the output axis is lane-exact.
  * DC removal, pre-emphasis and the scalar waveform scale are LINEAR
    per-frame operators folded into the windowed DFT bases offline:
        bases' = scale * (M^T @ diag(w) @ [C | S]),  M = P @ D
    (P = bidiagonal pre-emphasis, D = DC removal). The kernel then does
    the banded DFT matmul, square-add over the two lane halves, one
    (256→80) mel matmul, and log.
  * ``matmul_precision="highest"`` uses the MXU 6-pass fp32 decomposition
    (Mosaic's only fp32 dot mode). ``"high"`` implements the 3-pass
    decomposition MANUALLY for the DFT (hi/lo bf16 split of both operands,
    dropping the lo·lo term) — Mosaic has no HIGH dot primitive; accuracy
    ~1e-5 relative on DFT coefficients. The tiny mel matmul always runs
    HIGHEST (it is positive and well-conditioned, and costs ~5% of the DFT).
  * CMVN stays in XLA (one cheap pass; it needs full-utterance statistics).

Grid: (B,); each utterance's three shifted hop-row views are per-batch VMEM
blocks (<=0.7 MB each at 10 s); frame blocks are an unrolled in-kernel loop.

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


def folded_bases(cfg: LogMelConfig) -> Tuple[np.ndarray, np.ndarray]:
    """(dft', mel') with window, scale, DC-removal and pre-emphasis folded in.

    dft' is (frame_length, 2*(bins-1)): [cos | sin] with the all-zero-mel
    Nyquist bin dropped; mel' is (bins-1, num_mel).
    """
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
    if np.abs(mel[-1]).max() != 0.0:  # pragma: no cover - standard configs only
        raise NotImplementedError(
            "PallasLogMelFrontEnd requires a zero-weight Nyquist mel row"
        )
    dft = np.concatenate([M.T @ wc[:, :-1], M.T @ ws[:, :-1]], axis=1)
    return (
        (dft * np.float32(cfg.waveform_scale)).astype(np.float32),
        mel[:-1].astype(np.float32),
    )


def _split_hi_lo(a: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    hi = np.asarray(jnp.asarray(a, jnp.float32).astype(jnp.bfloat16))
    lo = np.asarray(
        jnp.asarray(a - hi.astype(np.float32), jnp.float32).astype(jnp.bfloat16)
    )
    return hi, lo


def _mel_kernel(rows_ref, dft_ref, mel_ref, *rest,
                n_rows, n_bands, nbins, floor, mode,
                fuse_cmvn=False, norm_means=True, norm_vars=True):
    if fuse_cmvn:
        len_ref, o_ref = rest
    else:
        (o_ref,) = rest
    HI = jax.lax.Precision.HIGHEST

    # One program per batch item. Each band is ONE (n_rows, hop)@(hop, 2N)
    # matmul — frame r's contribution from hop-row r+j — so the MXU sees
    # M=1024 dots instead of 24 tiny per-block ones. Band j's operand is a
    # sublane-shifted read (offset j): Mosaic lowers this to a sublane
    # rotate, far cheaper than the lane-relayout an XLA pre-shift costs.
    coef = None
    for j in range(n_bands):
        v = rows_ref[0, j : j + n_rows, :]                  # (n_rows, hop)
        if mode == "highest":
            part = jax.lax.dot_general(
                v, dft_ref[0, j], (((1,), (0,)), ((), ())),
                precision=HI, preferred_element_type=jnp.float32,
            )
        elif mode == "bf16":
            # single bf16 pass (hi operands only): DFT coefficient error
            # ~2^-8 relative — shippable for serving only behind a
            # transcript-parity gate (validation/fused_mode_check.py).
            part = jax.lax.dot_general(
                v.astype(jnp.bfloat16), dft_ref[0, j],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            # manual 3-pass fp32: (hi+lo) @ (hi+lo) minus the lo·lo term
            v_hi = v.astype(jnp.bfloat16)
            v_lo = (v - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            dims = (((1,), (0,)), ((), ()))
            part = (
                jax.lax.dot_general(
                    v_hi, dft_ref[0, j], dims,
                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    v_hi, dft_ref[1, j], dims,
                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    v_lo, dft_ref[0, j], dims,
                    preferred_element_type=jnp.float32)
            )
        coef = part if coef is None else coef + part
    power = coef[:, :nbins] ** 2 + coef[:, nbins:] ** 2
    mel = jax.lax.dot_general(
        power, mel_ref[...], (((1,), (0,)), ((), ())),
        precision=HI, preferred_element_type=jnp.float32,
    )
    lm = jnp.log(jnp.maximum(mel, floor))
    if fuse_cmvn:
        # Utterance CMVN + length masking IN-KERNEL (the whole utterance is
        # already VMEM-resident), replicating LogMelFrontEnd._normalize's
        # fp32 op order; output rounds once to the out dtype (bf16 on the
        # fused serving path — exactly the cast the subsampler's im2col
        # applies anyway, so no precision is lost vs the unfused pipeline).
        n = len_ref[0, 0, 0]
        row = jax.lax.broadcasted_iota(jnp.int32, lm.shape, 0)
        m = (row < n).astype(jnp.float32)
        count = jnp.maximum(n.astype(jnp.float32), 1.0)
        if norm_means:
            mean = jnp.sum(lm * m, axis=0, keepdims=True) / count
            lm = lm - mean
        if norm_vars:
            var = jnp.sum(jnp.square(lm) * m, axis=0, keepdims=True) / count
            if not norm_means:
                mean = jnp.sum(lm * m, axis=0, keepdims=True) / count
                var = var - jnp.square(mean)
            lm = lm / jnp.sqrt(var)
        lm = jnp.where(row < n, lm, 0.0)
    o_ref[0, :, :] = lm.astype(o_ref.dtype)


class PallasLogMelFrontEnd:
    """Drop-in replacement for LogMelFrontEnd (non-global-CMVN configs).

    Computes identical features to ops/features.py (the DC/pre-emphasis fold
    is exact in exact arithmetic; fp differences are ~1e-5 relative).
    """

    def __init__(
        self,
        config: LogMelConfig = LogMelConfig(),
        interpret: bool = False,
        fused_cmvn_bf16: bool = False,
    ):
        """``fused_cmvn_bf16=True`` computes utterance CMVN + length masking
        inside the kernel and emits bf16 — the serving/bench configuration:
        it removes ~5 XLA passes over the (B, T, 80) f32 features, and the
        bf16 rounding is exactly the cast the fused subsampler's im2col
        applies to its input anyway."""
        if config.norm_type == "global":
            raise NotImplementedError("use LogMelFrontEnd for global CMVN")
        if config.matmul_precision not in ("highest", "high", "bf16"):
            raise NotImplementedError(
                "PallasLogMelFrontEnd supports matmul_precision in "
                "{'highest', 'high', 'bf16'}"
            )
        self.fused_cmvn = fused_cmvn_bf16
        self.config = config
        self.interpret = interpret
        self._mode = config.matmul_precision
        dft, mel = folded_bases(config)

        hop, L = config.hop_length, config.frame_length
        nb = -(-L // hop)
        self._n_bands = nb
        # split the (frame_len, 2*nbins) bases into per-band row blocks padded
        # to a full hop of rows: (nb, hop, 2*nbins)
        dft_b = np.zeros((nb, hop, dft.shape[1]), np.float32)
        for j in range(nb):
            rows = dft[j * hop : min((j + 1) * hop, L)]
            dft_b[j, : rows.shape[0]] = rows
        if self._mode == "highest":
            self._dft = jnp.asarray(dft_b[None])          # (1, nb, hop, 2N) f32
        elif self._mode == "bf16":
            hi, _ = _split_hi_lo(dft_b)
            self._dft = jnp.asarray(hi[None])             # (1, nb, hop, 2N) bf16
        else:
            hi, lo = _split_hi_lo(dft_b)
            self._dft = jnp.asarray(np.stack([hi, lo]))   # (2, nb, hop, 2N) bf16
        self._mel = jnp.asarray(mel)
        self._nbins = mel.shape[0]

    def output_length(self, num_samples):
        return self.config.num_frames(num_samples)

    def rows_alloc(self, num_samples: int) -> int:
        """Hop-row count of the preferred 3-D input layout for utterances of
        ``num_samples``: pass waveforms as (B, rows_alloc, hop_length) —
        e.g. a free ``np.reshape`` of the zero-padded host buffer — and the
        XLA pad+reshape relayout (~half the front end's runtime at B=128)
        disappears entirely."""
        F = FRAMES_PER_BLOCK
        num_frames = int(self.config.num_frames(num_samples))
        n_rows = -(-num_frames // F) * F
        return -(-(n_rows + self._n_bands - 1) // 8) * 8

    def __call__(
        self,
        waveforms: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
        num_samples: Optional[int] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        if waveforms.ndim == 1:
            waveforms = waveforms[None]
        hop = cfg.hop_length
        if waveforms.ndim == 3:
            # Preferred layout: (B, rows, hop) hop-row view, zero-padded to
            # >= rows_alloc(num_samples) rows (see ``rows_alloc``).
            B, rows, hop_in = waveforms.shape
            if hop_in != hop:
                raise ValueError(f"hop-row layout must have last dim {hop}")
            if lengths is None or num_samples is None:
                raise ValueError(
                    "hop-row layout requires explicit lengths and num_samples"
                )
            S = int(num_samples)
        else:
            B, S = waveforms.shape
            if lengths is None:
                lengths = jnp.full((B,), S, dtype=jnp.int32)

        F = FRAMES_PER_BLOCK
        num_frames = int(cfg.num_frames(S))
        FB = -(-num_frames // F)
        n_rows = FB * F
        # Hop-row view (one aligned XLA reshape); +pad rows so band j can
        # read rows [j, j + n_rows).
        rows_alloc = -(-(n_rows + self._n_bands - 1) // 8) * 8
        if waveforms.ndim == 3:
            if waveforms.shape[1] < rows_alloc:
                waveforms = jnp.pad(
                    waveforms,
                    ((0, 0), (0, rows_alloc - waveforms.shape[1]), (0, 0)),
                )
            wf = waveforms[:, :rows_alloc].astype(jnp.float32)
        else:
            S_need = rows_alloc * hop
            if S_need > S:
                waveforms = jnp.pad(waveforms, ((0, 0), (0, S_need - S)))
            elif S_need < S:
                waveforms = waveforms[:, :S_need]
            wf = waveforms.astype(jnp.float32).reshape(B, rows_alloc, hop)

        feat_lengths = cfg.num_frames(lengths).astype(jnp.int32)
        feat_lengths = jnp.clip(feat_lengths, 0, num_frames)

        fuse = self.fused_cmvn and cfg.norm_type == "utterance"
        in_specs = [
            pl.BlockSpec((1, rows_alloc, hop), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(self._dft.shape, lambda b: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(self._mel.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = [wf, self._dft, self._mel]
        if fuse:
            # (B, 1, 1) with (1, 1, 1) blocks: Mosaic requires the last two
            # block dims to equal the array dims (or be (8, 128)-tiled).
            in_specs.append(
                pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
            )
            operands.append(feat_lengths.reshape(B, 1, 1))

        out = pl.pallas_call(
            partial(
                _mel_kernel, n_rows=n_rows, n_bands=self._n_bands,
                nbins=self._nbins,
                floor=np.float32(cfg.mel_floor), mode=self._mode,
                fuse_cmvn=fuse, norm_means=cfg.normalize_means,
                norm_vars=cfg.normalize_vars,
            ),
            grid=(B,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, FB * F, cfg.num_mel_bins), lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (B, FB * F, cfg.num_mel_bins),
                jnp.bfloat16 if fuse else jnp.float32,
            ),
            interpret=self.interpret,
        )(*operands)

        log_mel = out[:, :num_frames]
        if fuse:
            # CMVN + masking already applied in-kernel (bf16 output; rows
            # >= feat_lengths are exact zeros).
            return log_mel, feat_lengths
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
