"""Serving: ASR pipeline + inference-endpoint handler.

TPU-native counterpart of the reference's hub serving path (reference:
src/reguler/handler.py:8-40 wraps HF ``pipeline("automatic-speech-recognition")``
around the DeCRED model). Here the pipeline is a self-contained object over
our checkpoints: waveform(s) → fused log-mel → CTC greedy (encoder models) or
joint CTC/attention beam search (AED models) → text. Inputs are bucketed to a
small set of padded lengths so repeated calls hit the jit cache instead of
recompiling.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

logger = logging.getLogger(__name__)


class ASRPipeline:
    def __init__(
        self,
        model_dir: str,
        tokenizer_dir: Optional[str] = None,
        model_type: str = "aed",  # aed | ctc
        ctc_weight: float = 0.3,
        num_beams: int = 5,
        max_length: int = 128,
        dtype: str = "bfloat16",
        length_buckets: Sequence[float] = (2.0, 5.0, 10.0, 20.0, 30.0),
        sampling_rate: int = 16000,
        fused_encoder: Union[bool, str] = "auto",
    ):
        import jax
        import jax.numpy as jnp

        from huggingface_asr_tpu.cli.common import load_tokenizer, tokenizer_ids
        from huggingface_asr_tpu.decoding.beam_search import BeamSearchConfig
        from huggingface_asr_tpu.decoding.generate import generate_joint
        from huggingface_asr_tpu.models.configs import EBranchformerConfig, parse_dtype
        from huggingface_asr_tpu.models.ebranchformer import EBranchformerForCTC
        from huggingface_asr_tpu.models.joint_ctc_aed import (
            JointCTCAttentionConfig,
            JointCTCAttentionEncoderDecoder,
        )
        from huggingface_asr_tpu.ops.ctc import ctc_greedy_decode
        from huggingface_asr_tpu.ops.features import LogMelConfig, LogMelFrontEnd
        from huggingface_asr_tpu.training.model_factory import load_config, load_params

        self.sampling_rate = sampling_rate
        self.length_buckets = sorted(length_buckets)
        self.tokenizer = load_tokenizer(tokenizer_dir or model_dir)
        ids = tokenizer_ids(self.tokenizer)
        self.model_type = model_type
        dt = parse_dtype(dtype)

        if model_type == "ctc":
            config = load_config(model_dir, EBranchformerConfig)
            self.params = load_params(model_dir)
            model = EBranchformerForCTC(config, dtype=dt)
            frontend = LogMelFrontEnd(LogMelConfig(num_mel_bins=config.num_fbanks))

            # Fused Pallas encoder (ops/pallas_layer.py): serving-grade speed
            # on TPU; "auto" uses it when the model/backend/dtype qualify.
            # The kernel computes in bf16 and folds macaron-FF weights, so
            # fp32 or non-macaron configs take the XLA path.
            from huggingface_asr_tpu.models.fast_infer import fused_encoder_ok

            fused_ok = fused_encoder_ok(config, dt)
            use_fused = fused_encoder
            fused_interpret = use_fused == "interpret"  # test-only: CPU interpreter
            if fused_interpret:
                use_fused = True
            if use_fused == "auto":
                use_fused = jax.default_backend() == "tpu" and fused_ok
            elif use_fused and not fused_ok:
                raise ValueError(
                    "fused_encoder=True but the model config/dtype is outside "
                    "the fused kernel's support (needs relative positions, "
                    "non-causal, macaron FF, bfloat16, no fine-tune adapters)"
                )
            self._use_fused = bool(use_fused)
            if use_fused:
                from huggingface_asr_tpu.models.fast_infer import ctc_infer_fused

                # Pallas mel front end on the fused path (same features to
                # ~1e-5 rel — ops/pallas_features.py folds DC-removal and
                # pre-emphasis into the windowed DFT bases); interpret-mode
                # tests keep the XLA front end (identical numerics contract).
                if not fused_interpret:
                    from huggingface_asr_tpu.ops.pallas_features import (
                        PallasLogMelFrontEnd,
                    )
                    from huggingface_asr_tpu.ops.pallas_layer import (
                        set_numeric_profile,
                    )

                    # Serving numeric profile + single-pass bf16 DFT with
                    # in-kernel CMVN/bf16. Transcript-gated: byte-identical
                    # to the bitexact chain (itself 64/64 identical to the
                    # torch reference) on the trained WER-parity checkpoint
                    # — validation/fused_mode_check.py, results in
                    # validation/fused_mode_report.json.
                    set_numeric_profile("serving")
                    frontend = PallasLogMelFrontEnd(
                        LogMelConfig(
                            num_mel_bins=config.num_fbanks,
                            matmul_precision="bf16",
                        ),
                        fused_cmvn_bf16=True,
                    )

                # bb (batch rows per kernel program) is picked per padded
                # batch size in __call__; jit caches one program per (B, bb).
                @partial(jax.jit, static_argnums=(3,))
                def run(params, wav, wav_lens, bb):
                    feats, lens = frontend(wav, wav_lens)
                    out = ctc_infer_fused(
                        params, config, feats, lens, bb=bb,
                        interpret=fused_interpret,
                    )
                    return ctc_greedy_decode(
                        out.logits, out.logit_lengths, blank_id=-1
                    )
            else:

                @partial(jax.jit, static_argnums=(3,))
                def run(params, wav, wav_lens, bb):
                    feats, lens = frontend(wav, wav_lens)
                    out = model.apply(
                        {"params": params}, feats, lens, deterministic=True
                    )
                    return ctc_greedy_decode(
                        out.logits, out.logit_lengths, blank_id=-1
                    )

            self._run = run
        else:
            config = load_config(model_dir, JointCTCAttentionConfig)
            self.params = load_params(model_dir)
            model = JointCTCAttentionEncoderDecoder(config, dtype=dt)
            frontend = LogMelFrontEnd(
                LogMelConfig(num_mel_bins=config.encoder.num_fbanks)
            )
            gen_cfg = BeamSearchConfig(
                num_beams=num_beams,
                max_length=max_length,
                ctc_weight=ctc_weight,
                bos_token_id=ids["bos"],
                eos_token_id=ids["eos"],
                pad_token_id=ids["pad"],
            )

            @jax.jit
            def run(params, wav, wav_lens):
                feats, lens = frontend(wav, wav_lens)
                seqs, scores = generate_joint(model, params, feats, lens, gen_cfg)
                return seqs, scores

            self._run = run
            self._use_fused = False

    def _bucket_pad(self, audios: List[np.ndarray]) -> np.ndarray:
        max_len = max(len(a) for a in audios)
        for sec in self.length_buckets:
            cap = int(sec * self.sampling_rate)
            if max_len <= cap:
                max_len = cap
                break
        out = np.zeros((len(audios), max_len), np.float32)
        for i, a in enumerate(audios):
            out[i, : len(a)] = a[:max_len]
        return out

    def __call__(
        self, inputs: Union[np.ndarray, Sequence[np.ndarray], Dict]
    ) -> Union[str, List[str]]:
        import jax

        single = False
        if isinstance(inputs, dict):
            inputs = inputs.get("array", inputs.get("inputs"))
        if isinstance(inputs, np.ndarray) and inputs.ndim == 1:
            inputs, single = [inputs], True
        audios = [np.asarray(a, np.float32) for a in inputs]
        wav = self._bucket_pad(audios)
        lens = np.asarray([len(a) for a in audios], np.int32)
        n_real = len(audios)

        if self.model_type == "ctc":
            from huggingface_asr_tpu.ops.ctc import tokens_to_lists

            # Pick the fused kernel's batch blocking from the actual batch:
            # pad B up to a multiple of 4/8 (zero rows decode to empty and
            # are dropped) instead of forfeiting batch blocking at bb=1.
            bb = 1
            if self._use_fused and n_real > 1:
                b_pad = 4 * -(-n_real // 4) if n_real <= 4 else 8 * -(-n_real // 8)
                if b_pad != n_real:
                    wav = np.concatenate(
                        [wav, np.zeros((b_pad - n_real, wav.shape[1]), np.float32)]
                    )
                    lens = np.concatenate(
                        [lens, np.zeros((b_pad - n_real,), np.int32)]
                    )
                bb = min(8, b_pad)
            toks, tlens = jax.device_get(self._run(self.params, wav, lens, bb))
            toks, tlens = toks[:n_real], tlens[:n_real]
            texts = [
                self.tokenizer.decode(t, skip_special_tokens=True)
                for t in tokens_to_lists(toks, tlens)
            ]
        else:
            seqs, _ = jax.device_get(self._run(self.params, wav, lens))
            texts = [
                self.tokenizer.decode([int(t) for t in row[0]], skip_special_tokens=True)
                for row in seqs
            ]
        return texts[0] if single else texts


class EndpointHandler:
    """Inference-endpoint adapter (reference handler.py:8-40 interface)."""

    def __init__(self, path: str = "", **kwargs):
        self.pipeline = ASRPipeline(path, **kwargs)

    def __call__(self, data: Dict) -> Dict:
        inputs = data.get("inputs", data)
        if isinstance(inputs, dict) and "array" in inputs:
            inputs = np.asarray(inputs["array"], np.float32)
        text = self.pipeline(inputs)
        return {"text": text}
