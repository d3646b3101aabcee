"""Streaming recognition sessions for causal models.

The reference supports streaming via causal masking/convolutions
(reference: src/models/streaming_modules.py, e_branchformer.py:119-124 —
`is_causal=True` models) but ships no session API. This provides one: feed
audio chunks, get incremental transcription. Because the causal model's
frame t output provably never depends on frames > t (tested in
tests/test_ebranchformer.py::test_causal_streaming_property), re-running the
compiled forward over the accumulated (bucketed) prefix yields exactly the
final transcript prefix at each step; emitted tokens never retract.

The prefix is padded up to bucket lengths so the session cycles through a
small fixed set of compiled shapes.

NOTE: exact prefix stability additionally requires a streaming-safe
normalization — use a ``LogMelFrontEnd`` with ``norm_type="global"`` (fixed
per-bin stats). Per-utterance CMVN recomputes statistics over the growing
prefix, which perturbs earlier frames' features between feeds.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


class StreamingCTCSession:
    def __init__(
        self,
        model,
        params,
        frontend,
        tokenizer=None,
        sampling_rate: int = 16000,
        bucket_seconds: Sequence[float] = (2, 4, 8, 15, 22, 30),
    ):
        import jax

        assert model.config.is_causal, "streaming requires an is_causal model"
        self._model = model
        self._params = params
        self._frontend = frontend
        self._tokenizer = tokenizer
        self._sr = sampling_rate
        self._buckets = [int(s * sampling_rate) for s in bucket_seconds]
        self._audio = np.zeros(0, np.float32)

        from huggingface_asr_tpu.ops.ctc import ctc_greedy_decode

        @jax.jit
        def run(params, wav, length):
            feats, flens = frontend(wav, length)
            out = model.apply({"params": params}, feats, flens, deterministic=True)
            return ctc_greedy_decode(out.logits, out.logit_lengths, blank_id=-1)

        self._run = run

    def _bucketed(self, n: int) -> int:
        for b in self._buckets:
            if n <= b:
                return b
        return self._buckets[-1]

    def feed(self, chunk: np.ndarray) -> List[int]:
        """Append audio; return the CURRENT full token sequence."""
        import jax

        self._audio = np.concatenate([self._audio, np.asarray(chunk, np.float32)])
        n = min(len(self._audio), self._buckets[-1])
        padded = self._bucketed(n)
        wav = np.zeros((1, padded), np.float32)
        wav[0, :n] = self._audio[:n]
        toks, tlens = jax.device_get(
            self._run(self._params, wav, np.asarray([n], np.int32))
        )
        return [int(t) for t in toks[0, : int(tlens[0])]]

    def transcript(self, tokens: Optional[List[int]] = None) -> str:
        if tokens is None:
            tokens = self.feed(np.zeros(0, np.float32))
        if self._tokenizer is None:
            return " ".join(map(str, tokens))
        return self._tokenizer.decode(tokens, skip_special_tokens=True)

    def reset(self):
        self._audio = np.zeros(0, np.float32)


class StreamingJointSession:
    """Streaming joint CTC/attention decoding for causal AED models.

    Each ``feed`` re-runs the compiled encoder + joint beam search over the
    accumulated (bucketed) audio prefix: with a causal encoder the earlier
    frames' encodings are provably unchanged, so every feed returns exactly
    the full-decode result for the audio so far (streaming analogue of the
    reference's CTC scorer extension hooks, ctc_scorer.py:209-256; the
    incremental scorer itself is available as CTCPrefixScorer.extended /
    replay_state / extend_state for frame-synchronous integrations).
    """

    def __init__(
        self,
        model,
        params,
        frontend,
        gen_config,
        tokenizer=None,
        sampling_rate: int = 16000,
        bucket_seconds: Sequence[float] = (2, 4, 8, 15, 22, 30),
    ):
        import jax

        from huggingface_asr_tpu.decoding.generate import generate_joint

        assert model.config.encoder.is_causal, "streaming requires is_causal"
        self._params = params
        self._tokenizer = tokenizer
        self._sr = sampling_rate
        self._buckets = [int(s * sampling_rate) for s in bucket_seconds]
        self._audio = np.zeros(0, np.float32)
        self._gen_config = gen_config

        @jax.jit
        def run(params, wav, length):
            feats, flens = frontend(wav, length)
            return generate_joint(model, params, feats, flens, gen_config)

        self._run = run

    def _bucketed(self, n: int) -> int:
        for b in self._buckets:
            if n <= b:
                return b
        return self._buckets[-1]

    def feed(self, chunk: np.ndarray) -> List[int]:
        """Append audio; return the current BEST hypothesis token ids
        (bos/eos/pad stripped)."""
        import jax

        self._audio = np.concatenate([self._audio, np.asarray(chunk, np.float32)])
        n = min(len(self._audio), self._buckets[-1])
        padded = self._bucketed(n)
        wav = np.zeros((1, padded), np.float32)
        wav[0, :n] = self._audio[:n]
        seqs, _ = jax.device_get(
            self._run(self._params, wav, np.asarray([n], np.int32))
        )
        cfg = self._gen_config
        specials = {cfg.bos_token_id, cfg.eos_token_id, cfg.pad_token_id}
        return [int(t) for t in seqs[0, 0] if int(t) not in specials]

    def transcript(self, tokens: Optional[List[int]] = None) -> str:
        if tokens is None:
            tokens = self.feed(np.zeros(0, np.float32))
        assert self._tokenizer is not None
        return self._tokenizer.decode(tokens, skip_special_tokens=True)

    def reset(self):
        self._audio = np.zeros(0, np.float32)
