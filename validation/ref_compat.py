"""Version shim: run the torch reference's joint model under the INSTALLED
transformers (newer than the reference's 4.39 pin).

The reference overrides private generate() plumbing whose signatures moved
between transformers versions. This subclass adapts ONLY the plumbing
(argument passing); all scoring behavior — cached encoder logits, CTC
rescorer construction, beam mechanics — is the reference's own code
(/root/reference/src/models/ctc_encoder_plus_autoregressive_decoder.py).
"""

from __future__ import annotations

import sys

if "/root/reference/src" not in sys.path:
    sys.path.insert(0, "/root/reference/src")

from utilities.bind import bind_all  # noqa: E402

bind_all()

from transformers import SpeechEncoderDecoderModel  # noqa: E402

from models.ctc_encoder_plus_autoregressive_decoder import (  # noqa: E402
    JointCTCAttentionEncoderDecoder as RefJoint,
    JointCTCAttentionEncoderDecoderConfig as RefJointConfig,  # noqa: F401
)


class RefJointCompat(RefJoint):
    """Reference joint model with new-transformers plumbing signatures."""

    def _get_logits_processor(
        self, generation_config, input_ids_seq_length=None,
        encoder_input_ids=None, prefix_allowed_tokens_fn=None,
        logits_processor=None, device=None, model_kwargs=None,
        negative_prompt_ids=None, negative_prompt_attention_mask=None,
    ):
        # reference body (ctc_encoder_plus_autoregressive_decoder.py:360-404)
        # over the installed transformers' base implementation
        from transformers.generation.utils import GenerationMixin

        from decoding.ctc_scorer import (
            CTCRescorerLogitsProcessor,
            LogSoftmaxProcessor,
        )

        processors = GenerationMixin._get_logits_processor(
            self,
            generation_config,
            input_ids_seq_length=input_ids_seq_length,
            encoder_input_ids=encoder_input_ids,
            prefix_allowed_tokens_fn=prefix_allowed_tokens_fn,
            logits_processor=logits_processor,
            device=device,
            model_kwargs=model_kwargs,
            negative_prompt_ids=negative_prompt_ids,
            negative_prompt_attention_mask=negative_prompt_attention_mask,
        )
        if hasattr(generation_config, "ctc_weight") and generation_config.ctc_weight > 0:
            if generation_config.num_beams <= 1:
                processors.append(LogSoftmaxProcessor())
            self.ctc_rescorer = CTCRescorerLogitsProcessor(
                self.encoder_logits,
                self.encoder_output_lens,
                self.generation_config.pad_token_id,
                self.generation_config.eos_token_id,
                self.generation_config.ctc_margin,
                self.generation_config.ctc_weight,
                self.generation_config.num_beams,
                self.generation_config.space_token_id,
                self.generation_config.apply_eos_space_trick,
                self.generation_config.eos_space_trick_weight,
            )
            processors.append(self.ctc_rescorer)
        if hasattr(generation_config, "lm_weight") and generation_config.lm_weight > 0:
            from decoding.shallow_fussion import LMRescorerLogitsProcessor

            processors.append(
                LMRescorerLogitsProcessor(
                    generation_config.lm_weight, generation_config.lm_model,
                    device=self.device,
                )
            )
        return processors

    def prepare_inputs_for_generation(self, input_ids, past_key_values=None,
                                      attention_mask=None, use_cache=None,
                                      encoder_outputs=None, **kwargs):
        # DEFAULT: no-cache decode — feed the FULL prefix every step and
        # discard past. Bridges an installed-transformers (4.57)
        # incompatibility where the custom joint model's beam-search KV
        # cache is not reordered with the beams (the custom decoder returns
        # legacy tuples through Seq2SeqLMOutputLosses), silently corrupting
        # every beam's attention state after the first reorder — the
        # corruption shows up as trailing hallucinated/repeated tokens in
        # the torch transcripts. Full recompute is semantically the
        # reference decode (same scores, step for step). Set
        # AED_PARITY_REF_CACHE=1 to exercise the (broken-under-4.57)
        # cached path.
        import os as _os

        if _os.environ.get("AED_PARITY_REF_CACHE", "0") == "0":
            return {
                "attention_mask": attention_mask,
                "decoder_input_ids": input_ids,
                "encoder_outputs": encoder_outputs,
                "past_key_values": None,
                "use_cache": True,
            }
        return super().prepare_inputs_for_generation(
            input_ids, past_key_values=past_key_values,
            attention_mask=attention_mask, use_cache=use_cache,
            encoder_outputs=encoder_outputs, **kwargs,
        )

    def _prepare_encoder_decoder_kwargs_for_generation(
        self, inputs_tensor, model_kwargs, model_input_name=None,
        generation_config=None,
    ):
        # reference body (ctc_encoder_plus_autoregressive_decoder.py:406-418)
        self.encoder_output_lens = self.encoder._get_feat_extract_output_lengths(
            model_kwargs["attention_mask"].sum(dim=1)
        )
        model_kwargs = SpeechEncoderDecoderModel._prepare_encoder_decoder_kwargs_for_generation(
            self, inputs_tensor, model_kwargs, model_input_name,
            generation_config,
        )
        self.encoder_logits = model_kwargs["encoder_outputs"].logits
        return model_kwargs
