"""LLM-ASR model: static-shape soft-prompt packing, loss, freezing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from huggingface_asr_tpu.models.gpt2_decoder import GPT2DecoderConfig
from huggingface_asr_tpu.models.llm_asr import LLMASRConfig, LLMASRModel
from huggingface_asr_tpu.models.whisper_ctc import WhisperCTCConfig
from huggingface_asr_tpu.training.optim import OptimizerConfig, freeze_mask, make_optimizer_with_frozen

CFG = LLMASRConfig(
    encoder=WhisperCTCConfig(
        d_model=32, encoder_layers=1, encoder_attention_heads=2,
        encoder_ffn_dim=64, vocab_size=30, llm_dim=48, additional_head_count=2,
        max_source_positions=100, blank_token_id=0,
    ),
    decoder=GPT2DecoderConfig(
        vocab_size=60, n_positions=128, n_embd=24, n_layer=1, n_head=2,
        add_cross_attention=False, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        bos_token_id=0, eos_token_id=1, pad_token_id=3,
    ),
    number_of_prompt_tokens=4,
)


def _run(B=2, T_mel=60, L=6):
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, T_mel, 80)), jnp.float32)
    lens = jnp.asarray([60, 40])
    labels = jnp.asarray(rng.integers(4, 60, (B, L)), jnp.int32)
    labels = labels.at[:, -1].set(1)
    label_lens = jnp.asarray([L, L - 2])
    model = LLMASRModel(CFG)
    params = model.init(
        jax.random.key(0), feats, lens, labels=labels, label_lengths=label_lens
    )["params"]
    out = model.apply(
        {"params": params}, feats, lens, labels=labels, label_lengths=label_lens
    )
    return model, params, out, (feats, lens, labels, label_lens)


def test_forward_and_loss():
    model, params, out, _ = _run()
    assert np.isfinite(float(out.loss))
    assert out.llm_logits.shape[-1] == 60
    # ASR frames survive CTC collapse and fit in the plan
    assert np.all(np.asarray(out.asr_lengths) >= 0)
    assert np.all(np.asarray(out.asr_lengths) <= 30)
    assert "soft_prompt" in params and "linear" in params


def test_token_plan_layout():
    model, params, out, (feats, lens, labels, label_lens) = _run()
    plan = np.asarray(out.token_plan)
    n = np.asarray(out.asr_lengths)
    P = CFG.number_of_prompt_tokens
    for b in range(2):
        assert plan[b, 0] == 0  # bos
        start = 1 + P + n[b] + 1
        np.testing.assert_array_equal(
            plan[b, start : start + labels.shape[1]], np.asarray(labels[b])
        )


def test_freeze_masks():
    model, params, out, _ = _run()
    mask = freeze_mask(params, ("decoder",))
    leaves_dec = jax.tree.leaves(mask["decoder"])
    assert all(v is False for v in leaves_dec)
    assert all(v is True for v in jax.tree.leaves(mask["encoder"]))

    tx = make_optimizer_with_frozen(
        OptimizerConfig(lr_scheduler_type="constant", warmup_steps=0, total_steps=10),
        params, ("decoder",),
    )
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, opt_state = tx.update(grads, opt_state, params)
    updates, _ = tx.update(grads, opt_state, params)  # past any 0-lr warmup step
    assert all(float(jnp.abs(u).sum()) == 0.0 for u in jax.tree.leaves(updates["decoder"]))
    assert any(float(jnp.abs(u).sum()) > 0.0 for u in jax.tree.leaves(updates["encoder"]))


def test_prompting_variant_token_plan():
    """Text-prompting variant (reference whisper_llm_prompting.py): the
    deduplicated CTC hypothesis ids appear as REAL input ids in the plan and
    the loss trains the label tail."""
    import dataclasses

    cfg = dataclasses.replace(CFG, prompt_with_tokens=True)
    model = LLMASRModel(cfg)
    rng = np.random.default_rng(0)
    B, T_mel = 2, 40
    feats = jnp.asarray(rng.standard_normal((B, T_mel, 80)), jnp.float32)
    lens = jnp.asarray([T_mel, T_mel - 8])
    labels = jnp.asarray(rng.integers(4, 40, (B, 5)), jnp.int32)
    llens = jnp.asarray([5, 3])
    params = model.init(jax.random.key(0), feats, lens, labels, llens)["params"]
    out = model.apply({"params": params}, feats, lens, labels, llens)
    assert np.isfinite(float(out.loss))
    # the ASR region of the plan carries real (non-overlaid) token ids
    P = cfg.number_of_prompt_tokens
    plan = np.asarray(out.token_plan)
    n = np.asarray(out.asr_lengths)
    pad = cfg.decoder.pad_token_id or 0
    for b in range(B):
        region = plan[b, 1 + P : 1 + P + n[b]]
        assert (region != pad).all() or n[b] == 0
    # no frame-projection parameter exists in this variant
    assert "linear" not in params


def test_vocab_subset_extraction():
    """get_token_subset keeps charset tokens + specials with a dense one-to-one
    remapping (reference local_utils.py:95-113)."""
    from transformers import AutoTokenizer

    from huggingface_asr_tpu.utils.vocab_subset import (
        get_token_subset,
        map_ids,
        subset_lm_head,
    )

    tok = AutoTokenizer.from_pretrained("gpt2") if False else None
    # offline env: build a tiny fake tokenizer instead
    class FakeTok:
        vocab = {"a": 0, "b": 1, "ü": 2, "<s>": 3, "Ω": 4, " c": 5}
        all_special_tokens = ["<s>"]

        def __len__(self):
            return 6

        def decode(self, i):
            return {0: "a", 1: "b", 2: "ü", 3: "<s>", 4: "Ω", 5: " c"}[i]

    mapping, inverted, removed = get_token_subset(FakeTok())
    assert set(removed) == {2, 4}
    assert mapping == {0: 0, 1: 1, 3: 2, 5: 3}
    assert inverted[2] == 3
    kernel = np.arange(12, dtype=np.float32).reshape(2, 6)
    small = subset_lm_head(kernel, mapping)
    np.testing.assert_array_equal(small, kernel[:, [0, 1, 3, 5]])
    assert map_ids([0, 2, 5], mapping) == [0, 3]
