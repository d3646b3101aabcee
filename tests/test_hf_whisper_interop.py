"""Golden parity: our Whisper encoder vs HF WhisperEncoder via conversion."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from huggingface_asr_tpu.interop.hf_whisper import convert_whisper_encoder_state_dict
from huggingface_asr_tpu.models.whisper_ctc import WhisperCTCConfig, WhisperEncoderForCTC


def test_encoder_parity_vs_hf_whisper():
    from transformers import WhisperConfig
    from transformers.models.whisper.modeling_whisper import WhisperEncoder

    hf_cfg = WhisperConfig(
        num_mel_bins=80, d_model=32, encoder_layers=2, encoder_attention_heads=2,
        encoder_ffn_dim=64, max_source_positions=100, attn_implementation="eager",
    )
    torch.manual_seed(0)
    ref = WhisperEncoder(hf_cfg)
    ref.eval()

    rng = np.random.default_rng(0)
    T_mel = 200  # HF Whisper requires exactly 2*max_source_positions
    feats = rng.standard_normal((2, 80, T_mel)).astype(np.float32)  # HF: (B, mel, T)
    with torch.no_grad():
        golden = ref(torch.tensor(feats)).last_hidden_state.numpy()

    cfg = WhisperCTCConfig(
        d_model=32, encoder_layers=2, encoder_attention_heads=2,
        encoder_ffn_dim=64, max_source_positions=100, vocab_size=10, llm_dim=16,
        additional_head_count=2,
    )
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_whisper_encoder_state_dict(sd, cfg)

    # Build a matching flax forward: run only the encoder part of our model.
    # WhisperEncoderForCTC adds dim_matching etc., so compare via a direct
    # sub-application: initialize full model, swap in converted encoder params.
    model = WhisperEncoderForCTC(cfg)
    x = jnp.asarray(feats.transpose(0, 2, 1))  # ours: (B, T, mel)
    full = model.init(jax.random.key(0), x, jnp.asarray([T_mel, T_mel]))["params"]
    for k, v in params.items():
        full[k] = v
    out = model.apply({"params": full}, x, jnp.asarray([T_mel, T_mel]))
    # our hidden_states[-1] includes dim_matching+additional layer (random),
    # so instead compare through a stripped config with identity extension?
    # Simpler: HF position table is LEARNED (sinusoidal-initialized in torch
    # >=4.31 as nn.Embedding with default init) — copy it for parity.
    # The clean comparison: rebuild the encoder trunk manually.
    from huggingface_asr_tpu.models.whisper_ctc import WhisperEncoderLayer
    import flax.linen as nn

    class Trunk(nn.Module):
        cfg: WhisperCTCConfig

        @nn.compact
        def __call__(self, x, pos_table):
            c = self.cfg
            x = nn.Conv(c.d_model, (3,), padding=[(1, 1)], name="conv1")(x)
            x = jax.nn.gelu(x, approximate=False)
            x = nn.Conv(c.d_model, (3,), strides=(2,), padding=[(1, 1)], name="conv2")(x)
            x = jax.nn.gelu(x, approximate=False)
            x = x + pos_table[: x.shape[1]]
            for i in range(c.encoder_layers):
                x = WhisperEncoderLayer(
                    c.d_model, c.encoder_attention_heads, c.encoder_ffn_dim, c,
                    name=f"layers_{i}",
                )(x, None, True)
            return nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm")(x)

    trunk = Trunk(cfg)
    pos_table = jnp.asarray(sd["embed_positions.weight"])
    ours = trunk.apply({"params": params}, x, pos_table)
    np.testing.assert_allclose(np.asarray(ours), golden, rtol=2e-4, atol=2e-4)
