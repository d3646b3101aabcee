"""GPT-2-style decoder with cross-attention and auxiliary heads — the DeCRED
decoder (reference: src/models/decoders/multi_head_gpt2.py:31-170,
src/models/auto_wrappers.py:186-310, src/models/embeddings.py).

Features re-implemented TPU-first:
  * GPT-2 block: LN→causal self-attn→res, LN→cross-attn→res, LN→MLP→res,
    final LN; gelu_new activation; learned wpe or (pos_emb_fixed) fixed
    sinusoidal positions with sqrt(d)-scaled input embeddings.
  * Multi-head auxiliary losses: extra LM heads at intermediate layers
    (``head_locations``) with per-head weights; optional logit averaging at
    inference (``average_logits``); label smoothing.
  * KV-cache incremental decoding via flax's 'cache' variable collection —
    one fused step per generated token, static shapes.

Param naming mirrors HF GPT-2 (wte/wpe/h_i/ln_1/attn.c_attn/...) so
checkpoint conversion is mechanical (HF Conv1D stores (in, out) — no
transpose needed).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = jnp.finfo(jnp.float32).min


@dataclasses.dataclass(frozen=True)
class GPT2DecoderConfig:
    vocab_size: int = 5000
    n_positions: int = 1024
    n_embd: int = 256
    n_layer: int = 6
    n_head: int = 4
    n_inner: Optional[int] = None  # defaults to 4*n_embd
    activation_function: str = "gelu_new"
    resid_pdrop: float = 0.1
    embd_pdrop: float = 0.1
    attn_pdrop: float = 0.1
    layer_norm_epsilon: float = 1e-5
    add_cross_attention: bool = True
    # DeCRED multi-head
    head_locations: Tuple[int, ...] = ()  # layer indices (post-layer hidden states)
    head_weights: Tuple[float, ...] = (1.0,)  # len == len(head_locations)+1
    tie_additional_weights: bool = False
    tie_word_embeddings: bool = False
    average_logits: bool = False
    lsm_factor: float = 0.0  # label smoothing
    # Fixed sinusoidal positions + scaled input embedding (auto_wrappers.py:186-209)
    pos_emb_fixed: bool = False
    bos_token_id: int = 0
    eos_token_id: int = 1
    pad_token_id: Optional[int] = None
    # Fine-tunable head combination (reference multi_head_gpt2_mixing.py:34-144):
    # None | "full" (linear over concat logits, ~identity-average init) |
    # "linear" (per-head-per-vocab weights) | "scalar" (per-head scalars)
    mixing_mode: Optional[str] = None
    # LM head over concatenation of selected hidden states (reference
    # residual_clasiffier_gpt2.py:12-99); empty = disabled
    connected_residuals: Tuple[int, ...] = ()

    @property
    def inner_dim(self):
        return self.n_inner or 4 * self.n_embd

    @property
    def head_dim(self):
        return self.n_embd // self.n_head


ACT = {
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "relu": jax.nn.relu,
}


def sinusoidal_positions(n_pos: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """Transformer-XL style table: cat(sin, cos) over inv_freq (embeddings.py:65-87)."""
    inv_freq = 1.0 / (10000 ** (np.arange(0.0, dim, 2.0) / dim))
    sinusoid = np.outer(np.arange(n_pos, dtype=np.float64), inv_freq)
    return jnp.asarray(np.concatenate([np.sin(sinusoid), np.cos(sinusoid)], axis=-1), dtype)



def _winit(cfg):
    """HF GPT-2 init: normal(initializer_range) for all Conv1D/Linear."""
    return nn.initializers.normal(stddev=getattr(cfg, "initializer_range", 0.02))


def _winit_resid(cfg):
    """HF GPT-2 residual-projection init: normal scaled by 1/sqrt(2*n_layer)."""
    std = getattr(cfg, "initializer_range", 0.02) / (2 * cfg.n_layer) ** 0.5
    return nn.initializers.normal(stddev=std)


class CachedAttention(nn.Module):
    """Causal self-attention or cross-attention with optional KV cache."""

    config: GPT2DecoderConfig
    cross: bool = False
    dtype: Any = jnp.float32
    decode_max_length: Optional[int] = None  # KV-cache length (defaults n_positions)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        kv_source: Optional[jnp.ndarray] = None,
        attention_bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        decode: bool = False,
        cross_kv_mode: Optional[str] = None,  # None | "write" | "read"
    ) -> Optional[jnp.ndarray]:
        cfg = self.config
        B, Tq, D = x.shape
        H, dh = cfg.n_head, cfg.head_dim

        if self.cross and cross_kv_mode == "write":
            # Precompute encoder K/V ONCE per utterance into the cache —
            # recomputing c_attn(encoder_hidden) at every decode step is the
            # dominant FLOP cost of beam search otherwise.
            kv = nn.Dense(2 * D, dtype=self.dtype, kernel_init=_winit(cfg), name="c_attn")(kv_source)
            k, v = jnp.split(kv, 2, axis=-1)
            S = kv_source.shape[1]
            self.variable(
                "cache", "cached_enc_key", lambda: k.reshape(B, S, H, dh)
            ).value = k.reshape(B, S, H, dh)
            self.variable(
                "cache", "cached_enc_value", lambda: v.reshape(B, S, H, dh)
            ).value = v.reshape(B, S, H, dh)
            return None

        if self.cross:
            q = nn.Dense(D, dtype=self.dtype, kernel_init=_winit(cfg), name="q_attn")(x)
            if cross_kv_mode == "read":
                k4 = self.get_variable("cache", "cached_enc_key")
                v4 = self.get_variable("cache", "cached_enc_value")
                Bkv = k4.shape[0]
                if Bkv != B:
                    # Beam-shared cross-attention KV: the cache was written
                    # from the UNEXPANDED encoder hidden (one copy per batch
                    # element), and x carries B = Bkv*W beam rows. Fold the
                    # beam dim into the query-time dim: the QK/PV
                    # contractions run as real (W, S) matmuls batched over
                    # Bkv instead of B*W rank-1 dots — and the (Bkv, S, H,
                    # dh) K/V is read from HBM ONCE per step instead of W
                    # times. Cross-attention has no causal mask, so folding
                    # W queries is mathematically identical.
                    W = B // Bkv
                    qf = q.reshape(Bkv, W * Tq, H, dh)
                    scores = jnp.einsum("bqhd,bkhd->bhqk", qf, k4) / jnp.sqrt(
                        dh
                    ).astype(self.dtype)
                    scores = scores.astype(jnp.float32)
                    if attention_bias is not None:
                        scores = scores + attention_bias
                    probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
                    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v4).reshape(B, Tq, D)
                    out = nn.Dense(
                        D, dtype=self.dtype, kernel_init=_winit_resid(cfg),
                        name="c_proj",
                    )(out)
                    return nn.Dropout(cfg.resid_pdrop)(
                        out, deterministic=deterministic
                    )
                k = k4.reshape(B, -1, H * dh)
                v = v4.reshape(B, -1, H * dh)
            else:
                kv = nn.Dense(2 * D, dtype=self.dtype, kernel_init=_winit(cfg), name="c_attn")(kv_source)
                k, v = jnp.split(kv, 2, axis=-1)
        else:
            qkv = nn.Dense(3 * D, dtype=self.dtype, kernel_init=_winit(cfg), name="c_attn")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)

        q = q.reshape(B, Tq, H, dh)
        k = k.reshape(B, -1, H, dh)
        v = v.reshape(B, -1, H, dh)

        if decode and not self.cross:
            # Autoregressive cache: fixed-size buffers + write index. The
            # update is SKIPPED while initializing (flax convention) so
            # init() returns a clean zeroed cache.
            cache_len = self.decode_max_length or cfg.n_positions
            is_initialized = self.has_variable("cache", "cached_key")
            cached_key = self.variable(
                "cache", "cached_key", jnp.zeros,
                (B, cache_len, H, dh), self.dtype,
            )
            cached_value = self.variable(
                "cache", "cached_value", jnp.zeros,
                (B, cache_len, H, dh), self.dtype,
            )
            cache_index = self.variable(
                "cache", "cache_index", lambda: jnp.zeros((), jnp.int32)
            )
            if is_initialized:
                idx = cache_index.value
                cached_key.value = jax.lax.dynamic_update_slice(
                    cached_key.value, k, (0, idx, 0, 0)
                )
                cached_value.value = jax.lax.dynamic_update_slice(
                    cached_value.value, v, (0, idx, 0, 0)
                )
                cache_index.value = idx + Tq
                k, v = cached_key.value, cached_value.value
                # Mask out future cache slots: (1, 1, 1, cache_len) bias.
                pos = jnp.arange(cache_len)[None, :]
                valid = pos < (idx + Tq)
                causal_bias = jnp.where(valid, 0.0, NEG_INF)[:, None, None, :]
            else:
                Tk = k.shape[1]
                causal = jnp.tril(jnp.ones((Tq, Tk), dtype=bool))
                causal_bias = jnp.where(causal, 0.0, NEG_INF)[None, None, :, :]
        elif self.cross:
            causal_bias = None
        else:
            Tk = k.shape[1]
            causal = jnp.tril(jnp.ones((Tq, Tk), dtype=bool))
            causal_bias = jnp.where(causal, 0.0, NEG_INF)[None, None, :, :]

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(dh).astype(self.dtype)
        scores = scores.astype(jnp.float32)
        if causal_bias is not None:
            scores = scores + causal_bias
        if attention_bias is not None:
            scores = scores + attention_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        probs = nn.Dropout(cfg.attn_pdrop)(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, Tq, D)
        out = nn.Dense(D, dtype=self.dtype, kernel_init=_winit_resid(cfg), name="c_proj")(out)
        return nn.Dropout(cfg.resid_pdrop)(out, deterministic=deterministic)


class GPT2Block(nn.Module):
    config: GPT2DecoderConfig
    dtype: Any = jnp.float32
    decode_max_length: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x,
        encoder_hidden=None,
        encoder_bias=None,
        deterministic=True,
        decode=False,
        self_bias=None,
        cross_kv_mode=None,
    ):
        cfg = self.config
        if cross_kv_mode == "write":
            CachedAttention(cfg, cross=True, dtype=self.dtype, name="crossattention")(
                x, kv_source=encoder_hidden, cross_kv_mode="write",
            )
            return x
        h = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, dtype=self.dtype, name="ln_1")(x)
        x = x + CachedAttention(
            cfg, cross=False, dtype=self.dtype,
            decode_max_length=self.decode_max_length, name="attn",
        )(h, attention_bias=self_bias, deterministic=deterministic, decode=decode)
        if cfg.add_cross_attention and (
            encoder_hidden is not None or cross_kv_mode == "read"
        ):
            h = nn.LayerNorm(
                epsilon=cfg.layer_norm_epsilon, dtype=self.dtype, name="ln_cross_attn"
            )(x)
            x = x + CachedAttention(cfg, cross=True, dtype=self.dtype, name="crossattention")(
                h, kv_source=encoder_hidden, attention_bias=encoder_bias,
                deterministic=deterministic, cross_kv_mode=cross_kv_mode,
            )
        h = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(cfg.inner_dim, dtype=self.dtype, kernel_init=_winit(cfg), name="mlp_c_fc")(h)
        h = ACT[cfg.activation_function](h)
        h = nn.Dense(cfg.n_embd, dtype=self.dtype, kernel_init=_winit_resid(cfg), name="mlp_c_proj")(h)
        h = nn.Dropout(cfg.resid_pdrop)(h, deterministic=deterministic)
        return x + h


@dataclasses.dataclass
class DecoderOutput:
    logits: jnp.ndarray  # final-head logits (possibly averaged)
    loss: Optional[jnp.ndarray] = None
    hidden_states: Optional[Tuple[jnp.ndarray, ...]] = None
    per_head_logits: Optional[Tuple[jnp.ndarray, ...]] = None


def smoothed_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    mask: jnp.ndarray,
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """Mean CE over masked tokens with torch-style label smoothing."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = -jnp.mean(logp, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(nll * mask) / denom


class GPT2MultiHeadDecoder(nn.Module):
    """DeCRED decoder: GPT-2 + cross-attention + intermediate LM heads.

    NOTE: initialize with ``labels`` so every head's params are created.
    """

    config: GPT2DecoderConfig
    dtype: Any = jnp.float32
    decode_max_length: Optional[int] = None

    def _heads(self):
        cfg = self.config
        return list(zip(
            [*cfg.head_locations, -1],
            [*range(len(cfg.head_locations))] + ["final"],
            cfg.head_weights,
        ))

    @nn.compact
    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        encoder_hidden: Optional[jnp.ndarray] = None,
        encoder_lengths: Optional[jnp.ndarray] = None,
        labels: Optional[jnp.ndarray] = None,
        label_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        decode: bool = False,
        position_offset: Optional[jnp.ndarray] = None,
        input_embeds: Optional[jnp.ndarray] = None,
        attention_bias: Optional[jnp.ndarray] = None,
        embeds_overlay: Optional[jnp.ndarray] = None,
        overlay_mask: Optional[jnp.ndarray] = None,
        cross_kv_mode: Optional[str] = None,
    ) -> Optional[DecoderOutput]:
        cfg = self.config
        if cross_kv_mode == "write":
            # One-shot pass populating each layer's encoder K/V cache.
            dummy = jnp.zeros((encoder_hidden.shape[0], 1, cfg.n_embd), self.dtype)
            for i in range(cfg.n_layer):
                GPT2Block(
                    cfg, self.dtype, decode_max_length=self.decode_max_length,
                    name=f"h_{i}",
                )(dummy, encoder_hidden, None, True, False, cross_kv_mode="write")
            return None
        wte = nn.Embed(
            cfg.vocab_size, cfg.n_embd, dtype=self.dtype,
            embedding_init=nn.initializers.normal(0.02), name="wte",
        )
        if input_embeds is not None:
            x = input_embeds.astype(self.dtype)
            B, T = x.shape[:2]
        else:
            B, T = input_ids.shape
            x = wte(input_ids)
        if embeds_overlay is not None:
            # Soft-prompt/feature splicing (LLM-ASR): positions flagged in
            # overlay_mask take externally computed embeddings.
            x = jnp.where(
                overlay_mask[..., None], embeds_overlay.astype(self.dtype), x
            )
        if cfg.pos_emb_fixed:
            x = x * jnp.sqrt(cfg.n_embd).astype(self.dtype)
            table = sinusoidal_positions(cfg.n_positions, cfg.n_embd, self.dtype)
        else:
            table = self.param(
                "wpe", nn.initializers.normal(0.01), (cfg.n_positions, cfg.n_embd),
                jnp.float32,
            ).astype(self.dtype)
        if decode and position_offset is not None:
            positions = position_offset[..., None] + jnp.arange(T)[None, :]
            x = x + jnp.take(table, positions, axis=0)
        else:
            x = x + table[None, :T]
        x = nn.Dropout(cfg.embd_pdrop)(x, deterministic=deterministic)

        encoder_bias = None
        if encoder_hidden is not None and encoder_lengths is not None:
            S = encoder_hidden.shape[1]
            enc_mask = jnp.arange(S)[None, :] < encoder_lengths[:, None]
            encoder_bias = jnp.where(enc_mask, 0.0, NEG_INF)[:, None, None, :].astype(
                jnp.float32
            )

        # HF hidden_states indexing: [0]=embeddings, [i]=block i output,
        # [-1]=post-ln_f final state; head_locations index into this tuple.
        hidden_states = [x]
        for i in range(cfg.n_layer):
            x = GPT2Block(
                cfg, self.dtype, decode_max_length=self.decode_max_length, name=f"h_{i}"
            )(x, encoder_hidden if cross_kv_mode != "read" else None,
              encoder_bias, deterministic, decode,
              self_bias=attention_bias, cross_kv_mode=cross_kv_mode)
            hidden_states.append(x)
        x_final = nn.LayerNorm(
            epsilon=cfg.layer_norm_epsilon, dtype=self.dtype, name="ln_f"
        )(x)
        hidden_states[-1] = x_final
        def head(name):
            if cfg.tie_word_embeddings and name == "lm_head":
                return lambda h: wte.attend(h)
            if cfg.tie_additional_weights and name != "lm_head":
                return lambda h: wte.attend(h)
            dense = nn.Dense(cfg.vocab_size, use_bias=False, dtype=self.dtype, kernel_init=_winit(cfg), name=name)
            return dense

        per_head_logits = None
        loss = None

        if cfg.connected_residuals:
            # Residual-classifier head: vocab projection over concatenated
            # hidden states of the selected layers.
            concat = jnp.concatenate(
                [hidden_states[i] for i in cfg.connected_residuals], axis=-1
            )
            logits = nn.Dense(
                cfg.vocab_size, use_bias=False, dtype=self.dtype, name="lm_head"
            )(concat)
            if labels is not None:
                loss = smoothed_cross_entropy(
                    logits, labels, label_mask.astype(jnp.float32), cfg.lsm_factor
                )
            return DecoderOutput(logits=logits, loss=loss,
                                 hidden_states=tuple(hidden_states))

        final_head = head("lm_head")

        if cfg.mixing_mode is not None:
            n = len(cfg.head_weights)
            per_head = []
            for k, (loc, tag, _) in enumerate(self._heads()):
                head_fn = (
                    final_head if tag == "final" else head(f"additional_lm_heads_{k}")
                )
                per_head.append(head_fn(hidden_states[loc]))
            if cfg.mixing_mode == "full":
                def eye_repeat(key, shape, dtype=jnp.float32):
                    V = cfg.vocab_size
                    return jnp.tile(jnp.eye(V, dtype=dtype) * 0.5, (n, 1))

                logits = nn.Dense(
                    cfg.vocab_size, dtype=self.dtype, kernel_init=eye_repeat,
                    name="lm_mixing",
                )(jnp.concatenate(per_head, axis=-1))
            elif cfg.mixing_mode == "linear":
                w = self.param(
                    "lm_mixing",
                    lambda *_: jnp.full((n, cfg.vocab_size), 1.0 / n, jnp.float32),
                )
                logits = sum(
                    lg * w[i][None, None, :].astype(lg.dtype)
                    for i, lg in enumerate(per_head)
                )
            elif cfg.mixing_mode == "scalar":
                w = self.param(
                    "lm_mixing", lambda *_: jnp.full((n,), 1.0 / n, jnp.float32)
                )
                logits = sum(lg * w[i].astype(lg.dtype) for i, lg in enumerate(per_head))
            else:
                raise NotImplementedError(cfg.mixing_mode)
            if labels is not None:
                # NOTE: the reference's mixing loss slices lm_logits[-1]
                # (multi_head_gpt2_mixing.py:129), which drops all but the
                # last batch row — we train the mixed logits properly.
                loss = smoothed_cross_entropy(
                    logits, labels, label_mask.astype(jnp.float32), 0.0
                )
            return DecoderOutput(logits=logits, loss=loss,
                                 hidden_states=tuple(hidden_states),
                                 per_head_logits=tuple(per_head))

        if labels is not None:
            # ``labels`` are targets ALIGNED with input positions (the caller
            # passes input_ids=[bos]+y[:-1], labels=y). This equals the
            # reference's effective objective (multi_head_gpt2.py:149-153
            # internal shift + bos-prefixed tokenizer labels) without the
            # tokenizer-template dependency.
            total = 0.0
            logits_list = []
            for k, (loc, tag, weight) in enumerate(self._heads()):
                h = hidden_states[loc]
                head_fn = (
                    final_head if tag == "final" else head(f"additional_lm_heads_{k}")
                )
                lg = head_fn(h)
                logits_list.append(lg)
                total = total + weight * smoothed_cross_entropy(
                    lg, labels, label_mask.astype(jnp.float32), cfg.lsm_factor,
                )
            loss = total
            per_head_logits = tuple(logits_list)
            logits = logits_list[-1]
            if cfg.average_logits:
                w = jnp.asarray(cfg.head_weights, dtype=jnp.float32)
                logits = sum(
                    wi * lg.astype(jnp.float32) for wi, lg in zip(w, logits_list)
                ) / len(logits_list)
        else:
            logits = final_head(hidden_states[-1])
            if cfg.average_logits and cfg.head_locations:
                logits = logits * cfg.head_weights[-1]
                for k, (loc, tag, weight) in enumerate(self._heads()[:-1]):
                    logits = logits + weight * head(f"additional_lm_heads_{k}")(
                        hidden_states[loc]
                    )

        return DecoderOutput(
            logits=logits,
            loss=loss,
            hidden_states=tuple(hidden_states),
            per_head_logits=per_head_logits,
        )
