"""Model instantiation, checkpoint averaging, and config-override routing.

Mirrors the reference's model_utils surface (reference:
src/utilities/model_utils.py:54-260): checkpoint averaging over saved
training checkpoints, `instantiate_{ctc,aed,speech_encoder}_model`, and the
"encoder_*/decoder_*"-prefixed config override parser.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from huggingface_asr_tpu.models.configs import EBranchformerConfig
from huggingface_asr_tpu.models.gpt2_decoder import GPT2DecoderConfig
from huggingface_asr_tpu.models.joint_ctc_aed import JointCTCAttentionConfig


def average_checkpoints(checkpoint_dir: str, last_n: Optional[int] = None):
    """Mean of params over saved orbax checkpoints (reference
    model_utils.py:54-65 averages all ``checkpoint*/pytorch_model.bin``)."""
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(checkpoint_dir)
    steps = sorted(mgr.all_steps())
    if not steps:
        raise FileNotFoundError(f"no checkpoints under {checkpoint_dir}")
    if last_n:
        steps = steps[-last_n:]
    acc = None
    for step in steps:
        restored = mgr.restore(step)
        params = restored["params"] if "params" in restored else restored
        params = jax.tree.map(lambda x: np.asarray(x, dtype=np.float64), params)
        acc = params if acc is None else jax.tree.map(np.add, acc, params)
    avg = jax.tree.map(lambda x: (x / len(steps)).astype(np.float32), acc)
    return avg


def save_params(params, path: str, config=None):
    """Save a standalone inference checkpoint (params + config JSON).

    Overwrites an existing checkpoint at the same path (re-running a CLI
    into the same --output_dir is routine; orbax refuses by default)."""
    import shutil

    import orbax.checkpoint as ocp

    target = os.path.join(os.path.abspath(path), "params")
    if os.path.exists(target):
        shutil.rmtree(target)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(target, params)
    ckptr.wait_until_finished()
    if config is not None:
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(dataclasses.asdict(config), f, indent=2, default=str)


def load_params(path: str, template=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.join(os.path.abspath(path), "params"), template)


def load_config(path: str, cls):
    with open(os.path.join(path, "config.json")) as f:
        d = json.load(f)
    if cls is JointCTCAttentionConfig:
        return JointCTCAttentionConfig(
            encoder=EBranchformerConfig.from_dict(d["encoder"]),
            decoder=GPT2DecoderConfig(**{
                k: tuple(v) if isinstance(v, list) else v
                for k, v in d["decoder"].items()
            }),
            **{k: v for k, v in d.items() if k not in ("encoder", "decoder")},
        )
    if cls.__name__ == "LLMASRConfig":
        from huggingface_asr_tpu.models.whisper_ctc import WhisperCTCConfig

        return cls(
            encoder=WhisperCTCConfig(**d["encoder"]),
            decoder=GPT2DecoderConfig(**{
                k: tuple(v) if isinstance(v, list) else v
                for k, v in d["decoder"].items()
            }),
            **{k: v for k, v in d.items() if k not in ("encoder", "decoder")},
        )
    return cls.from_dict(d) if hasattr(cls, "from_dict") else cls(**d)


def apply_config_overrides(config, overrides: Dict[str, Any]):
    """Route encoder_/decoder_ prefixed overrides into sub-configs
    (reference fetch_config, model_utils.py:68-114)."""
    from huggingface_asr_tpu.utils.argparsing import split_prefixed_overrides

    enc, dec, rest = split_prefixed_overrides(overrides)
    if isinstance(config, JointCTCAttentionConfig):
        new_enc = dataclasses.replace(config.encoder, **enc) if enc else config.encoder
        new_dec = dataclasses.replace(config.decoder, **dec) if dec else config.decoder
        return dataclasses.replace(config, encoder=new_enc, decoder=new_dec, **rest)
    return dataclasses.replace(config, **{**enc, **rest})


def instantiate_ctc_model(
    config: Optional[EBranchformerConfig] = None,
    from_pretrained: Optional[str] = None,
    from_hf_checkpoint: Optional[str] = None,
    average_checkpoints_dir: Optional[str] = None,
    dtype=jnp.float32,
) -> Tuple[Any, Optional[Any]]:
    """Build (model, params|None) (reference instantiate_ctc_model,
    model_utils.py:117-155)."""
    from huggingface_asr_tpu.models.ebranchformer import EBranchformerForCTC

    params = None
    if from_pretrained:
        config = config or load_config(from_pretrained, EBranchformerConfig)
        params = load_params(from_pretrained)
    elif from_hf_checkpoint:
        from huggingface_asr_tpu.interop.hf_ebranchformer import load_hf_ctc_checkpoint

        assert config is not None, "config required for HF checkpoint conversion"
        params = load_hf_ctc_checkpoint(from_hf_checkpoint, config)
    elif average_checkpoints_dir:
        params = average_checkpoints(average_checkpoints_dir)
    return EBranchformerForCTC(config, dtype=dtype), params


def instantiate_aed_model(
    config: Optional[JointCTCAttentionConfig] = None,
    from_pretrained: Optional[str] = None,
    encoder_params: Optional[Any] = None,
    decoder_params: Optional[Any] = None,
    dtype=jnp.float32,
) -> Tuple[Any, Optional[Any]]:
    """Build the joint model, optionally from separately pretrained halves
    (reference from_encoder_decoder_pretrained, ctc_encoder...py:138-235)."""
    from huggingface_asr_tpu.models.joint_ctc_aed import JointCTCAttentionEncoderDecoder

    params = None
    if from_pretrained:
        config = config or load_config(from_pretrained, JointCTCAttentionConfig)
        params = load_params(from_pretrained)
    model = JointCTCAttentionEncoderDecoder(config, dtype=dtype)
    if params is None and (encoder_params is not None or decoder_params is not None):
        params = {"encoder": encoder_params, "decoder": decoder_params}
    return model, params


def merge_pretrained_halves(init_params, encoder_params=None, decoder_params=None):
    """Graft pretrained encoder/decoder params into a fresh joint param tree."""
    params = dict(init_params)
    if encoder_params is not None:
        params["encoder"] = encoder_params
    if decoder_params is not None:
        params["decoder"] = decoder_params
    return params
