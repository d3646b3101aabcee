"""Training orchestration: pjit train/eval steps over a device mesh.

TPU-native re-design of the reference's Trainer subclasses (reference:
src/utilities/training_utils.py:41-407): the whole step — optional on-device
log-mel featurization, SpecAugment, forward, loss, backward, anomaly guard,
optimizer update — is ONE compiled XLA program, sharded over the ``data``
axis of a `jax.sharding.Mesh`. Gradient sync is the XLA all-reduce inserted
from sharding annotations; no DDP wrapper exists or is needed.

Trainers:
  * CTCTrainer        — EBranchformerForCTC (reference stock Trainer +
                        GradAwareTrainer guards)
  * JointTrainer      — DeCRED/ED with enc/dec loss tracking (reference
                        AdditionalLossTrackerTrainer/CustomSeq2SeqTrainer)
  * BestRQTrainer     — BEST-RQ SSL, loss ÷ masked count + stats
  * Wav2Vec2SSLTrainer— contrastive SSL with Gumbel temperature decay
                        (reference SSLTrainer + GumbelTemperatureCallback)
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from huggingface_asr_tpu.models.bestrq import BestRQForPreTraining
from huggingface_asr_tpu.models.ebranchformer import EBranchformerForCTC
from huggingface_asr_tpu.models.joint_ctc_aed import JointCTCAttentionEncoderDecoder
from huggingface_asr_tpu.models.wav2vec2_ssl import Wav2Vec2ForPreTraining
from huggingface_asr_tpu.ops.ctc import ctc_greedy_decode
from huggingface_asr_tpu.ops.features import LogMelFrontEnd
from huggingface_asr_tpu.ops.spec_augment import SpecAugmentConfig, spec_augment
from huggingface_asr_tpu.parallel.mesh import MeshConfig, batch_sharding, make_mesh, param_sharding
from huggingface_asr_tpu.training.optim import OptimizerConfig, make_optimizer
from huggingface_asr_tpu.training.train_state import AsrTrainState

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    optimizer: OptimizerConfig = OptimizerConfig()
    mesh: MeshConfig = MeshConfig()
    spec_augment: Optional[SpecAugmentConfig] = SpecAugmentConfig()
    max_grad_norm_guard: float = 100.0  # reference GradAwareTrainer threshold
    log_every: int = 50
    eval_every: int = 1000
    save_every: int = 1000
    max_steps: int = 100_000
    seed: int = 42
    checkpoint_dir: Optional[str] = None
    keep_checkpoints: int = 5
    early_stopping_patience: int = 0  # 0 = disabled
    greater_is_better: bool = False
    metric_for_best: str = "eval_loss"
    # SSL (reference GumbelTemperatureCallback, callbacks.py:32-49)
    gumbel_temperature_start: float = 2.0
    gumbel_temperature_end: float = 0.5
    gumbel_temperature_decay: float = 0.999995
    # On-the-fly augmentation scheduling (reference DelayedStartWrapper,
    # callbacks.py:52-66): SpecAugment activates at this global step.
    spec_augment_start_step: int = 0
    # Capture a jax.profiler trace for steps [profile_start, profile_start+N)
    profile_steps: int = 0
    profile_start: int = 10
    profile_dir: str = "/tmp/jax_trace"
    # PRNG implementation for the per-step dropout/augment streams.
    # "rbg" (XLA's hardware RNG) — threefry mask generation measured at
    # 67 ms of the 240 ms B=64x10s train step (validation/train_attrib.py
    # r4: the (B,H,T,T) attention-probs bernoulli per layer dominates);
    # rbg generates the same-shaped masks at a fraction of the VPU cost.
    # Param INIT stays threefry (init quality/reproducibility, one-time).
    rng_impl: str = "rbg"


class BaseTrainer:
    """Shared mesh/optimizer/state/fit/checkpoint machinery."""

    def __init__(
        self,
        model,
        config: TrainerConfig = TrainerConfig(),
        mesh=None,
        frontend: Optional[LogMelFrontEnd] = None,
    ):
        self.model = model
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh(config.mesh)
        self.tx = make_optimizer(config.optimizer)
        self.frontend = frontend
        self._train_step = None
        self._eval_step = None
        self._ckpt_mgr = None

    # --------------------------------------------------------------- model fns
    def _featurize(self, batch: Dict[str, jnp.ndarray]):
        """Waveform batches are featurized ON DEVICE inside the step."""
        if "input_features" in batch:
            return batch["input_features"], batch["input_lengths"]
        feats, lengths = self.frontend(
            batch["input_values"], batch["input_values_lengths"]
        )
        return feats, lengths

    def _init_args(self, batch):
        feats, lengths = (
            (jnp.asarray(batch["input_features"]), jnp.asarray(batch["input_lengths"]))
            if "input_features" in batch
            else self.frontend(
                jnp.asarray(batch["input_values"]),
                jnp.asarray(batch["input_values_lengths"]),
            )
        )
        return (feats, lengths), {}

    def init_params(self, example_batch) -> Any:
        rng = jax.random.key(self.config.seed)
        args, kwargs = self._init_args(example_batch)
        return self.model.init(rng, *args, **kwargs)["params"]

    def init_state(self, example_batch) -> AsrTrainState:
        params = self.init_params(example_batch)
        return self.make_state(params)

    def make_state(self, params) -> AsrTrainState:
        _, dropout_rng = jax.random.split(
            jax.random.key(self.config.seed, impl=self.config.rng_impl)
        )
        state = AsrTrainState.create_with_guards(
            apply_fn=self.model.apply, params=params, tx=self.tx, dropout_rng=dropout_rng
        )
        return jax.device_put(state, self.state_shardings(state))

    def state_shardings(self, state: AsrTrainState):
        from huggingface_asr_tpu.parallel.mesh import fsdp_spec

        repl = NamedSharding(self.mesh, P())
        if not self.config.mesh.fsdp:
            return jax.tree.map(lambda _: repl, state)
        size = self.mesh.shape["data"]
        min_size = self.config.mesh.fsdp_min_size

        def leaf_sharding(leaf):
            shape = getattr(leaf, "shape", None)
            if shape:
                return NamedSharding(self.mesh, fsdp_spec(shape, size, min_size))
            return repl

        return jax.tree.map(leaf_sharding, state)

    # ------------------------------------------------------- subclass hooks
    def loss_and_metrics(self, params, batch, step_rng, dropout_rng, step):
        raise NotImplementedError

    def eval_outputs(self, params, batch):
        raise NotImplementedError

    def batch_shardings(self, batch):
        def spec(x):
            return NamedSharding(
                self.mesh, P("data", *([None] * (np.ndim(x) - 1)))
            )

        return {k: spec(v) for k, v in batch.items()}

    # ------------------------------------------------------------- step fns
    def _build_train_step(self, example_batch):
        cfg = self.config

        def train_step(state: AsrTrainState, batch):
            step_rng = jax.random.fold_in(state.dropout_rng, state.step)
            aug_rng, dropout_rng = jax.random.split(step_rng)

            def loss_fn(params):
                return self.loss_and_metrics(
                    params, batch, aug_rng, dropout_rng, state.step
                )

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            new_state, gnorm, ok = state.apply_gradients_guarded(
                grads=grads, max_grad_norm_guard=cfg.max_grad_norm_guard
            )
            metrics = {
                "loss": loss,
                "grad_norm": gnorm,
                "step_applied": ok.astype(jnp.int32),
                "skipped_steps": new_state.skipped_steps,
                "nonfinite_steps": new_state.nonfinite_steps,
                **aux,
            }
            return new_state, metrics

        n_data = self.mesh.shape["data"]
        bs = next(iter(example_batch.values())).shape[0]
        if bs % n_data != 0:
            raise ValueError(
                f"batch size {bs} must be divisible by the data-mesh size "
                f"{n_data} (shard the global batch across devices)"
            )
        batch_spec = self.batch_shardings(example_batch)
        repl = NamedSharding(self.mesh, P())
        return jax.jit(
            train_step,
            in_shardings=(None, batch_spec),
            out_shardings=(None, repl),
            donate_argnums=(0,),
        )

    def train_step(self, state, batch):
        if self._train_step is None:
            self._train_step = self._build_train_step(batch)
        return self._train_step(state, batch)

    def eval_step(self, params, batch):
        # Shard the eval batch over the data axis like the train step
        # (otherwise a pod would run eval replicated on one device's
        # worth of work per host). Falls back to an unsharded jit when
        # the eval batch does not divide the mesh. Cached per divisibility +
        # key set: a later batch with a different leading dim or keys must
        # not reuse shardings derived from the first batch.
        n_data = self.mesh.shape["data"]
        bs = next(iter(batch.values())).shape[0]
        cache_key = (bs % n_data == 0, tuple(sorted(batch.keys())))
        if self._eval_step is None:
            self._eval_step = {}
        if cache_key not in self._eval_step:
            if cache_key[0]:
                self._eval_step[cache_key] = jax.jit(
                    self.eval_outputs,
                    in_shardings=(None, self.batch_shardings(batch)),
                )
            else:
                self._eval_step[cache_key] = jax.jit(self.eval_outputs)
        return self._eval_step[cache_key](params, batch)

    # ------------------------------------------------------------------ loop
    def fit(
        self,
        state: AsrTrainState,
        train_iter: Iterable[Dict[str, np.ndarray]],
        eval_fn: Optional[Callable[[AsrTrainState], Dict[str, float]]] = None,
        hooks: Optional[Iterable[Callable[[int, Dict[str, Any]], None]]] = None,
    ) -> AsrTrainState:
        cfg = self.config
        hooks = list(hooks or [])
        best_metric, best_step, patience_left = None, 0, cfg.early_stopping_patience
        t0 = time.time()
        audio_samples = 0
        nan_dumped = False

        profiling = False
        for batch in train_iter:
            step = int(state.step)
            if step >= cfg.max_steps:
                break
            if cfg.profile_steps > 0:
                if step == cfg.profile_start and not profiling:
                    jax.profiler.start_trace(cfg.profile_dir)
                    profiling = True
                elif profiling and step >= cfg.profile_start + cfg.profile_steps:
                    jax.profiler.stop_trace()
                    profiling = False
                    logger.info("profiler trace written to %s", cfg.profile_dir)
            n_audio = batch.pop("_num_audio_samples", None)
            state, metrics = self.train_step(state, batch)
            if n_audio is not None:
                audio_samples += int(n_audio)
            else:
                for key in ("input_values_lengths", "input_lengths", "label_lengths"):
                    if key in batch:
                        audio_samples += int(np.sum(batch[key]))
                        break
                else:
                    audio_samples += int(np.prod(batch["input_ids"].shape))

            if (step + 1) % cfg.log_every == 0:
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                dt = time.time() - t0
                m["throughput"] = audio_samples / max(dt, 1e-6)
                logger.info("step %d: %s", step + 1, m)
                for h in hooks:
                    h(step + 1, m)
                # Post-mortem on first non-finite gradient (reference
                # GradAwareTrainer dumps optimizer/inputs/model on NaN,
                # training_utils.py:107-114). The guard already cancelled
                # the update, so params/opt here are the pre-NaN state;
                # `batch` is log-window granular, not the exact offender.
                if (
                    not nan_dumped
                    and m.get("nonfinite_steps", 0) > 0
                    and cfg.checkpoint_dir
                ):
                    nan_dumped = True
                    self._dump_nan_postmortem(state, batch, step + 1)

            if eval_fn is not None and (step + 1) % cfg.eval_every == 0:
                eval_metrics = eval_fn(state)
                logger.info("eval @%d: %s", step + 1, eval_metrics)
                for h in hooks:
                    h(step + 1, {f"eval/{k}": v for k, v in eval_metrics.items()})
                if cfg.early_stopping_patience > 0:
                    val = eval_metrics.get(cfg.metric_for_best.replace("eval_", ""))
                    if val is not None:
                        better = (
                            best_metric is None
                            or (val > best_metric) == cfg.greater_is_better
                        )
                        if better:
                            best_metric, best_step = val, step + 1
                            patience_left = cfg.early_stopping_patience
                        else:
                            patience_left -= 1
                            if patience_left <= 0:
                                logger.info(
                                    "early stop at %d (best %s=%s @%d)",
                                    step + 1, cfg.metric_for_best, best_metric, best_step,
                                )
                                break

            if cfg.checkpoint_dir and (step + 1) % cfg.save_every == 0:
                self.save_checkpoint(state)
        return state

    def _dump_nan_postmortem(self, state: AsrTrainState, batch, step: int):
        """Write params/opt-state/batch to <checkpoint_dir>/nan_postmortem/
        for offline diagnosis of non-finite gradients."""
        import os

        from flax import serialization

        out = os.path.join(self.config.checkpoint_dir, "nan_postmortem")
        os.makedirs(out, exist_ok=True)
        host_state = jax.device_get(state)
        with open(os.path.join(out, "params.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(host_state.params))
        with open(os.path.join(out, "opt_state.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(host_state.opt_state))
        np.savez(
            os.path.join(out, "batch.npz"),
            step=np.asarray(step),
            **{k: np.asarray(v) for k, v in batch.items()},
        )
        logger.warning("non-finite gradients: post-mortem dumped to %s", out)

    # ---------------------------------------------------------- checkpoints
    @property
    def checkpoint_manager(self):
        if self._ckpt_mgr is None:
            import orbax.checkpoint as ocp

            self._ckpt_mgr = ocp.CheckpointManager(
                self.config.checkpoint_dir,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=self.config.keep_checkpoints, create=True
                ),
            )
        return self._ckpt_mgr

    def save_checkpoint(self, state: AsrTrainState):
        import orbax.checkpoint as ocp

        self.checkpoint_manager.save(
            int(state.step),
            args=ocp.args.StandardSave(
                {"params": state.params, "opt_state": state.opt_state, "step": state.step}
            ),
        )
        self.checkpoint_manager.wait_until_finished()

    def restore_checkpoint(self, state: AsrTrainState, step: Optional[int] = None):
        import orbax.checkpoint as ocp

        mgr = self.checkpoint_manager
        step = step if step is not None else mgr.latest_step()
        restored = mgr.restore(
            step,
            args=ocp.args.StandardRestore(
                {"params": state.params, "opt_state": state.opt_state, "step": state.step}
            ),
        )
        return state.replace(
            params=restored["params"], opt_state=restored["opt_state"], step=restored["step"]
        )


    def _maybe_spec_augment(self, aug_rng, feats, lengths, step):
        """SpecAugment inside the step, honoring delayed activation."""
        cfg = self.config
        if cfg.spec_augment is None:
            return feats
        aug = spec_augment(aug_rng, feats, lengths, cfg.spec_augment)
        if cfg.spec_augment_start_step > 0:
            return jnp.where(step >= cfg.spec_augment_start_step, aug, feats)
        return aug


class CTCTrainer(BaseTrainer):
    """CTC encoder training over waveform or mel-feature batches."""

    def loss_and_metrics(self, params, batch, aug_rng, dropout_rng, step):
        feats, lengths = self._featurize(batch)
        feats = self._maybe_spec_augment(aug_rng, feats, lengths, step)
        out = self.model.apply(
            {"params": params},
            feats,
            lengths,
            labels=batch["labels"],
            label_lengths=batch["label_lengths"],
            deterministic=False,
            rngs={"dropout": dropout_rng},
        )
        return out.loss, {}

    def eval_outputs(self, params, batch):
        feats, lengths = self._featurize(batch)
        out = self.model.apply(
            {"params": params},
            feats,
            lengths,
            labels=batch.get("labels"),
            label_lengths=batch.get("label_lengths"),
            deterministic=True,
        )
        # blank = last index for the E-Branchformer family (reference
        # convention); Whisper-CTC models carry an explicit blank_token_id.
        blank = getattr(self.model.config, "blank_token_id", -1)
        tokens, token_lengths = ctc_greedy_decode(
            out.logits, out.logit_lengths, blank_id=blank
        )
        return {
            "loss": out.loss if out.loss is not None else jnp.zeros(()),
            "tokens": tokens,
            "token_lengths": token_lengths,
        }


class LLMASRTrainer(BaseTrainer):
    """LLM-ASR training (Whisper-CTC encoder → soft-prompted causal LLM;
    reference trains these through its CTC trainer with recipe-local models,
    recipes_v0.0.1/librispeech_whisper_ctc/local_models.py:10-243)."""

    def _init_args(self, batch):
        feats, lengths = super()._init_args(batch)[0]
        return (feats, lengths), {
            "labels": jnp.asarray(batch["labels"]),
            "label_lengths": jnp.asarray(batch["label_lengths"]),
        }

    def loss_and_metrics(self, params, batch, aug_rng, dropout_rng, step):
        feats, lengths = self._featurize(batch)
        feats = self._maybe_spec_augment(aug_rng, feats, lengths, step)
        out = self.model.apply(
            {"params": params},
            feats,
            lengths,
            labels=batch["labels"],
            label_lengths=batch["label_lengths"],
            deterministic=False,
            rngs={"dropout": dropout_rng},
        )
        metrics = {}
        if out.enc_loss is not None:
            metrics["enc_loss"] = out.enc_loss
        return out.loss, metrics

    def eval_outputs(self, params, batch):
        from huggingface_asr_tpu.models.llm_asr import llm_asr_greedy_decode

        feats, lengths = self._featurize(batch)
        out = self.model.apply(
            {"params": params},
            feats,
            lengths,
            labels=batch.get("labels"),
            label_lengths=batch.get("label_lengths"),
            deterministic=True,
        )
        max_len = batch["labels"].shape[1] if "labels" in batch else 48
        tokens, token_lengths = llm_asr_greedy_decode(
            self.model, params, feats, lengths, max_len=max_len
        )
        return {
            "loss": out.loss if out.loss is not None else jnp.zeros(()),
            "tokens": tokens,
            "token_lengths": token_lengths,
        }


class JointTrainer(BaseTrainer):
    """DeCRED/ED training with enc/dec loss component tracking."""

    def _init_args(self, batch):
        feats, lengths = (
            (jnp.asarray(batch["input_features"]), jnp.asarray(batch["input_lengths"]))
            if "input_features" in batch
            else self.frontend(
                jnp.asarray(batch["input_values"]),
                jnp.asarray(batch["input_values_lengths"]),
            )
        )
        return (feats, lengths), {
            "labels": jnp.asarray(batch["labels"]),
            "label_lengths": jnp.asarray(batch["label_lengths"]),
        }

    def loss_and_metrics(self, params, batch, aug_rng, dropout_rng, step):
        feats, lengths = self._featurize(batch)
        feats = self._maybe_spec_augment(aug_rng, feats, lengths, step)
        out = self.model.apply(
            {"params": params},
            feats,
            lengths,
            labels=batch["labels"],
            label_lengths=batch["label_lengths"],
            deterministic=False,
            rngs={"dropout": dropout_rng},
        )
        return out.loss, {"enc_loss": out.enc_loss, "dec_loss": out.dec_loss}

    def eval_outputs(self, params, batch):
        feats, lengths = self._featurize(batch)
        out = self.model.apply(
            {"params": params},
            feats,
            lengths,
            labels=batch.get("labels"),
            label_lengths=batch.get("label_lengths"),
            deterministic=True,
        )
        return {
            "loss": out.loss,
            "enc_loss": out.enc_loss,
            "dec_loss": out.dec_loss,
        }


class BestRQTrainer(BaseTrainer):
    """BEST-RQ pretraining: loss ÷ masked count + SSL stats
    (reference SSLTrainer, training_utils.py:207-283).

    The frozen RPQ projection/codebook live in ``self.buffers``; they are
    deterministic from the config, created lazily on first use (so a fresh
    trainer can restore a checkpoint without calling ``init_params``) and
    saved/restored with checkpoints for explicitness."""

    @property
    def buffers(self):
        if getattr(self, "_buffers", None) is None:
            from huggingface_asr_tpu.models.bestrq import make_bestrq_buffers

            self._buffers = make_bestrq_buffers(self.model.config)
        return self._buffers

    @buffers.setter
    def buffers(self, value):
        self._buffers = value

    def save_checkpoint(self, state):
        import orbax.checkpoint as ocp

        self.checkpoint_manager.save(
            int(state.step),
            args=ocp.args.StandardSave({
                "params": state.params, "opt_state": state.opt_state,
                "step": state.step, "buffers": jax.device_get(self.buffers),
            }),
        )
        self.checkpoint_manager.wait_until_finished()

    def restore_checkpoint(self, state, step=None):
        import orbax.checkpoint as ocp

        mgr = self.checkpoint_manager
        step = step if step is not None else mgr.latest_step()
        template = {
            "params": state.params, "opt_state": state.opt_state,
            "step": state.step, "buffers": jax.device_get(self.buffers),
        }
        try:
            restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
            self.buffers = restored["buffers"]
        except (KeyError, ValueError):
            # Pre-round-4 checkpoints (BaseTrainer format) lack 'buffers';
            # they are deterministic from the config, so the lazily created
            # ones are already correct.
            del template["buffers"]
            restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
        return state.replace(
            params=restored["params"], opt_state=restored["opt_state"],
            step=restored["step"],
        )

    def _init_args(self, batch):
        feats, lengths = (
            (jnp.asarray(batch["input_features"]), jnp.asarray(batch["input_lengths"]))
            if "input_features" in batch
            else self.frontend(
                jnp.asarray(batch["input_values"]),
                jnp.asarray(batch["input_values_lengths"]),
            )
        )
        return (feats, lengths, jnp.asarray(batch["mask_time_indices"])), {}

    def init_params(self, example_batch):
        rng = jax.random.key(self.config.seed)
        args, kwargs = self._init_args(example_batch)
        variables = self.model.init(
            {"params": rng, "mask_noise": jax.random.key(1)}, *args, **kwargs
        )
        self.buffers = variables.get("buffers", {}) or None
        return variables["params"]

    def loss_and_metrics(self, params, batch, aug_rng, dropout_rng, step):
        feats, lengths = self._featurize(batch)
        out = self.model.apply(
            {"params": params, "buffers": self.buffers},
            feats,
            lengths,
            batch["mask_time_indices"].astype(bool),
            deterministic=False,
            rngs={"dropout": dropout_rng, "mask_noise": aug_rng},
        )
        loss = out.loss / jnp.maximum(out.num_masked, 1)
        frac_masked = out.num_masked / (
            batch["mask_time_indices"].shape[0] * batch["mask_time_indices"].shape[1]
        )
        return loss, {"num_masked": out.num_masked.astype(jnp.float32),
                      "percent_masked": 100.0 * frac_masked}

    def eval_outputs(self, params, batch):
        feats, lengths = self._featurize(batch)
        out = self.model.apply(
            {"params": params, "buffers": self.buffers},
            feats,
            lengths,
            batch["mask_time_indices"].astype(bool),
            deterministic=True,
            rngs={"mask_noise": jax.random.key(0)},
        )
        return {"loss": out.loss / jnp.maximum(out.num_masked, 1)}


class Wav2Vec2SSLTrainer(BaseTrainer):
    """Contrastive SSL with per-step Gumbel temperature decay."""

    def gumbel_temperature(self, step):
        cfg = self.config
        return jnp.maximum(
            cfg.gumbel_temperature_start * cfg.gumbel_temperature_decay ** step,
            cfg.gumbel_temperature_end,
        )

    def _init_args(self, batch):
        feats, lengths = (
            (jnp.asarray(batch["input_features"]), jnp.asarray(batch["input_lengths"]))
            if "input_features" in batch
            else self.frontend(
                jnp.asarray(batch["input_values"]),
                jnp.asarray(batch["input_values_lengths"]),
            )
        )
        return (
            feats,
            lengths,
            jnp.asarray(batch["mask_time_indices"]).astype(bool),
            jnp.asarray(batch["sampled_negative_indices"]),
        ), {}

    def init_params(self, example_batch):
        rng = jax.random.key(self.config.seed)
        args, kwargs = self._init_args(example_batch)
        variables = self.model.init(
            {"params": rng, "gumbel": jax.random.key(1)}, *args,
            deterministic=False, **kwargs,
        )
        return variables["params"]

    def loss_and_metrics(self, params, batch, aug_rng, dropout_rng, step):
        feats, lengths = self._featurize(batch)
        out = self.model.apply(
            {"params": params},
            feats,
            lengths,
            batch["mask_time_indices"].astype(bool),
            batch["sampled_negative_indices"],
            gumbel_temperature=self.gumbel_temperature(step),
            deterministic=False,
            rngs={"dropout": dropout_rng, "gumbel": aug_rng},
        )
        loss = out.loss / jnp.maximum(out.num_masked, 1)
        return loss, {
            "contrastive_loss": out.contrastive_loss / jnp.maximum(out.num_masked, 1),
            "diversity_loss": out.diversity_loss,
            "codevector_perplexity": out.codevector_perplexity,
            "gumbel_temperature": self.gumbel_temperature(step),
        }

    def eval_outputs(self, params, batch):
        feats, lengths = self._featurize(batch)
        out = self.model.apply(
            {"params": params},
            feats,
            lengths,
            batch["mask_time_indices"].astype(bool),
            batch["sampled_negative_indices"],
            deterministic=True,
        )
        return {"loss": out.loss / jnp.maximum(out.num_masked, 1)}


class Seq2SeqTrainer(BaseTrainer):
    """Plain encoder-decoder CE training (Whisper AED fine-tune — the
    reference trains HF WhisperForConditionalGeneration directly,
    train_enc_dec_asr.py:82-85)."""

    def _init_args(self, batch):
        feats, lengths = (
            (jnp.asarray(batch["input_features"]), jnp.asarray(batch["input_lengths"]))
            if "input_features" in batch
            else self.frontend(
                jnp.asarray(batch["input_values"]),
                jnp.asarray(batch["input_values_lengths"]),
            )
        )
        return (feats, lengths), {
            "labels": jnp.asarray(batch["labels"]),
            "label_lengths": jnp.asarray(batch["label_lengths"]),
        }

    def loss_and_metrics(self, params, batch, aug_rng, dropout_rng, step):
        feats, lengths = self._featurize(batch)
        feats = self._maybe_spec_augment(aug_rng, feats, lengths, step)
        out = self.model.apply(
            {"params": params},
            feats,
            lengths,
            labels=batch["labels"],
            label_lengths=batch["label_lengths"],
            deterministic=False,
            rngs={"dropout": dropout_rng},
        )
        return out.loss, {}

    def eval_outputs(self, params, batch):
        feats, lengths = self._featurize(batch)
        out = self.model.apply(
            {"params": params},
            feats,
            lengths,
            labels=batch.get("labels"),
            label_lengths=batch.get("label_lengths"),
            deterministic=True,
        )
        return {"loss": out.loss}
