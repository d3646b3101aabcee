"""Training orchestration: pjit train/eval steps over a device mesh.

TPU-native re-design of the reference's Trainer subclasses (reference:
src/utilities/training_utils.py): the whole step — optional on-device
log-mel featurization, SpecAugment, forward, CTC loss, backward, anomaly
guard, optimizer update — is ONE compiled XLA program, sharded over the
``data`` axis of a `jax.sharding.Mesh`. Gradient sync is the XLA psum
inserted from sharding annotations; no DDP wrapper exists or is needed.
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

from huggingface_asr_tpu.models.ebranchformer import EBranchformerForCTC
from huggingface_asr_tpu.ops.ctc import ctc_greedy_decode
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


class CTCTrainer:
    """Trainer for CTC encoder models over padded mel-feature batches.

    Batches are dicts of numpy arrays:
      input_features (B, T, F) float32, input_lengths (B,) int32,
      labels (B, L) int32, label_lengths (B,) int32.
    """

    def __init__(
        self,
        model: EBranchformerForCTC,
        config: TrainerConfig = TrainerConfig(),
        mesh=None,
    ):
        self.model = model
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh(config.mesh)
        self.tx = make_optimizer(config.optimizer)
        self._train_step = None
        self._eval_step = None
        self._ckpt_mgr = None

    # ------------------------------------------------------------------ setup
    def init_state(self, example_batch: Dict[str, np.ndarray]) -> AsrTrainState:
        rng = jax.random.key(self.config.seed)
        init_rng, dropout_rng = jax.random.split(rng)
        params = self.model.init(
            init_rng,
            jnp.asarray(example_batch["input_features"]),
            jnp.asarray(example_batch["input_lengths"]),
        )["params"]
        state = AsrTrainState.create_with_guards(
            apply_fn=self.model.apply, params=params, tx=self.tx, dropout_rng=dropout_rng
        )
        # Place state on the mesh (replicated or FSDP).
        shardings = self.state_shardings(state)
        return jax.device_put(state, shardings)

    def state_shardings(self, state: AsrTrainState):
        """Sharding pytree for the whole train state.

        A single shape-driven rule covers params AND optimizer moments (mu/nu
        mirror the param shapes, so FSDP sharding applies to them uniformly).
        """
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

    # ------------------------------------------------------------- step fns
    def _build_train_step(self):
        cfg = self.config
        model = self.model

        def train_step(state: AsrTrainState, batch):
            step_rng = jax.random.fold_in(state.dropout_rng, state.step)
            aug_rng, dropout_rng = jax.random.split(step_rng)

            feats = batch["input_features"]
            if cfg.spec_augment is not None:
                feats = spec_augment(
                    aug_rng, feats, batch["input_lengths"], cfg.spec_augment
                )

            def loss_fn(params):
                out = model.apply(
                    {"params": params},
                    feats,
                    batch["input_lengths"],
                    labels=batch["labels"],
                    label_lengths=batch["label_lengths"],
                    deterministic=False,
                    rngs={"dropout": dropout_rng},
                )
                return out.loss

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            new_state, gnorm, ok = state.apply_gradients_guarded(
                grads=grads, max_grad_norm_guard=cfg.max_grad_norm_guard
            )
            metrics = {
                "loss": loss,
                "grad_norm": gnorm,
                "step_applied": ok.astype(jnp.int32),
                "skipped_steps": new_state.skipped_steps,
            }
            return new_state, metrics

        batch_spec = {
            "input_features": batch_sharding(self.mesh, 3),
            "input_lengths": batch_sharding(self.mesh, 1),
            "labels": batch_sharding(self.mesh, 2),
            "label_lengths": batch_sharding(self.mesh, 1),
        }
        repl = NamedSharding(self.mesh, P())
        return jax.jit(
            train_step,
            in_shardings=(None, batch_spec),
            out_shardings=(None, repl),
            donate_argnums=(0,),
        )

    def _build_eval_step(self):
        model = self.model

        def eval_step(params, batch):
            out = model.apply(
                {"params": params},
                batch["input_features"],
                batch["input_lengths"],
                labels=batch.get("labels"),
                label_lengths=batch.get("label_lengths"),
                deterministic=True,
            )
            tokens, token_lengths = ctc_greedy_decode(
                out.logits, out.logit_lengths, blank_id=-1
            )
            return {
                "loss": out.loss if out.loss is not None else jnp.zeros(()),
                "tokens": tokens,
                "token_lengths": token_lengths,
            }

        return jax.jit(eval_step)

    @property
    def train_step(self):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        return self._train_step

    @property
    def eval_step(self):
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        return self._eval_step

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
        frames_done = 0

        for batch in train_iter:
            step = int(state.step)
            if step >= cfg.max_steps:
                break
            state, metrics = self.train_step(state, batch)
            frames_done += int(np.sum(batch["input_lengths"]))

            if (step + 1) % cfg.log_every == 0:
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                dt = time.time() - t0
                m["frames_per_sec"] = frames_done / max(dt, 1e-6)
                logger.info("step %d: %s", step + 1, m)
                for h in hooks:
                    h(step + 1, m)

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
            args=ocp.args.StandardSave({"params": state.params, "opt_state": state.opt_state,
                                        "step": state.step}),
        )

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
