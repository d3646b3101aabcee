"""Training loop: 8-device DP mesh train step, anomaly guard, FSDP shardings."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from huggingface_asr_tpu.models.configs import EBranchformerConfig
from huggingface_asr_tpu.models.ebranchformer import EBranchformerForCTC
from huggingface_asr_tpu.ops.spec_augment import SpecAugmentConfig
from huggingface_asr_tpu.parallel.mesh import MeshConfig, make_mesh
from huggingface_asr_tpu.training.loop import CTCTrainer, TrainerConfig
from huggingface_asr_tpu.training.optim import OptimizerConfig

TINY = EBranchformerConfig(
    hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
    intermediate_size=64, conv_dim=(8, 8), conv_kernel=(3, 3),
    conv_stride=(2, 2), conv_padding=(1, 1), vocab_size=30,
)


def _batch(B=8, T=50, L=5):
    rng = np.random.default_rng(0)
    return {
        "input_features": rng.standard_normal((B, T, 80)).astype(np.float32),
        "input_lengths": np.full((B,), T, np.int32),
        "labels": rng.integers(0, 30, (B, L)).astype(np.int32),
        "label_lengths": np.full((B,), L, np.int32),
    }


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(MeshConfig(data=8))


def _trainer(mesh, **cfg_kwargs):
    cfg = TrainerConfig(
        optimizer=OptimizerConfig(learning_rate=1e-3, warmup_steps=2, total_steps=10),
        spec_augment=SpecAugmentConfig(apply_time_warp=False),
        **cfg_kwargs,
    )
    return CTCTrainer(EBranchformerForCTC(TINY), cfg, mesh=mesh)


def test_train_step_runs_and_descends(mesh8):
    trainer = _trainer(mesh8)
    batch = _batch()
    state = trainer.init_state(batch)
    losses = []
    for _ in range(5):
        state, metrics = trainer.train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # overfits a fixed batch
    assert int(state.step) == 5
    assert int(state.skipped_steps) == 0


def test_anomaly_guard_skips_step(mesh8):
    trainer = _trainer(mesh8, max_grad_norm_guard=1e-12)  # everything is anomalous
    batch = _batch()
    state = trainer.init_state(batch)
    p0 = jax.device_get(jax.tree.leaves(state.params)[0])
    state, metrics = trainer.train_step(state, batch)
    p1 = jax.device_get(jax.tree.leaves(state.params)[0])
    assert int(metrics["step_applied"]) == 0
    assert int(state.skipped_steps) == 1
    np.testing.assert_array_equal(p0, p1)  # params untouched


def test_fsdp_state_sharding(mesh8):
    trainer = CTCTrainer(
        EBranchformerForCTC(TINY),
        TrainerConfig(
            optimizer=OptimizerConfig(warmup_steps=2, total_steps=10),
            mesh=MeshConfig(data=8, fsdp=True, fsdp_min_size=128),
            spec_augment=None,
        ),
        mesh=mesh8,
    )
    batch = _batch()
    state = trainer.init_state(batch)
    # At least one large param must actually be sharded over the 8 devices.
    sharded = [
        p for p in jax.tree.leaves(state.params)
        if p.size >= 128 and not p.sharding.is_fully_replicated
    ]
    assert sharded, "FSDP produced no sharded parameters"
    # And the step still runs.
    state, metrics = trainer.train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_eval_step_decodes(mesh8):
    trainer = _trainer(mesh8)
    batch = _batch()
    state = trainer.init_state(batch)
    out = trainer.eval_step(state.params, batch)
    assert out["tokens"].shape[0] == 8
    assert np.all(np.asarray(out["token_lengths"]) >= 0)


def test_remat_matches_no_remat(mesh8):
    """Gradient checkpointing must not change loss or gradients."""
    import dataclasses

    cfg_plain = TINY
    cfg_remat = dataclasses.replace(TINY, remat=True)
    batch = _batch()
    import jax.numpy as jnp
    from huggingface_asr_tpu.ops.ctc import ctc_loss  # noqa

    feats = jnp.asarray(
        np.random.default_rng(9).standard_normal((4, 50, 80)), jnp.float32
    )
    lens = jnp.full((4,), 50, jnp.int32)
    labels = jnp.asarray(np.random.default_rng(9).integers(0, 30, (4, 5)), jnp.int32)
    llens = jnp.full((4,), 5, jnp.int32)

    m0 = EBranchformerForCTC(cfg_plain)
    m1 = EBranchformerForCTC(cfg_remat)
    params = m0.init(jax.random.key(0), feats, lens)["params"]

    def loss(m):
        def f(p):
            return m.apply({"params": p}, feats, lens, labels=labels,
                           label_lengths=llens).loss
        return f

    l0, g0 = jax.value_and_grad(loss(m0))(params)
    l1, g1 = jax.value_and_grad(loss(m1))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
