"""Training loop: 8-device DP mesh train step, anomaly guard, FSDP shardings."""

import dataclasses

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


def test_gradient_accumulation_matches_big_batch(mesh8):
    """N accumulated micro-steps == one big-batch step (same updated params).

    Guards the gradient_accumulation_steps wiring (reference recipes depend on
    accumulation, e.g. recipes/librispeech/train_ctc.sh).
    """
    big = _batch(B=16)
    micro1 = {k: v[:8] for k, v in big.items()}
    micro2 = {k: v[8:] for k, v in big.items()}

    def cfg(accum):
        return TrainerConfig(
            optimizer=OptimizerConfig(
                learning_rate=1e-3, warmup_steps=0, total_steps=10,
                max_grad_norm=1e9, gradient_accumulation_steps=accum,
            ),
            spec_augment=None,
        )

    nodrop = dataclasses.replace(
        TINY, hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0, csgu_conv_dropout=0.0,
    )
    t_accum = CTCTrainer(EBranchformerForCTC(nodrop), cfg(2), mesh=mesh8)
    t_big = CTCTrainer(EBranchformerForCTC(nodrop), cfg(1), mesh=mesh8)

    s_accum = t_accum.init_state(micro1)
    # Snapshot to host (the jitted step donates the state buffers).
    params0 = jax.tree.map(lambda x: np.array(x), s_accum.params)
    s_big = t_big.make_state(jax.tree.map(jnp.asarray, params0))

    # Disable dropout-rng divergence: deterministic tiny config has no dropout.
    s_accum, m1 = t_accum.train_step(s_accum, micro1)
    # After the first micro step, params must be UNCHANGED (update held).
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        s_accum.params, params0,
    )
    s_accum, m2 = t_accum.train_step(s_accum, micro2)
    s_big, mb = t_big.train_step(s_big, big)

    flat_a = jax.tree_util.tree_leaves(s_accum.params)
    flat_b = jax.tree_util.tree_leaves(s_big.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)


def test_nan_postmortem_dump(mesh8, tmp_path):
    """First non-finite gradient dumps params/opt/batch for offline diagnosis
    (reference GradAwareTrainer NaN dump, training_utils.py:107-114)."""
    import os

    trainer = _trainer(
        mesh8, checkpoint_dir=str(tmp_path / "ckpt"), log_every=1, max_steps=1,
    )
    batch = _batch()
    batch["input_features"][0, 0, 0] = np.inf  # poison one element
    state = trainer.init_state(batch)
    state = trainer.fit(state, iter([batch]))
    out = tmp_path / "ckpt" / "nan_postmortem"
    assert int(state.nonfinite_steps) == 1
    assert (out / "params.msgpack").exists()
    assert (out / "opt_state.msgpack").exists()
    assert (out / "batch.npz").exists()
    dumped = np.load(out / "batch.npz")
    assert not np.isfinite(dumped["input_features"]).all()
