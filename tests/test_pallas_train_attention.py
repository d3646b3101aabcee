"""Custom-VJP training attention kernel (factored rel-pos form): fwd/grad
parity vs the XLA path (interpret mode — the CPU analogue of Mosaic)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from huggingface_asr_tpu.ops.pallas_train_attention import rel_attention_train

B, T, H, dh, D = 2, 32, 2, 8, 16


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)  # noqa: E731
    q_u = mk(B, T, H, dh)
    q_rot = mk(B, T, H, D)
    k = mk(B, T, H, dh)
    v = mk(B, T, H, dh)
    k_std = mk(T, D)
    lengths = jnp.asarray([T, T - 10], jnp.int32)
    return q_u, q_rot, k, v, k_std, lengths


def _reference(q_u, q_rot, k, v, k_std, lengths):
    ac = jnp.einsum("bthd,bshd->bhts", q_u, k).astype(jnp.float32)
    bd = jnp.einsum("bthD,sD->bhts", q_rot, k_std).astype(jnp.float32)
    scores = (ac + bd) / np.sqrt(dh)
    maskc = jnp.arange(T)[None, None, None, :] < lengths[:, None, None, None]
    scores = jnp.where(maskc, scores, -1e9)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v)


def test_forward_matches_reference():
    args = _inputs()
    out = rel_attention_train(*args, jnp.int32(0), 0.0, True)
    ref = _reference(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_gradients_match_reference():
    args = _inputs()
    lengths = args[5]
    cot = jnp.asarray(
        np.random.default_rng(7).standard_normal((B, T, H, dh)), jnp.float32
    )

    def loss_kernel(q_u, q_rot, k, v, k_std):
        out = rel_attention_train(q_u, q_rot, k, v, k_std, lengths,
                                  jnp.int32(0), 0.0, True)
        return jnp.sum(out * cot)

    def loss_ref(q_u, q_rot, k, v, k_std):
        return jnp.sum(_reference(q_u, q_rot, k, v, k_std, lengths) * cot)

    g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(*args[:5])
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args[:5])
    for name, a, b in zip(["dq_u", "dq_rot", "dk", "dv"], g_kernel, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_dropout_deterministic_and_fd_consistent():
    """Same seed -> identical output; autodiff matches finite differences
    (proves the backward regenerates the SAME dropout mask)."""
    q_u, q_rot, k, v, k_std, lengths = _inputs()
    rate = 0.4
    seed = jnp.int32(123)

    out1 = rel_attention_train(q_u, q_rot, k, v, k_std, lengths, seed, rate, True)
    out2 = rel_attention_train(q_u, q_rot, k, v, k_std, lengths, seed, rate, True)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = rel_attention_train(q_u, q_rot, k, v, k_std, lengths, jnp.int32(7),
                               rate, True)
    assert not np.array_equal(np.asarray(out1), np.asarray(out3))
    out0 = rel_attention_train(q_u, q_rot, k, v, k_std, lengths, seed, 0.0, True)
    assert not np.array_equal(np.asarray(out1), np.asarray(out0))

    cot = jnp.asarray(
        np.random.default_rng(3).standard_normal((B, T, H, dh)), jnp.float32
    )

    def loss(q_u, q_rot, k, v, k_std):
        return jnp.sum(
            rel_attention_train(q_u, q_rot, k, v, k_std, lengths, seed, rate, True)
            * cot
        )

    g = jax.grad(loss)(q_u, q_rot, k, v, k_std)
    eps = 1e-3
    dq = np.zeros_like(np.asarray(q_u))
    dq[0, 3, 1, 2] = eps
    lp = loss(q_u + dq, q_rot, k, v, k_std)
    lm = loss(q_u - dq, q_rot, k, v, k_std)
    fd = float((lp - lm) / (2 * eps))
    ad = float(np.asarray(g)[0, 3, 1, 2])
    assert abs(fd - ad) < 5e-3 * max(1.0, abs(fd)), (fd, ad)


def test_flax_attention_pallas_train_path():
    """EBranchformerForCTC with attention_impl='pallas': the training step
    (deterministic=False) runs through the custom-VJP kernel and produces
    loss/grads matching the XLA path when dropout=0."""
    import dataclasses

    from huggingface_asr_tpu.models.configs import EBranchformerConfig
    from huggingface_asr_tpu.models.ebranchformer import EBranchformerForCTC
    import huggingface_asr_tpu.ops.pallas_train_attention as _m

    cfg = EBranchformerConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=64, conv_dim=(8, 8), conv_kernel=(3, 3),
        conv_stride=(2, 2), conv_padding=(1, 1), vocab_size=30,
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        final_dropout=0.0, csgu_conv_dropout=0.0,
    )
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((2, 64, 80)), jnp.float32)
    lens = jnp.asarray([64, 40], jnp.int32)
    labels = jnp.asarray(rng.integers(1, 30, (2, 5)), jnp.int32)
    llens = jnp.asarray([5, 5], jnp.int32)

    model_x = EBranchformerForCTC(cfg)
    params = model_x.init(jax.random.key(0), feats, lens)["params"]

    def loss_with(impl):
        m = EBranchformerForCTC(dataclasses.replace(cfg, attention_impl=impl))

        def f(p):
            return m.apply(
                {"params": p}, feats, lens, labels=labels, label_lengths=llens,
                deterministic=False, rngs={"dropout": jax.random.key(1)},
            ).loss
        return f

    # interpret mode for the kernel on CPU: the model re-imports the module
    # attribute at each call, so patching the module attr is sufficient
    orig = _m.rel_attention_train
    _m.rel_attention_train = lambda *a: orig(*a, True)
    try:
        loss_p, grads_p = jax.value_and_grad(loss_with("pallas"))(params)
    finally:
        _m.rel_attention_train = orig
    loss_x, grads_x = jax.value_and_grad(loss_with("xla"))(params)
    assert np.isfinite(float(loss_p)) and np.isfinite(float(loss_x))
    np.testing.assert_allclose(float(loss_p), float(loss_x), rtol=1e-4)
    flat_p = {
        jax.tree_util.keystr(kp): v
        for kp, v in jax.tree_util.tree_leaves_with_path(grads_p)
    }
    flat_x = {
        jax.tree_util.keystr(kp): v
        for kp, v in jax.tree_util.tree_leaves_with_path(grads_x)
    }
    assert set(flat_p) == set(flat_x)
    for name in sorted(flat_p):
        np.testing.assert_allclose(
            np.asarray(flat_p[name]), np.asarray(flat_x[name]),
            rtol=5e-3, atol=5e-4, err_msg=name,
        )
