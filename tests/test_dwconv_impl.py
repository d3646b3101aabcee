"""dwconv_impl="slice" must be a drop-in for the grouped-conv lowering:
same param tree, same function (fp tolerance), same gradients.

Reference behavior: torch nn.Conv1d(groups=C) inside the cgMLP CSGU and the
merge fusion (reference src/models/encoders/e_branchformer.py); here the two
evaluations of our own module must agree so training can flip to "slice"
purely for step time.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from huggingface_asr_tpu.models.configs import EBranchformerConfig
from huggingface_asr_tpu.models.ebranchformer import EBranchformerForCTC


def _tiny_cfg(**kw):
    return EBranchformerConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=(32, 32), conv_kernel=(3, 3),
        conv_stride=(2, 2), conv_padding=(1, 1), vocab_size=40,
        csgu_kernel_size=7, merge_conv_kernel=7, **kw,
    )


@pytest.mark.parametrize("causal", [False, True])
def test_slice_dwconv_matches_grouped_conv(causal):
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((2, 50, 80)).astype(np.float32))
    lengths = jnp.array([50, 37], jnp.int32)

    cfg_conv = _tiny_cfg(is_causal=causal)
    cfg_slice = dataclasses.replace(cfg_conv, dwconv_impl="slice")
    m_conv = EBranchformerForCTC(cfg_conv)
    m_slice = EBranchformerForCTC(cfg_slice)

    params = m_conv.init(jax.random.PRNGKey(0), feats, lengths)["params"]
    params_s = m_slice.init(jax.random.PRNGKey(0), feats, lengths)["params"]
    # identical tree: checkpoints interchangeable between the two impls
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_s)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params_s)):
        assert a.shape == b.shape

    out_c = m_conv.apply({"params": params}, feats, lengths).logits
    out_s = m_slice.apply({"params": params}, feats, lengths).logits
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_s),
                               rtol=1e-5, atol=1e-5)


def test_slice_dwconv_gradient_parity():
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((2, 50, 80)).astype(np.float32))
    lengths = jnp.array([50, 44], jnp.int32)
    labels = jnp.asarray(rng.integers(1, 40, (2, 8)), jnp.int32)
    lab_len = jnp.array([8, 6], jnp.int32)

    cfg_conv = _tiny_cfg()
    cfg_slice = dataclasses.replace(cfg_conv, dwconv_impl="slice")
    m_conv = EBranchformerForCTC(cfg_conv)
    m_slice = EBranchformerForCTC(cfg_slice)
    params = m_conv.init(jax.random.PRNGKey(0), feats, lengths)["params"]

    def loss(model, p):
        out = model.apply({"params": p}, feats, lengths, labels=labels,
                          label_lengths=lab_len)
        return out.loss

    g_c = jax.grad(lambda p: loss(m_conv, p))(params)
    g_s = jax.grad(lambda p: loss(m_slice, p))(params)
    flat_c, flat_s = jax.tree.leaves(g_c), jax.tree.leaves(g_s)
    for a, b in zip(flat_c, flat_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
