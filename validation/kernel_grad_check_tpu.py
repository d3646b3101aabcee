"""On-chip gradient validation of the custom-VJP training attention kernel.

The interpret-mode tests (tests/test_pallas_train_attention.py) cannot
exercise the pltpu hardware-PRNG dropout path. This runs ON THE TPU:

1. determinism: same seed -> bit-identical outputs across two calls;
2. fwd/bwd mask consistency: finite differences vs autodiff on several
   coordinates WITH dropout active (if the backward regenerated a different
   mask than the forward, FD and AD would disagree);
3. no-dropout grad parity vs the XLA reference formulation.

  python validation/kernel_grad_check_tpu.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

    from huggingface_asr_tpu.ops.pallas_train_attention import rel_attention_train

    B, T, H, dh, D = 2, 64, 2, 16, 32
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)  # noqa: E731
    q_u, q_rot, k, v = mk(B, T, H, dh), mk(B, T, H, D), mk(B, T, H, dh), mk(B, T, H, dh)
    k_std = mk(T, D)
    lengths = jnp.asarray([T, T - 13], jnp.int32)
    rate = 0.3
    seed = jnp.int32(42)

    out1 = np.asarray(rel_attention_train(q_u, q_rot, k, v, k_std, lengths, seed, rate))
    out2 = np.asarray(rel_attention_train(q_u, q_rot, k, v, k_std, lengths, seed, rate))
    det_ok = bool((out1 == out2).all())

    cot = mk(B, T, H, dh)

    @jax.jit
    def loss(q_u, q_rot, k, v):
        return jnp.sum(
            rel_attention_train(q_u, q_rot, k, v, k_std, lengths, seed, rate) * cot
        )

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(q_u, q_rot, k, v)
    g = [np.asarray(x) for x in g]

    # FD on a handful of coordinates of each input
    results = []
    coords = [(0, (0, 3, 1, 2)), (0, (1, 10, 0, 7)), (1, (0, 5, 1, 9)),
              (2, (1, 20, 0, 3)), (3, (0, 30, 1, 11))]
    args = [q_u, q_rot, k, v]
    eps = 2e-3
    for ai, idx in coords:
        d = np.zeros(np.asarray(args[ai]).shape, np.float32)
        d[idx] = eps
        pert = [a if i != ai else a + jnp.asarray(d) for i, a in enumerate(args)]
        lp = float(loss(*pert))
        pert = [a if i != ai else a - jnp.asarray(d) for i, a in enumerate(args)]
        lm = float(loss(*pert))
        fd = (lp - lm) / (2 * eps)
        ad = float(g[ai][idx])
        results.append({
            "arg": ai, "fd": round(fd, 5), "ad": round(ad, 5),
            "ok": bool(abs(fd - ad) < 5e-2 * max(1.0, abs(fd))),
        })

    # no-dropout parity vs XLA reference
    def reference(q_u, q_rot, k, v):
        ac = jnp.einsum("bthd,bshd->bhts", q_u, k).astype(jnp.float32)
        bd = jnp.einsum("bthD,sD->bhts", q_rot, k_std).astype(jnp.float32)
        scores = (ac + bd) / np.sqrt(dh)
        maskc = jnp.arange(T)[None, None, None, :] < lengths[:, None, None, None]
        scores = jnp.where(maskc, scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        return jnp.einsum("bhts,bshd->bthd", probs, v)

    def l0(q_u, q_rot, k, v):
        return jnp.sum(
            rel_attention_train(q_u, q_rot, k, v, k_std, lengths, seed, 0.0) * cot
        )

    def lr_(q_u, q_rot, k, v):
        return jnp.sum(reference(q_u, q_rot, k, v) * cot)

    g0 = jax.jit(jax.grad(l0, argnums=(0, 1, 2, 3)))(q_u, q_rot, k, v)
    gr = jax.jit(jax.grad(lr_, argnums=(0, 1, 2, 3)))(q_u, q_rot, k, v)
    max_rel = 0.0
    for a, b in zip(g0, gr):
        a, b = np.asarray(a), np.asarray(b)
        max_rel = max(max_rel, float(np.max(np.abs(a - b) / (np.abs(b) + 1e-3))))

    print(json.dumps({
        "deterministic_same_seed": det_ok,
        "fd_vs_ad_dropout": results,
        "all_fd_ok": all(r["ok"] for r in results),
        "nodrop_grad_max_rel_err_vs_xla": round(max_rel, 6),
    }))


if __name__ == "__main__":
    main()
