"""huggingface_asr_tpu — a TPU-native (JAX/XLA/Pallas) ASR framework.

Re-implements the capabilities of BUTSpeechFIT/huggingface_asr (reference at
/root/reference) with a TPU-first design: fused XLA/Pallas feature extraction,
Flax model zoo (E-Branchformer CTC, joint CTC+attention encoder-decoder /
DeCRED, BEST-RQ SSL), batched jit-compiled decoders, and pjit/shard_map data
parallel training over a jax.sharding.Mesh.
"""

__version__ = "0.1.0"
