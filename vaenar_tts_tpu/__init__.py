"""VAENAR-TTS TPU: a TPU-native (JAX/Flax/pjit/Pallas) non-autoregressive TTS framework.

A from-scratch rebuild of the capabilities of thuhcsi/VAENAR-TTS
(arXiv:2107.03298): text -> mel-spectrogram with a transformer text encoder,
an attention-based VAE posterior, a Glow-style normalizing-flow prior, and a
non-autoregressive transformer decoder; Griffin-Lim vocoding; LJSpeech
(English characters) and DataBaker (Mandarin pinyin) frontends.

Design is TPU-first: static shapes via length bucketing, jit/pjit over device
meshes, fused Pallas kernels on the hot paths, Orbax checkpointing, and a
pure-functional training loop with explicit PRNG keys.
"""

__version__ = "0.1.0"
