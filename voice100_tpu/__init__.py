"""voice100_tpu: a TPU-native JAX speech framework.

A from-scratch rebuild of the capabilities of kaiidams/voice100
(non-autoregressive TTS via align + audio models over WORLD vocoder
features, CTC ASR over log-mel spectrograms, and CTC forced alignment),
designed TPU-first:

* models are pure functions over parameter pytrees (compiled once by XLA,
  static padded/bucketed shapes, no data-dependent Python control flow),
* the audio front-end (STFT + mel + log) and the WORLD vocoder
  analysis/synthesis run on-device as batched JAX DSP,
* CTC loss and CTC Viterbi forced alignment are log-semiring
  ``lax.scan`` programs instead of per-utterance CPU loops,
* training scales data-parallel over a ``jax.sharding.Mesh`` with
  optional tensor-parallel sharding of the wide recurrent/conv weights.

Reference behavior citations in docstrings point into kaiidams/voice100
(``file:line``), which this project re-implements but does not copy.
"""

__version__ = "0.1.0"
