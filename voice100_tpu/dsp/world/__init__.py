"""WORLD vocoder: analysis (host, vectorized NumPy) + synthesis (JAX).

From-scratch implementation of the capabilities the reference gets from
pyworld (voice100/vocoder.py:14-102): DIO F0, CheapTrick spectral
envelope, D4C-equivalent band aperiodicity, the 3 kHz-band aperiodicity
codec, and pitch-synchronous synthesis. Analysis runs once per corpus
and is cached (like the reference's CPU dataloader workers); synthesis
is the on-device TPU path used for TTS serving.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .dio import dio
from .cheaptrick import cheaptrick
from .aperiodicity import d4c, band_aperiodicity
from .codec import (
    code_aperiodicity,
    decode_aperiodicity,
    get_num_aperiodicities,
)
from .synthesis import synthesize, synthesize_fn
from ..mcep import create_sp2mc_matrix, create_mc2sp_matrix

# Version token for the analysis ALGORITHMS, keyed into the disk
# feature-cache salt (data/datamodule.py): bump whenever an estimator
# change makes previously-cached features incompatible with fresh ones
# (e.g. the round-4 comb-correlation -> harmonic least-squares band
# aperiodicity switch), so stale entries are recomputed instead of
# silently mixed with new ones.
FEATURE_VERSION = "ap-harmonic1"

__all__ = [
    "WORLDVocoder",
    "FEATURE_VERSION",
    "dio",
    "cheaptrick",
    "d4c",
    "band_aperiodicity",
    "code_aperiodicity",
    "decode_aperiodicity",
    "get_num_aperiodicities",
    "synthesize",
    "synthesize_fn",
]


class WORLDVocoder:
    """Encode/decode WORLD features.

    API parity with the reference WORLDVocoder (voice100/vocoder.py:14-102):
    same rates (16 kHz: n_fft 512, mcep 24, alpha 0.410, codeap 1;
    22.05 kHz: 1024/34/0.455/2), same output_dims, same encode/decode
    signatures over (f0, logspc-or-mcep, codeap).
    """

    def __init__(
        self,
        sample_rate: int = 16000,
        frame_period: float = 10.0,
        n_fft: int = None,
        use_mcep: bool = False,
        log_offset: float = 1e-15,
        analysis_backend: str = None,
    ) -> None:
        import os

        self.sample_rate = sample_rate
        self.frame_period = frame_period
        # "numpy" (host, f64) or "jax" (on-device batched FFT analysis)
        self.analysis_backend = analysis_backend or os.environ.get(
            "VOICE100_TPU_WORLD_BACKEND", "numpy"
        )
        if sample_rate == 16000:
            self.mcep_dim, self.mcep_alpha, self.codeap_dim = 24, 0.410, 1
            self.n_fft = n_fft or 512
        elif sample_rate == 22050:
            self.mcep_dim, self.mcep_alpha, self.codeap_dim = 34, 0.455, 2
            self.n_fft = n_fft or 1024
        else:
            raise ValueError("Unsupported sample rate")
        self.use_mcep = use_mcep
        self.log_offset = log_offset
        if use_mcep:
            self.sp2mc_matrix = create_sp2mc_matrix(
                self.n_fft, self.mcep_dim, self.mcep_alpha
            )
            self.mc2sp_matrix = create_mc2sp_matrix(
                self.n_fft, self.mcep_dim, self.mcep_alpha
            )
        else:
            self.sp2mc_matrix = None
            self.mc2sp_matrix = None

    @property
    def output_dims(self) -> Tuple[int, int, int]:
        if self.use_mcep:
            return 1, self.mcep_dim + 1, self.codeap_dim
        return 1, self.n_fft // 2 + 1, self.codeap_dim

    def encode(
        self,
        waveform: np.ndarray,
        f0_floor: float = 80.0,
        f0_ceil: float = 400.0,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """waveform -> (f0 [T], logspc|mcep [T, D], codeap [T, C])."""
        x = np.asarray(waveform, dtype=np.float64)
        if self.analysis_backend == "jax":
            from .dio_jax import dio_jax

            f0, positions = dio_jax(
                x, self.sample_rate, f0_floor=f0_floor,
                f0_ceil=f0_ceil, frame_period=self.frame_period,
            )
        else:
            f0, positions = dio(
                x, self.sample_rate, f0_floor=f0_floor, f0_ceil=f0_ceil,
                frame_period=self.frame_period,
            )
        spc = cheaptrick(
            x, f0, positions, self.sample_rate, self.n_fft,
            backend=self.analysis_backend,
        )
        logspc = np.log(spc + self.log_offset)
        codeap = band_aperiodicity(
            x, f0, positions, self.sample_rate,
            backend=self.analysis_backend,
        )
        if self.use_mcep:
            feat = logspc @ self.sp2mc_matrix
        else:
            feat = logspc
        return (
            f0.astype(np.float32),
            feat.astype(np.float32),
            codeap.astype(np.float32),
        )

    def decode(
        self,
        f0: np.ndarray,
        logspc_or_mcep: np.ndarray,
        codeap: np.ndarray,
    ) -> np.ndarray:
        """WORLD features -> waveform (host array)."""
        f0 = np.asarray(f0, dtype=np.float64)
        feat = np.asarray(logspc_or_mcep, dtype=np.float64)
        codeap = np.asarray(codeap, dtype=np.float64)
        if self.use_mcep:
            logspc = feat @ self.mc2sp_matrix
        else:
            logspc = feat
        spc = np.maximum(np.exp(logspc) - self.log_offset, 0.0)
        ap = decode_aperiodicity(codeap, self.sample_rate, self.n_fft)
        return synthesize(
            f0, spc, ap, fs=self.sample_rate, frame_period=self.frame_period
        )

    def decode_batch(
        self,
        f0: np.ndarray,
        logspc_or_mcep: np.ndarray,
        codeap: np.ndarray,
        lengths: np.ndarray,
        dtype=np.float32,
    ) -> np.ndarray:
        """Batched synthesis on-device: ``[B, T]``/``[B, T, D]`` padded
        features -> ``[B, samples]`` waveforms (vmapped over the batch,
        one compiled program per padded length). Frames at/after
        ``lengths`` are muted. ``dtype=np.int16`` clips and quantizes
        to 16-bit PCM on device before the fetch — half the
        device->host bytes, and what a WAV file stores anyway."""
        import jax
        import jax.numpy as jnp

        from .synthesis import synthesize_fn

        f0 = jnp.asarray(f0, jnp.float32)
        feat = jnp.asarray(logspc_or_mcep, jnp.float32)
        codeap = np.asarray(codeap, dtype=np.float64)
        if self.use_mcep:
            logspc = feat @ jnp.asarray(
                self.mc2sp_matrix.astype(np.float32)
            )
        else:
            logspc = feat
        spc = jnp.maximum(jnp.exp(logspc) - self.log_offset, 0.0)
        ap = jnp.asarray(
            decode_aperiodicity(
                codeap.reshape(-1, codeap.shape[-1]),
                self.sample_rate, self.n_fft,
            ).reshape(codeap.shape[:-1] + (self.n_fft // 2 + 1,)),
            jnp.float32,
        )
        t = jnp.arange(f0.shape[1])
        frame_ok = t[None, :] < jnp.asarray(lengths)[:, None]
        f0 = jnp.where(frame_ok, f0, 0.0)
        spc = jnp.where(frame_ok[:, :, None], spc, 1e-12)
        keys = jax.random.split(
            jax.random.PRNGKey(0), f0.shape[0]
        )
        wav = jax.vmap(
            lambda a, b, c, k: synthesize_fn(
                a, b, c, fs=self.sample_rate,
                frame_period=self.frame_period, noise_key=k,
            )
        )(f0, spc, ap, keys)
        if np.dtype(dtype) == np.int16:
            wav = jnp.round(
                jnp.clip(wav, -1.0, 1.0) * 32767.0
            ).astype(jnp.int16)
        return np.asarray(wav)
