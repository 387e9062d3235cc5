"""Per-clip audio feature transforms with on-disk caching.

Mirrors the reference's EncodedCacheDataset flow
(voice100/data_modules.py:162-241): features are computed once per clip,
cached under ``sha1(salt + clipid)``, and WORLD features are stored as
mel-cepstrum (mcep) with the full log-spectrum reconstituted on read via
the mc2sp matrix. The cache format here is ``.npz`` instead of torch
pickles.

TPU-first note: the log-mel transform itself is the on-device JAX op
(ops.melspec); per-clip extraction jits once per bucketed waveform
length.
"""

from __future__ import annotations

import hashlib
import logging
import os
from functools import partial
from typing import Optional

import numpy as np
import jax

from ..dsp.audioio import load_audio
from ..ops.melspec import log_mel_spectrogram, MELSPEC_DIM

logger = logging.getLogger(__name__)

__all__ = [
    "MelSpectrogramAudioTransform",
    "WORLDAudioProcessor",
    "EncodedCacheDataset",
    "get_audio_transform",
]

_WAVE_BUCKET = 4096  # pad waveforms to multiples of this before jit


@partial(jax.jit, static_argnames=("sample_rate",))
def _jit_logmel(wav, sample_rate: int):
    return log_mel_spectrogram(wav, sample_rate=sample_rate)


class MelSpectrogramAudioTransform:
    """audio file -> ``[T, n_mels]`` float32 log-mel
    (reference voice100/data_modules.py:262-292)."""

    def __init__(
        self, sample_rate: int = 16000, n_mels: int = MELSPEC_DIM
    ) -> None:
        self.sample_rate = sample_rate
        self.n_mels = n_mels

    @property
    def audio_size(self) -> int:
        return self.n_mels

    def __call__(
        self, audiopath: str, wav: Optional[np.ndarray] = None
    ) -> np.ndarray:
        if wav is None:
            wav = load_audio(audiopath, self.sample_rate)
        frames = wav.shape[0] // 160 + 1
        # bucket the waveform length to bound jit recompiles
        padded_len = -(-wav.shape[0] // _WAVE_BUCKET) * _WAVE_BUCKET
        wav = np.pad(wav, (0, padded_len - wav.shape[0]))
        mel = np.asarray(_jit_logmel(wav, self.sample_rate))
        return mel[:frames]


class WORLDAudioProcessor:
    """audio file -> (f0, logspc|mcep, codeap) WORLD features
    (reference voice100/data_modules.py:295-316)."""

    def __init__(self, sample_rate: int, use_mcep: bool) -> None:
        from ..dsp.world import WORLDVocoder

        self.sample_rate = sample_rate
        self.vocoder = WORLDVocoder(
            sample_rate=sample_rate, use_mcep=use_mcep
        )

    @property
    def audio_size(self) -> int:
        return sum(self.vocoder.output_dims)

    def __call__(self, audiopath: str, wav: Optional[np.ndarray] = None):
        if wav is None:
            wav = load_audio(audiopath, self.sample_rate)
        return self.vocoder.encode(np.asarray(wav, np.float64))


def get_audio_transform(vocoder: str, sample_rate: int):
    """Factory (reference voice100/data_modules.py:415-424)."""
    if vocoder == "mel":
        return MelSpectrogramAudioTransform(sample_rate=sample_rate)
    if vocoder == "world":
        return WORLDAudioProcessor(sample_rate=sample_rate, use_mcep=False)
    if vocoder == "world_mcep":
        return WORLDAudioProcessor(sample_rate=sample_rate, use_mcep=True)
    raise ValueError(f"Unknown vocoder {vocoder!r}")


class EncodedCacheDataset:
    """Applies audio + text transforms with a feature cache
    (reference voice100/data_modules.py:162-241).

    WORLD features are cached in mcep form and expanded back to logspc on
    read when the vocoder is 'world' (data_modules.py:178-191,229-232),
    so 'world' and 'world_mcep' share one cache (same salt policy as the
    reference, data_modules.py:545).
    """

    def __init__(
        self,
        dataset,
        audio_transform,
        text_transform,
        targettext_transform=None,
        cachedir: Optional[str] = None,
        salt: bytes = b"",
        cache_dtype: Optional[str] = None,
    ) -> None:
        self._dataset = dataset
        self.audio_transform = audio_transform
        self.text_transform = text_transform
        self.targettext_transform = targettext_transform
        self._cachedir = cachedir
        self._salt = salt
        # Quantize cached FLOAT features (float16 halves both the cache
        # read bytes and the host->device upload bytes; the train step
        # upcasts on device). Only safe for model INPUTS — WORLD
        # supervision targets stay float32 so the training objective is
        # cache-dtype-independent. Single-array entries are stored as
        # raw .npy and read back memory-mapped: collate copies straight
        # from the page cache with no npz container parse per item.
        self._cache_dtype = (
            np.dtype(cache_dtype) if cache_dtype is not None else None
        )
        self._preloaded = {}
        self.save_mcep = False
        if isinstance(audio_transform, WORLDAudioProcessor):
            vocoder = audio_transform.vocoder
            if not vocoder.use_mcep:
                from ..dsp.mcep import create_mc2sp_matrix, create_sp2mc_matrix

                self.save_mcep = True
                self.mc2sp_matrix = create_mc2sp_matrix(
                    vocoder.n_fft, vocoder.mcep_dim, vocoder.mcep_alpha
                ).astype(np.float32)
                self.sp2mc_matrix = create_sp2mc_matrix(
                    vocoder.n_fft, vocoder.mcep_dim, vocoder.mcep_alpha
                ).astype(np.float32)

    def __len__(self) -> int:
        return len(self._dataset)

    def __getitem__(self, index: int):
        data = self._dataset[index]
        if self.targettext_transform is not None:
            clipid, audio, text, targettext = data
            return (
                self._get_encoded_audio(clipid, audio),
                self.text_transform(text),
                self.targettext_transform(targettext),
            )
        clipid, audio, text = data
        return (
            self._get_encoded_audio(clipid, audio),
            self.text_transform(text),
        )

    def prefetch(self, indices) -> None:
        """Batch-decode the audio of cache-missing items on the native
        thread pool (voice100_tpu/native/audioio.cpp) so the per-item
        feature extraction that follows skips single-threaded decode.
        No-op when the native library is unavailable."""
        try:
            from ..native.batch import load_audio_batch
        except Exception:
            return
        todo = []
        for index in indices:
            data = self._dataset[int(index)]
            clipid, audiopath = data[0], data[1]
            cachefile = self._cachefile(clipid)
            if clipid in self._preloaded:
                continue
            if cachefile and (
                os.path.exists(cachefile)
                or os.path.exists(cachefile[:-4] + ".npy")
            ):
                continue
            todo.append((clipid, audiopath))
        if not todo:
            return
        try:
            wavs = load_audio_batch(
                [path for _, path in todo],
                self.audio_transform.sample_rate,
            )
        except Exception:
            logger.warning("native batch decode failed", exc_info=True)
            return
        for (clipid, _), wav in zip(todo, wavs):
            if wav is not None:
                self._preloaded[clipid] = wav

    def _cachefile(self, clipid: str) -> Optional[str]:
        if self._cachedir is None:
            return None
        h = hashlib.sha1(self._salt)
        h.update(clipid.encode("utf-8"))
        return os.path.join(self._cachedir, h.hexdigest() + ".npz")

    def audio_frames(self, index: int) -> Optional[int]:
        """Frame count of the item's cached audio feature WITHOUT
        reading the feature data: just the .npy header (mel) or the
        npz's first-entry header (WORLD f0). ``None`` when the item is
        not cached yet — callers fall back to unbucketed batching for
        that epoch. Feeds the loader's length-bucketed batch formation
        (loader.py ``length_hint``), which needs every item's length
        up front and must not pay a feature decode to learn it."""
        data = self._dataset[index]
        cachefile = self._cachefile(data[0])
        if cachefile is None:
            return None

        def head_shape(f):
            version = np.lib.format.read_magic(f)
            if version == (1, 0):
                shape, _, _ = np.lib.format.read_array_header_1_0(f)
            else:
                shape, _, _ = np.lib.format.read_array_header_2_0(f)
            return shape

        try:
            npyfile = cachefile[:-4] + ".npy"
            if os.path.exists(npyfile):
                with open(npyfile, "rb") as f:
                    return int(head_shape(f)[0])
            if os.path.exists(cachefile):
                import zipfile

                with zipfile.ZipFile(cachefile) as z:
                    with z.open(z.namelist()[0]) as f:
                        return int(head_shape(f)[0])
        except Exception:
            return None
        return None

    def _quantize(self, arr: np.ndarray) -> np.ndarray:
        if self._cache_dtype is not None and arr.dtype == np.float32:
            return arr.astype(self._cache_dtype)
        return arr

    def _get_encoded_audio(self, clipid: str, audiopath: str):
        cachefile = self._cachefile(clipid)
        encoded = None
        if cachefile:
            npyfile = cachefile[:-4] + ".npy"
            if os.path.exists(npyfile):
                try:
                    # memory-mapped read: collate's row copy pulls the
                    # bytes straight from the page cache
                    encoded = np.load(npyfile, mmap_mode="r")
                except Exception:
                    logger.warning(
                        "Failed to load audio cache", exc_info=True
                    )
            elif os.path.exists(cachefile):
                try:
                    with np.load(cachefile) as z:
                        encoded = tuple(z[k] for k in z.files)
                        if len(encoded) == 1:
                            encoded = encoded[0]
                except Exception:
                    logger.warning(
                        "Failed to load audio cache", exc_info=True
                    )
        if encoded is None:
            wav = self._preloaded.pop(clipid, None)
            encoded = self.audio_transform(audiopath, wav=wav)
            to_save = encoded
            if self.save_mcep:
                f0, logspc, codeap = encoded
                to_save = (f0, logspc @ self.sp2mc_matrix, codeap)
                encoded = to_save
            # quantize BEFORE returning so a cache-miss epoch sees the
            # exact values every later cache-hit epoch will see
            if isinstance(to_save, tuple):
                to_save = tuple(self._quantize(a) for a in to_save)
                encoded = to_save
            else:
                to_save = self._quantize(np.ascontiguousarray(to_save))
                encoded = to_save
            if cachefile:
                try:
                    # atomic publish: a crash mid-write (or two DP
                    # processes sharing a cache dir) must never leave a
                    # truncated entry behind — a corrupt entry would be
                    # recomputed on every epoch. Single arrays go to raw
                    # .npy (mmap-readable); tuples keep the .npz
                    # container. (np.save/np.savez append the suffix
                    # when missing, so keep it on the temp name.)
                    if isinstance(to_save, tuple):
                        tmpfile = f"{cachefile}.{os.getpid()}.tmp.npz"
                        np.savez(tmpfile, *to_save)
                        os.replace(tmpfile, cachefile)
                    else:
                        npyfile = cachefile[:-4] + ".npy"
                        tmpfile = f"{npyfile}.{os.getpid()}.tmp.npy"
                        np.save(tmpfile, to_save)
                        os.replace(tmpfile, npyfile)
                except Exception:
                    logger.warning("Failed to save audio cache", exc_info=True)
        if self.save_mcep:
            f0, mcep, codeap = encoded
            encoded = (f0, mcep @ self.mc2sp_matrix, codeap)
        return encoded
