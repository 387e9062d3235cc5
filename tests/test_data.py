"""Data-layer tests over the hermetic dummy corpus.

Mirrors the reference's dataset test strategy
(/root/reference/tests/test_datasets.py): build a fake corpus in a temp
dir, then exercise readers, the registry, the feature cache, collation,
and a full datamodule epoch with shape/NaN invariants.
"""

import os

import numpy as np
import pytest

from corpus_fixture import make_dummy_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    data_dir = str(tmp_path_factory.mktemp("data"))
    make_dummy_corpus(data_dir)
    return data_dir


def test_wav_roundtrip(tmp_path):
    from voice100_tpu.dsp.wav import read_wav, write_wav

    rng = np.random.RandomState(0)
    wav = (rng.rand(1000).astype(np.float32) - 0.5) * 0.9
    path = str(tmp_path / "x.wav")
    write_wav(path, wav, 16000)
    out, rate = read_wav(path)
    assert rate == 16000
    assert out.shape == (1, 1000)
    np.testing.assert_allclose(out[0], wav, atol=1.0 / 16000)


def test_resample_sine_frequency_preserved():
    from voice100_tpu.dsp.resample import resample

    sr_in, sr_out = 22050, 16000
    t = np.arange(sr_in) / sr_in
    wav = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    out = resample(wav, sr_in, sr_out)
    assert abs(out.shape[0] - sr_out) <= 1
    spec = np.abs(np.fft.rfft(out[: sr_out]))
    peak_hz = np.argmax(spec) * sr_out / sr_out
    assert abs(peak_hz - 440.0) < 3.0
    # energy preserved within a few percent
    assert abs(np.std(out) - np.std(wav)) < 0.05


def test_metafile_dataset(corpus):
    from voice100_tpu.data import MetafileDataset

    root = os.path.join(corpus, "dummy-speech-en")
    ds = MetafileDataset(
        root, metafile="metadata.csv", sep="|", header=False, idcol=0,
        ext=".wav",
    )
    assert len(ds) == 8
    clipid, path, text = ds[0]
    assert clipid == "clip0000"
    assert os.path.exists(path)
    assert isinstance(text, str) and text


def test_registry_and_merge(corpus):
    from voice100_tpu.data import get_dataset

    ds = get_dataset(corpus, "dummy_en", "train")
    assert len(ds) == 8
    clipid, path, text = ds[0]
    assert os.path.exists(path)

    ds_align = get_dataset(corpus, "dummy_en", "train", use_align=True)
    clipid, path, aligntext = ds_align[0]
    assert isinstance(aligntext, str)

    ds2 = get_dataset(corpus, "dummy_en,dummy_en", "train")
    assert len(ds2) == 16


def test_mel_datamodule_epoch(corpus, tmp_path):
    from voice100_tpu.data import AudioTextDataModule

    data = AudioTextDataModule(
        vocoder="mel",
        dataset="dummy_en",
        data_dir=corpus,
        cache_dir=str(tmp_path / "cache"),
        batch_size=4,
        valid_ratio=0.25,
    )
    assert data.audio_size == 64
    assert data.vocab_size == 29
    data.setup("fit")
    assert len(data.train_ds) == 6
    assert len(data.valid_ds) == 2

    n = 0
    for (audio, audio_len), (text, text_len) in data.train_dataloader():
        assert audio.ndim == 3 and audio.shape[2] == 64
        assert audio.shape[1] % 64 == 0  # bucketed
        assert np.isfinite(audio).all()
        assert audio.shape[0] == audio_len.shape[0] == text.shape[0]
        assert (audio_len <= audio.shape[1]).all()
        assert (text_len <= text.shape[1]).all()
        assert (text[np.arange(len(text_len)), text_len - 1] != -1).all()
        n += audio.shape[0]
    # final batch pads to the full batch size by repeating items
    # (static shapes for XLA) -> 4 + 4
    assert n == 8

    # cache populated and reused
    cache_files = os.listdir(str(tmp_path / "cache"))
    assert len(cache_files) == 6
    for _ in data.train_dataloader():
        pass
    assert len(os.listdir(str(tmp_path / "cache"))) == 6


def test_align_datamodule(corpus):
    from voice100_tpu.data import AlignTextDataModule

    data = AlignTextDataModule(
        data_dir=corpus, dataset="dummy_en", batch_size=4
    )
    assert data.vocab_size == 29
    data.setup()
    for (text, text_len), (align, align_len) in data.train_dataloader():
        assert text.ndim == 2
        assert align.ndim == 2
        # counts files hold 2*len(text)+1 slots
        assert (align_len == 2 * text_len + 1).all()


def test_align_datamodule_phone(corpus):
    from voice100_tpu.data import AlignTextDataModule

    data = AlignTextDataModule(
        data_dir=corpus, dataset="dummy_en", use_phone=True, batch_size=4
    )
    assert data.vocab_size == 71
    data.setup()
    batches = list(data.train_dataloader())
    assert batches


def test_mcep_matrices_roundtrip():
    """sp2mc/mc2sp matrices: freqt built from the SPTK recurrence; a
    smooth spectrum survives the mcep round trip."""
    from voice100_tpu.dsp.mcep import create_sp2mc_matrix, create_mc2sp_matrix

    sp2mc = create_sp2mc_matrix(512, 24, 0.410)
    mc2sp = create_mc2sp_matrix(512, 24, 0.410)
    assert sp2mc.shape == (257, 25)
    assert mc2sp.shape == (25, 257)

    freqs = np.linspace(0, 1, 257)
    logspc = (-2.0 - 3.0 * freqs + np.cos(2 * np.pi * freqs)).astype(
        np.float64
    )
    mcep = logspc @ sp2mc
    recon = mcep @ mc2sp
    # smooth spectra reconstruct closely
    assert np.max(np.abs(recon - logspc)) < 0.2
    # constant spectra reconstruct almost exactly
    const = np.full(257, -3.0)
    np.testing.assert_allclose(
        (const @ sp2mc) @ mc2sp, const, atol=1e-6
    )


def test_world_datamodule_22050(tmp_path):
    """The 22.05 kHz WORLD path end to end through the datamodule:
    n_fft 1024 / mcep 34 / codeap 2 (reference vocoder.py:34-39), so
    the packed feature dim is 1 + 513 + 2 = 516 and every batch is
    finite. Locks in the fractional-hop (220.5 samples/frame) handling
    across analysis + collate."""
    from corpus_fixture import make_dummy_corpus
    from voice100_tpu.data import AudioTextDataModule

    root = make_dummy_corpus(
        str(tmp_path / "data"), n_clips=4, sample_rate=22050
    )
    del root
    data = AudioTextDataModule(
        vocoder="world",
        dataset="dummy_en",
        sample_rate=22050,
        data_dir=str(tmp_path / "data"),
        cache_dir=str(tmp_path / "cache"),
        batch_size=2,
        valid_ratio=0.25,
    )
    assert data.audio_size == 516
    data.setup("fit")
    n = 0
    for (f0, f0_len, spc, codeap), (text, text_len) in (
        data.train_dataloader()
    ):
        assert spc.shape[2] == 513 and codeap.shape[2] == 2
        assert f0.shape[1] == spc.shape[1] == codeap.shape[1]
        assert np.isfinite(spc).all() and np.isfinite(f0).all()
        assert (f0_len <= f0.shape[1]).all()
        assert (text_len <= text.shape[1]).all()
        n += f0.shape[0]
    assert n >= 3  # 3 train clips, padded to full batches


def test_cache_salt_keys_on_sample_rate():
    """A 22.05 kHz run must not read features cached at 16 kHz: the salt
    folds in non-default sample rates (the reference keys on vocoder
    alone, data_modules.py:545, and can silently serve stale features).
    WORLD salts also fold in the analysis-algorithm version
    (dsp.world.FEATURE_VERSION), so an estimator change recomputes
    cached features instead of mixing old and new supervision targets."""
    from voice100_tpu.data import AudioTextDataModule
    from voice100_tpu.dsp.world import FEATURE_VERSION

    salts = {
        sr: AudioTextDataModule(
            vocoder="world", sample_rate=sr, batch_size=2
        ).cache_salt
        for sr in (16000, 22050)
    }
    assert salts[16000] == f"world@{FEATURE_VERSION}".encode()
    assert salts[22050] != salts[16000]
    # world and world_mcep still share one cache at either rate
    assert (
        AudioTextDataModule(
            vocoder="world_mcep", sample_rate=22050, batch_size=2
        ).cache_salt
        == salts[22050]
    )


def test_cache_corruption_recovers(corpus, tmp_path):
    """A corrupt cache file is ignored and features recompute
    (reference behavior: voice100/data_modules.py:213-227)."""
    import glob as _glob
    from voice100_tpu.data import AudioTextDataModule

    cache_dir = str(tmp_path / "cache_corrupt")
    data = AudioTextDataModule(
        vocoder="mel", dataset="dummy_en", data_dir=corpus,
        cache_dir=cache_dir, batch_size=4, valid_ratio=0.0,
    )
    data.setup("predict")
    first = data.predict_ds[0]
    # corrupt every cache file (.npy for single-array mel entries)
    for f in _glob.glob(cache_dir + "/*.np[yz]"):
        with open(f, "wb") as fh:
            fh.write(b"not a npz")
    again = data.predict_ds[0]
    np.testing.assert_allclose(first[0], again[0])


def test_ljspeech_gated(corpus):
    """Real-corpus test, skipped without ./data/LJSpeech-1.1
    (reference tests/test_datasets.py:212-219 pattern)."""
    import os as _os
    if not _os.path.exists("./data/LJSpeech-1.1"):
        pytest.skip("LJSpeech not present")
    from voice100_tpu.data import get_base_dataset

    ds = get_base_dataset("./data", "ljspeech", "train")
    assert len(ds) > 10000


def test_ja_datamodule(tmp_path):
    """Japanese dummy corpus through the phone pipeline."""
    from corpus_fixture import make_dummy_corpus
    from voice100_tpu.data import AudioTextDataModule, AlignTextDataModule

    data_dir = str(tmp_path / "ja")
    make_dummy_corpus(data_dir, language="ja", n_clips=4)
    data = AudioTextDataModule(
        vocoder="mel", dataset="dummy_ja", language="ja", use_phone=True,
        data_dir=data_dir, cache_dir=str(tmp_path / "cache"),
        batch_size=2, valid_ratio=0.25,
    )
    assert data.vocab_size == 44
    data.setup("fit")
    (audio, audio_len), (text, text_len) = next(
        iter(data.train_dataloader())
    )
    assert (text_len > 0).all()
    assert text.max() < 44

    align_dm = AlignTextDataModule(
        data_dir=data_dir, dataset="dummy_ja", language="ja",
        use_phone=True, batch_size=2,
    )
    align_dm.setup()
    batches = list(align_dm.train_dataloader())
    assert batches


def test_loader_process_sharding(corpus, tmp_path):
    """Multi-host DP sharding: per-process strides partition the corpus."""
    from voice100_tpu.data import AudioTextDataModule
    from voice100_tpu.data.loader import DataLoader

    data = AudioTextDataModule(
        vocoder="mel", dataset="dummy_en", data_dir=corpus,
        cache_dir=str(tmp_path / "cache_ps"), batch_size=2,
        valid_ratio=0.0,
    )
    data.setup("fit")
    seen = []
    for pi in range(2):
        loader = DataLoader(
            data.train_ds, batch_size=2,
            collate_fn=lambda items: items,
            shuffle=True, seed=7,
            process_index=pi, process_count=2, pad_to_full=False,
        )
        for items in loader:
            for audio, text in items:
                seen.append(tuple(np.asarray(text).tolist()))
    # both processes together cover all 8 clips exactly once
    assert len(seen) == 8


def test_librispeech_dataset_and_registry(tmp_path):
    """LibriSpeech layout: recursive transcript scan, explicit dev-clean
    valid split (no random split), flac decode through the native
    library."""
    import sys

    sys.path.insert(0, "tests")
    from flac_fixture import encode_flac

    from voice100_tpu.data.datasets import LibriSpeechDataset
    from voice100_tpu.data.registry import get_base_dataset
    from voice100_tpu.dsp.audioio import load_audio

    root = tmp_path / "LibriSpeech"
    rng = np.random.RandomState(0)
    for split, spk in (("train-clean-100", "19"), ("dev-clean", "84"),
                       ("test-clean", "61")):
        chap = "100"
        d = root / split / spk / chap
        d.mkdir(parents=True)
        lines = []
        for utt in range(2):
            clipid = f"{spk}-{chap}-{utt:04d}"
            tone = (0.3 * np.sin(
                2 * np.pi * 300 * np.arange(2400) / 16000
            ) + 0.01 * rng.randn(2400))
            ints = (tone * 20000).astype(np.int32)
            with open(d / f"{clipid}.flac", "wb") as f:
                f.write(encode_flac([ints], 16000))
            lines.append(f"{clipid} SOME TRANSCRIPT {utt}")
        with open(d / f"{spk}-{chap}.trans.txt", "w") as f:
            f.write("\n".join(lines) + "\n")

    ds = LibriSpeechDataset(str(root / "train-clean-100"))
    assert len(ds) == 2
    clipid, path, text = ds[0]
    assert clipid == "19-100-0000" and text == "SOME TRANSCRIPT 0"
    wav = load_audio(path, 16000)
    assert len(wav) == 2400

    # registry splits map to the explicit directories
    for split, spk in (("train", "19"), ("valid", "84"), ("test", "61")):
        base = get_base_dataset(str(tmp_path), "librispeech", split)
        assert len(base) == 2
        assert base[0][0].startswith(spk)
    with pytest.raises(ValueError):
        get_base_dataset(str(tmp_path), "librispeech", "nope")


def test_kokoro_registry_and_prepare(tmp_path):
    """Kokoro layout: pipe metafile, flac clips, phone text in column 2,
    prepare-dataset pass-through branch."""
    import sys

    sys.path.insert(0, "tests")
    from flac_fixture import encode_flac

    from voice100_tpu.data.registry import get_base_dataset
    from voice100_tpu.tools.prepare_dataset import cli_main as prepare

    root = tmp_path / "kokoro-speech-v1_2-tiny"
    wavs = root / "wavs"
    wavs.mkdir(parents=True)
    rows = []
    for i in range(3):
        clipid = f"kokoro_{i:04d}"
        tone = (0.2 * np.sin(
            2 * np.pi * 200 * np.arange(1600) / 16000)).astype(np.float64)
        ints = (tone * 20000).astype(np.int32)
        with open(wavs / f"{clipid}.flac", "wb") as f:
            f.write(encode_flac([ints], 16000))
        rows.append(f"{clipid}|にほんご {i}|n i h o N g o")
    with open(root / "metadata.csv", "w", encoding="utf-8") as f:
        f.write("\n".join(rows) + "\n")

    ds = get_base_dataset(str(tmp_path), "kokoro_tiny", "train")
    assert len(ds) == 3
    clipid, path, text = ds[0]
    assert path.endswith(".flac") and text == "n i h o N g o"

    prepare(["--data_dir", str(tmp_path), "--dataset", "kokoro_tiny",
             "--language", "ja", "--use_phone"])
    out = (tmp_path / "kokoro_tiny-phone-train.txt").read_text()
    assert out.splitlines()[0] == "kokoro_0000|n i h o N g o"
    # kokoro transcripts are already phones: char mode must refuse
    with pytest.raises(ValueError):
        prepare(["--data_dir", str(tmp_path), "--dataset", "kokoro_tiny",
                 "--language", "ja"])


def _make_mini_librispeech(tmp_path):
    import sys

    sys.path.insert(0, "tests")
    from flac_fixture import encode_flac

    root = tmp_path / "LibriSpeech"
    rng = np.random.RandomState(0)
    for split, spk, n in (("train-clean-100", "19", 6),
                          ("dev-clean", "84", 2),
                          ("test-clean", "61", 2)):
        d = root / split / spk / "100"
        d.mkdir(parents=True)
        lines = []
        for utt in range(n):
            clipid = f"{spk}-100-{utt:04d}"
            tone = 0.3 * np.sin(
                2 * np.pi * (250 + 30 * utt)
                * np.arange(3200) / 16000
            ) + 0.01 * rng.randn(3200)
            with open(d / f"{clipid}.flac", "wb") as f:
                f.write(encode_flac(
                    [(tone * 20000).astype(np.int32)], 16000))
            lines.append(f"{clipid} HELLO WORLD {utt}")
        with open(d / f"{spk}-100.trans.txt", "w") as f:
            f.write("\n".join(lines) + "\n")


def test_librispeech_datamodule_explicit_split(tmp_path):
    """dataset='librispeech' must use dev-clean as the validation set
    (no random split), like the reference
    (voice100/data_modules.py:599-613)."""
    from voice100_tpu.data import AudioTextDataModule
    from voice100_tpu.tools.prepare_dataset import cli_main as prepare

    _make_mini_librispeech(tmp_path)
    prepare(["--data_dir", str(tmp_path), "--dataset", "librispeech",
             "--split", "train,valid", "--language", "en"])
    data = AudioTextDataModule(
        vocoder="mel", dataset="librispeech", data_dir=str(tmp_path),
        cache_dir=str(tmp_path / "cache"), batch_size=2,
    )
    assert data.split_dataset is False
    data.setup("fit")
    assert len(data.train_ds) == 6
    assert len(data.valid_ds) == 2
    batches = list(data.val_dataloader())
    assert sum(b[0][0].shape[0] for b in batches) == 2


def test_world_cache_warming_on_device_backend(tmp_path, monkeypatch):
    """Cache warming with the on-device WORLD analysis backend
    (VOICE100_TPU_WORLD_BACKEND=jax: YIN F0 + batched CheapTrick/
    aperiodicity) produces features usable interchangeably with the
    host backend."""
    from corpus_fixture import make_tonecode_corpus

    from voice100_tpu.data.transforms import WORLDAudioProcessor

    root = make_tonecode_corpus(str(tmp_path), n_clips=1)
    path = os.path.join(root, "wavs", "clip0000.wav")

    host = WORLDAudioProcessor(16000, use_mcep=True)(path)
    monkeypatch.setenv("VOICE100_TPU_WORLD_BACKEND", "jax")
    dev = WORLDAudioProcessor(16000, use_mcep=True)(path)
    assert host[0].shape == dev[0].shape  # f0 frames align
    for h, d in zip(host, dev):
        assert h.shape == d.shape
        assert np.isfinite(d).all()
    # voicing decisions broadly agree between the trackers
    agree = np.mean((host[0] > 0) == (dev[0] > 0))
    assert agree > 0.8, agree


def test_loader_abandoned_iterator_stops_producer():
    """Breaking out of a prefetching loader mid-epoch (graceful stop,
    a raising train step) must not leave the producer thread blocked on
    its queue forever."""
    import gc
    import threading
    import time

    from voice100_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return np.full((4,), i, np.float32)

    base_threads = threading.active_count()
    for _ in range(3):
        loader = DataLoader(
            DS(), batch_size=4, collate_fn=np.stack, prefetch=2
        )
        for j, _ in enumerate(loader):
            if j == 1:
                break  # abandon mid-epoch
        del loader
    gc.collect()
    deadline = time.time() + 5.0
    while threading.active_count() > base_threads:
        assert time.time() < deadline, "leaked producer threads"
        time.sleep(0.05)

    # full consumption and error propagation still behave
    assert sum(
        1 for _ in DataLoader(
            DS(), batch_size=4, collate_fn=np.stack, prefetch=2
        )
    ) == 16

    class BadDS(DS):
        def __getitem__(self, i):
            if i == 10:
                raise RuntimeError("boom")
            return super().__getitem__(i)

    with pytest.raises(RuntimeError, match="boom"):
        for _ in DataLoader(
            BadDS(), batch_size=4, collate_fn=np.stack, prefetch=2
        ):
            pass


def test_f16_feature_cache(corpus, tmp_path):
    """Mel features cache as float16 .npy (mmap-readable, half the
    read + upload bytes); values match the f32 transform to f16
    precision and a cache-miss epoch equals every cache-hit epoch."""
    import glob as _glob
    from voice100_tpu.data import AudioTextDataModule

    cache_dir = str(tmp_path / "cache_f16")
    data = AudioTextDataModule(
        vocoder="mel", dataset="dummy_en", data_dir=corpus,
        cache_dir=cache_dir, batch_size=4, valid_ratio=0.0,
    )
    data.setup("predict")
    miss = data.predict_ds[0]
    assert miss[0].dtype == np.float16
    npys = _glob.glob(cache_dir + "/*.npy")
    assert len(npys) == 1 and not _glob.glob(cache_dir + "/*.npz")
    assert np.load(npys[0]).dtype == np.float16
    hit = data.predict_ds[0]
    # miss epoch and hit epoch see the exact same quantized values
    np.testing.assert_array_equal(np.asarray(miss[0]),
                                  np.asarray(hit[0]))

    # f16 quantization is within half-precision rounding of the f32
    # features
    f32 = AudioTextDataModule(
        vocoder="mel", dataset="dummy_en", data_dir=corpus,
        cache_dir=str(tmp_path / "cache_f32"), batch_size=4,
        valid_ratio=0.0, cache_dtype=None,
    )
    f32.setup("predict")
    ref = np.asarray(f32.predict_ds[0][0], np.float32)
    got = np.asarray(hit[0], np.float32)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-2)

    # f16 and f32 caches never collide (dtype-keyed salt)
    assert data.cache_salt != f32.cache_salt


def test_process_pool_loader_identical(corpus, tmp_path):
    """num_workers>0 (spawned collate workers) must yield byte-identical
    batches in the same order as the in-process path, across shuffled
    epochs and the padded final batch."""
    from voice100_tpu.data import AudioTextDataModule

    def make(num_workers):
        dm = AudioTextDataModule(
            vocoder="mel", dataset="dummy_en", data_dir=corpus,
            cache_dir=str(tmp_path / "cache_pool"), batch_size=4,
            valid_ratio=0.25,
        )
        dm.num_workers = num_workers
        dm.setup("fit")
        return dm.train_dataloader()

    threaded = make(0)
    pooled = make(2)
    try:
        for epoch in range(2):
            threaded.set_epoch(epoch)
            pooled.set_epoch(epoch)
            got_any = False
            for a, b in zip(threaded, pooled):
                got_any = True
                flat_a = [
                    np.asarray(x)
                    for pair in a for x in pair
                ]
                flat_b = [
                    np.asarray(x)
                    for pair in b for x in pair
                ]
                assert len(flat_a) == len(flat_b)
                for xa, xb in zip(flat_a, flat_b):
                    assert xa.dtype == xb.dtype
                    np.testing.assert_array_equal(xa, xb)
            assert got_any
            assert len(list(threaded)) == len(list(pooled))
    finally:
        pooled.close()


class _IdsDataset:
    """Transparent dataset: item i is the scalar id i."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.asarray([i], np.int32)


def _stack_ids(items):
    return np.stack(items)


def test_multiprocess_loader_shards():
    """Multi-host DP loading (DataLoader process_index/process_count,
    SURVEY §2.4): per-process shards are disjoint, cover the whole
    epoch (up to the tail the stride drops), and the concatenated
    per-process batch k is exactly the single-process batch k of size
    batch_size*process_count — so a pod run consumes the same global
    batches as a single host."""
    from voice100_tpu.data import DataLoader

    n, bs, pc = 64, 4, 2
    for epoch in (0, 1):
        shards = []
        for pi in range(pc):
            loader = DataLoader(
                _IdsDataset(n), batch_size=bs, collate_fn=_stack_ids,
                shuffle=True, seed=7, prefetch=0,
                process_index=pi, process_count=pc,
            )
            loader.set_epoch(epoch)
            shards.append([b[:, 0] for b in loader])
        # disjoint + full coverage
        flat = [set(np.concatenate(s).tolist()) for s in shards]
        assert flat[0] & flat[1] == set()
        assert flat[0] | flat[1] == set(range(n))

        # global batch k == single-process batch k (as a multiset)
        single = DataLoader(
            _IdsDataset(n), batch_size=bs * pc, collate_fn=_stack_ids,
            shuffle=True, seed=7, prefetch=0,
        )
        single.set_epoch(epoch)
        single_batches = [b[:, 0] for b in single]
        assert len(single_batches) == len(shards[0]) == len(shards[1])
        for k, sb in enumerate(single_batches):
            global_k = np.concatenate([shards[0][k], shards[1][k]])
            assert sorted(global_k.tolist()) == sorted(sb.tolist())


def test_multiprocess_loader_tail():
    """Non-divisible corpus: the per-process stride length differs by
    one; with pad_to_full each process still emits the same number of
    full batches and no sample appears in two shards."""
    from voice100_tpu.data import DataLoader

    n, bs, pc = 13, 4, 2
    shards = []
    for pi in range(pc):
        loader = DataLoader(
            _IdsDataset(n), batch_size=bs, collate_fn=_stack_ids,
            shuffle=True, seed=3, prefetch=0,
            process_index=pi, process_count=pc,
        )
        batches = [b[:, 0] for b in loader]
        assert len(batches) == len(loader)
        for b in batches:
            assert b.shape[0] == bs  # padded to full
        shards.append(set(np.concatenate(batches).tolist()))
    assert shards[0] & shards[1] == set()
    assert shards[0] | shards[1] == set(range(n))
