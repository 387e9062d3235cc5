"""Synthetic dummy corpus builder (hermetic test fixture).

Same layout the reference tests build (tests/test_datasets.py:70-129)
and the ``dummy_{lang}`` registry entry expects
(voice100/data_modules.py:371-376): random sine-mixture WAVs under
``dummy-speech-{lang}/wavs``, a pipe-separated ``metadata.csv``, plus
``dummy_{lang}-{split}.txt`` / phone / align / phone-align files.
"""

from __future__ import annotations

import os

import numpy as np

from voice100_tpu.dsp.wav import write_wav

EN_SENTENCES = [
    "the quick brown fox jumps over the lazy dog",
    "hello world this is a test",
    "speech synthesis and recognition",
    "a small corpus of random sines",
    "one two three four five",
    "testing the data pipeline end to end",
    "pack my box with five dozen jugs",
    "how vexingly quick daft zebras jump",
]

EN_PHONE = [
    "DH/AH0/K/W/IH1/K/B/R/AW1/N/F/AA1/K/S",
    "HH/AH0/L/OW1/W/ER1/L/D",
    "S/P/IY1/CH/S/IH1/N/TH/AH0/S/AH0/S",
    "AH0/S/M/AO1/L/K/AO1/R/P/AH0/S",
    "W/AH1/N/T/UW1/TH/R/IY1",
    "T/EH1/S/T/IH0/NG/DH/AH0/D/EY1/T/AH0",
    "P/AE1/K/M/AY1/B/AA1/K/S",
    "HH/AW1/V/EH1/K/S/IH0/NG/L/IY0",
]


JA_SENTENCES = [
    "こんにちは世界",
    "やっぱりヴォイス",
    "おんせいにんしきとごうせい",
    "にほんごのてすとです",
    "コーヒーをのみます",
    "あしたははれです",
    "ねこがすきです",
    "でんわをかけます",
]

JA_PHONE = [
    "k o N n i ch i w a s e k a i",
    "y a q p a r i b o i s u",
    "o N s e i n i N sh i k i",
    "n i h o N g o n o t e s u t o",
    "k o: h i: o n o m i m a s u",
    "a sh i t a w a h a r e d e s u",
    "n e k o g a s u k i d e s u",
    "d e N w a o k a k e m a s u",
]


def make_dummy_corpus(
    data_dir: str,
    language: str = "en",
    n_clips: int = 8,
    sample_rate: int = 16000,
    seed: int = 0,
    min_dur: float = 0.4,
    max_dur: float = 1.2,
    dur_modes=None,
) -> str:
    """Create a dummy corpus under ``data_dir``; returns the corpus root.

    ``min_dur``/``max_dur`` set the clip-length range in seconds (the
    defaults keep tests fast; bench.py's loader metric uses ~10 s clips
    to match the asr_en_base shapes). ``dur_modes`` — a list of
    (min, max) windows — makes a MULTIMODAL length distribution (clip i
    draws from window i % len(modes)): the shape that exercises
    length-bucketed batching and per-bucket scan dispatch."""
    root = os.path.join(data_dir, f"dummy-speech-{language}")
    wavs = os.path.join(root, "wavs")
    os.makedirs(wavs, exist_ok=True)
    rng = np.random.RandomState(seed)
    sentences = JA_SENTENCES if language == "ja" else EN_SENTENCES
    phones = JA_PHONE if language == "ja" else EN_PHONE
    phone_sep = " " if language == "ja" else "/"

    lines = []
    for i in range(n_clips):
        clipid = f"clip{i:04d}"
        if dur_modes:
            lo, hi = dur_modes[i % len(dur_modes)]
        else:
            lo, hi = min_dur, max_dur
        dur = rng.uniform(lo, hi)
        t = np.arange(int(dur * sample_rate)) / sample_rate
        wav = np.zeros_like(t, dtype=np.float64)
        for _ in range(3):
            freq = rng.uniform(100, 2000)
            wav += rng.uniform(0.05, 0.3) * np.sin(
                2 * np.pi * freq * t + rng.uniform(0, 2 * np.pi)
            )
        write_wav(
            os.path.join(wavs, clipid + ".wav"),
            wav.astype(np.float32),
            sample_rate,
        )
        text = sentences[i % len(sentences)]
        lines.append(f"{clipid}|{text}|{text}")
    with open(os.path.join(root, "metadata.csv"), "w",
              encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")

    # text files: dummy_{lang}-train.txt (clipid|normalized text)
    name = f"dummy_{language}"
    with open(os.path.join(data_dir, f"{name}-train.txt"), "w",
              encoding="utf-8") as f:
        for i in range(n_clips):
            text = sentences[i % len(sentences)]
            f.write(f"clip{i:04d}|{text}\n")
    with open(os.path.join(data_dir, f"{name}-phone-train.txt"), "w",
              encoding="utf-8") as f:
        for i in range(n_clips):
            f.write(f"clip{i:04d}|{phones[i % len(phones)]}\n")

    # align files: text|aligntext|counts over 2*len(text)+1 slots
    for infix, texts, sep in (
        ("align", sentences, ""),
        ("phone-align", phones, phone_sep),
    ):
        path = os.path.join(data_dir, f"{name}-{infix}-train.txt")
        with open(path, "w", encoding="utf-8") as f:
            for i in range(n_clips):
                text = texts[i % len(texts)]
                n_tok = len(text.split(sep)) if sep else len(text)
                counts = rng.randint(0, 4, size=2 * n_tok + 1)
                aligntext = text  # content is irrelevant for training
                f.write(
                    f"{text}|{aligntext}|{' '.join(map(str, counts))}\n"
                )
    return root


TONE_CHARS = "abcdefghijkl"


def tone_for_char(ch: str) -> float:
    """Distinct fundamental per character (tonecode corpus). All
    pitches sit inside WORLD's default 80-400 Hz F0 range so analysis
    tracks them as voiced and synthesis reproduces them."""
    if ch == " ":
        return 0.0  # silence
    return 100.0 + 24.0 * TONE_CHARS.index(ch)


def make_tonecode_corpus(
    data_dir: str,
    n_clips: int = 12,
    chars_per_clip: int = 6,
    frames_per_char: int = 10,
    sample_rate: int = 16000,
    seed: int = 0,
) -> str:
    """A corpus whose audio is a deterministic function of its text:
    each character renders as ``frames_per_char`` aligned-text frames
    (20 ms each) of a character-specific tone. Unlike the random-sine
    dummy corpus, text->audio and audio->text mappings are genuinely
    learnable, so TTS->ASR round trips are meaningful. Uses the same
    dummy_{lang} layout under ``dummy-speech-tonecode``."""
    root = os.path.join(data_dir, "dummy-speech-tonecode")
    wavs = os.path.join(root, "wavs")
    os.makedirs(wavs, exist_ok=True)
    rng = np.random.RandomState(seed)
    samples_per_char = frames_per_char * 2 * 160  # 20ms align frames

    meta, texts, aligns = [], [], []
    for i in range(n_clips):
        clipid = f"clip{i:04d}"
        # no adjacent repeats: greedy CTC needs an interposed blank to
        # emit a doubled character, which a toy model rarely produces
        chars = []
        for _ in range(chars_per_clip):
            ch = TONE_CHARS[rng.randint(0, 12)]
            while chars and ch == chars[-1]:
                ch = TONE_CHARS[rng.randint(0, 12)]
            chars.append(ch)
        text = "".join(chars)
        wav = np.zeros(0, np.float64)
        for ch in text:
            t = np.arange(samples_per_char) / sample_rate
            freq = tone_for_char(ch)
            phase = 2 * np.pi * freq * t
            # harmonic-rich (speech-like) tone: WORLD's envelope and
            # the mel front-end both resolve pitch via the harmonics
            seg = (
                0.3 * np.sin(phase)
                + 0.2 * np.sin(2 * phase)
                + 0.12 * np.sin(3 * phase)
                + 0.08 * np.sin(4 * phase)
            )
            # short fades avoid clicks at tone boundaries
            ramp = np.minimum(np.arange(samples_per_char), 160) / 160.0
            seg = seg * ramp * ramp[::-1]
            wav = np.concatenate([wav, seg])
        write_wav(
            os.path.join(wavs, clipid + ".wav"),
            wav.astype(np.float32), sample_rate,
        )
        meta.append(f"{clipid}|{text}|{text}")
        texts.append((clipid, text))
        aligntext = "".join(ch * frames_per_char for ch in text)
        counts = []
        for ch in text:
            counts += [0, frames_per_char]
        counts.append(0)
        aligns.append((text, aligntext, counts))

    with open(os.path.join(root, "metadata.csv"), "w",
              encoding="utf-8") as f:
        f.write("\n".join(meta) + "\n")
    with open(os.path.join(data_dir, "dummy_tonecode-train.txt"), "w",
              encoding="utf-8") as f:
        for clipid, text in texts:
            f.write(f"{clipid}|{text}\n")
    with open(os.path.join(data_dir, "dummy_tonecode-align-train.txt"),
              "w", encoding="utf-8") as f:
        for text, aligntext, counts in aligns:
            f.write(
                f"{text}|{aligntext}|{' '.join(map(str, counts))}\n"
            )
    return root


def add_resynth_clips(data_dir: str, sample_rate: int = 16000) -> None:
    """Vocoder-domain augmentation for the tonecode corpus: append a
    WORLD analysis->synthesis copy of every clip (same transcript) so
    an ASR trained on it is robust to vocoded audio — the domain a
    TTS->ASR round trip feeds it."""
    from voice100_tpu.dsp.audioio import load_audio
    from voice100_tpu.dsp.wav import write_wav
    from voice100_tpu.dsp.world import WORLDVocoder

    root = os.path.join(data_dir, "dummy-speech-tonecode")
    meta_path = os.path.join(root, "metadata.csv")
    rows = [line.rstrip("\n") for line in open(meta_path)]
    # idempotent: skip rows that are already resynthesized copies
    rows = [r for r in rows if not r.startswith("rsyn")]
    if any(
        line.startswith("rsyn") for line in open(meta_path)
    ):
        return
    vocoder = WORLDVocoder(sample_rate=sample_rate, use_mcep=True)
    new_rows, new_texts = [], []
    for row in rows:
        clipid, text, _ = row.split("|")
        wav = load_audio(
            os.path.join(root, "wavs", clipid + ".wav"), sample_rate
        )
        f0, mcep, codeap = vocoder.encode(wav)
        resyn = np.asarray(vocoder.decode(f0, mcep, codeap), np.float32)
        rid = clipid.replace("clip", "rsyn")
        write_wav(
            os.path.join(root, "wavs", rid + ".wav"),
            np.clip(resyn, -1, 1), sample_rate,
        )
        new_rows.append(f"{rid}|{text}|{text}")
        new_texts.append((rid, text))
    with open(meta_path, "a", encoding="utf-8") as f:
        f.write("\n".join(new_rows) + "\n")
    with open(os.path.join(data_dir, "dummy_tonecode-train.txt"), "a",
              encoding="utf-8") as f:
        for rid, text in new_texts:
            f.write(f"{rid}|{text}\n")


def make_cv_corpus(
    data_dir: str,
    n_clips: int = 8,
    sample_rate: int = 24000,
    seed: int = 0,
) -> str:
    """Create a CommonVoice-layout JA corpus with mp3 clips.

    Matches the ``cv_ja`` registry entry (reference
    voice100/data_modules.py:386-390): root
    ``cv-corpus-12.0-2022-12-07/ja``, tab-separated ``validated.tsv``
    with a header whose column 1 is the clip filename (with .mp3
    extension) and column 2 the sentence, audio under ``clips/``.
    Requires libmp3lame (see mp3_fixture.lame_available).
    """
    from mp3_fixture import write_mp3

    root = os.path.join(data_dir, "cv-corpus-12.0-2022-12-07", "ja")
    clips = os.path.join(root, "clips")
    os.makedirs(clips, exist_ok=True)
    rng = np.random.RandomState(seed)
    lines = ["client_id\tpath\tsentence\tup_votes\tdown_votes"]
    for i in range(n_clips):
        fname = f"common_voice_ja_{30000000 + i}.mp3"
        dur = rng.uniform(0.4, 1.2)
        t = np.arange(int(dur * sample_rate)) / sample_rate
        wav = np.zeros_like(t, dtype=np.float64)
        for _ in range(3):
            freq = rng.uniform(100, 2000)
            wav += rng.uniform(0.05, 0.3) * np.sin(
                2 * np.pi * freq * t + rng.uniform(0, 2 * np.pi)
            )
        write_mp3(
            os.path.join(clips, fname), wav.astype(np.float32), sample_rate
        )
        text = JA_SENTENCES[i % len(JA_SENTENCES)]
        lines.append(f"speaker{i:02d}\t{fname}\t{text}\t2\t0")
    with open(os.path.join(root, "validated.tsv"), "w",
              encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return root
