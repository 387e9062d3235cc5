"""End-to-end TTS demo: text -> phones -> durations -> WORLD -> WAV.

Parity with the reference sample generator
(voice100/update_samples.py:30-113): phonemize, tokenize, predict
durations with the align model, expand to aligned text, predict WORLD
features with the audio model, synthesize, clip to +/-0.8, write 16 kHz
PCM16 WAVs. Checkpoints come from local training runs instead of GitHub
release downloads.

TPU-first: duration expansion and the whole batch of utterances run
on-device; only the final WAV write is host-side.
"""

from __future__ import annotations

from argparse import ArgumentParser
from typing import List, Optional

import numpy as np

__all__ = ["make_samples", "cli_main"]


def make_samples(
    align_config: str,
    align_ckpt_path: str,
    audio_config: str,
    audio_ckpt_path: str,
    sample_texts: List[str],
    language: str,
    output_prefix: str = "sample",
    audio_stat: Optional[str] = None,
    use_phone: bool = True,
) -> List[str]:
    import jax.numpy as jnp

    from ..data.collate import pad_stack
    from ..dsp.wav import write_wav
    from ..dsp.world import WORLDVocoder
    from ..models import TextToAlignText, AlignTextToAudio
    from ..text import get_phonemizer, get_tokenizer
    from ..training.checkpoint import load_variables
    from ..training.cli import load_config, build_from_config

    align_model, _, _, _ = build_from_config(
        load_config(align_config), {}
    )
    audio_model, _, _, _ = build_from_config(
        load_config(audio_config), {}
    )
    assert isinstance(align_model, TextToAlignText)
    assert isinstance(audio_model, AlignTextToAudio)
    align_vars = load_variables(align_ckpt_path)
    audio_vars = load_variables(audio_ckpt_path)
    if audio_stat:
        from ..training.checkpoint import merge_world_stats

        audio_vars = merge_world_stats(audio_vars, audio_stat)

    phonemizer = get_phonemizer(language=language, use_phone=use_phone)
    tokenizer = get_tokenizer(language=language, use_phone=use_phone)

    phones = [phonemizer(t) for t in sample_texts]
    encoded = [tokenizer(p) for p in phones]
    text, text_len = pad_stack(encoded, 0, 16)
    text = jnp.asarray(text)
    text_len = jnp.asarray(text_len)

    for i, t in enumerate(sample_texts):
        print(f"text {i}: {t}")
        print(f"phones {i}: {phones[i][:100]}...")

    durations = align_model.apply(
        align_vars, text, text_len, method=TextToAlignText.predict
    )
    # static expansion capacity from the actual predicted totals
    token_mask = (
        jnp.arange(text.shape[1])[None, :] < text_len[:, None]
    )
    totals = jnp.sum(
        durations * token_mask[:, :, None].astype(durations.dtype),
        axis=(1, 2),
    )
    # capacity: duration total + one forced frame per token + head/tail
    out_len = int(np.ceil(float(jnp.max(totals)))) + int(text.shape[1]) + 16
    aligntext, aligntext_len = align_model.apply(
        align_vars, text, durations, text_len, out_len,
        method=TextToAlignText.align,
    )
    for i in range(aligntext.shape[0]):
        decoded = tokenizer.decode(
            np.asarray(aligntext[i, : int(aligntext_len[i])])
        )
        print(f"aligntext {i}: {decoded[:100]}...")

    f0, logspc_or_mcep, codeap = audio_model.apply(
        audio_vars, aligntext, aligntext_len,
        method=AlignTextToAudio.predict,
    )

    use_mcep = audio_model.logspc_size == 25
    vocoder = WORLDVocoder(sample_rate=16000, use_mcep=use_mcep)
    paths = []
    for i in range(f0.shape[0]):
        audio_len = int(aligntext_len[i]) * 2
        wav = vocoder.decode(
            np.asarray(f0[i, :audio_len]),
            np.asarray(logspc_or_mcep[i, :audio_len]),
            np.asarray(codeap[i, :audio_len]),
        )
        wav = np.clip(wav, -0.8, 0.8)
        path = f"{output_prefix}-{language}-{i + 1}.wav"
        write_wav(path, (wav * 32765).astype(np.int16), 16000)
        paths.append(path)
        print(f"wrote {path} ({len(wav) / 16000:.2f}s)")
    return paths


_DEFAULT_TEXTS = {
    "en": [
        "beginnings are apt to be determinative and when reinforced by "
        "continuous applications of similar influence",
        "which had restored the courage of noirtier for ever since he "
        "had conversed with the priest his violent despair had yielded "
        "to a calm resignation which surprised all who knew his "
        "excessive affection",
    ],
    "ja": [
        "また、東寺のように五大明王と呼ばれる主要な明王の中央に配されることも多い。",
        "ニューイングランド風は牛乳をベースとした白いクリームスープであり"
        "ボストンクラムチャウダーとも呼ばれる",
    ],
}


def cli_main(argv=None) -> None:
    parser = ArgumentParser()
    parser.add_argument("--align_config", required=True)
    parser.add_argument("--align_ckpt", required=True)
    parser.add_argument("--audio_config", required=True)
    parser.add_argument("--audio_ckpt", required=True)
    parser.add_argument("--language", default="en")
    parser.add_argument("--audio_stat", default=None)
    parser.add_argument("--text", action="append", default=None)
    parser.add_argument("--output_prefix", default="sample")
    parser.add_argument("--no_phone", action="store_true",
                        help="char-mode models (CharTokenizer)")
    parser.add_argument(
        "--platform", type=str, default=None,
        help="force a jax platform (e.g. cpu); this machine's "
             "sitecustomize pre-registers the TPU backend",
    )
    args = parser.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    texts = args.text or _DEFAULT_TEXTS[args.language]
    make_samples(
        align_config=args.align_config,
        align_ckpt_path=args.align_ckpt,
        audio_config=args.audio_config,
        audio_ckpt_path=args.audio_ckpt,
        sample_texts=texts,
        language=args.language,
        output_prefix=args.output_prefix,
        audio_stat=args.audio_stat,
        use_phone=not args.no_phone,
    )


if __name__ == "__main__":
    cli_main()
