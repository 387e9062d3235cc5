"""Warm the WORLD/mel feature cache by iterating the loaders once
(parity with voice100/cache_dataset.py:10-24)."""

from __future__ import annotations

from argparse import ArgumentParser


def cli_main(argv=None) -> None:
    from ..data import AudioTextDataModule

    parser = ArgumentParser()
    parser.add_argument("--vocoder", default="world",
                        choices=["mel", "world", "world_mcep"])
    parser.add_argument("--dataset", default="ljspeech")
    parser.add_argument("--language", default="en")
    parser.add_argument("--sample_rate", type=int, default=16000)
    parser.add_argument("--use_align", action="store_true")
    parser.add_argument("--use_phone", action="store_true")
    parser.add_argument("--data_dir", default="./data")
    parser.add_argument("--cache_dir", default="./cache")
    parser.add_argument("--batch_size", type=int, default=32)
    args = parser.parse_args(argv)

    data = AudioTextDataModule(
        vocoder=args.vocoder,
        dataset=args.dataset,
        sample_rate=args.sample_rate,
        language=args.language,
        use_align=args.use_align,
        use_phone=args.use_phone,
        data_dir=args.data_dir,
        cache_dir=args.cache_dir,
        batch_size=args.batch_size,
    )
    data.setup("predict")
    n = 0
    for batch in data.predict_dataloader():
        n += 1
    print(f"[cache-dataset] warmed cache over {n} batches")


if __name__ == "__main__":
    cli_main()
