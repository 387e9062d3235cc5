"""WORLD feature statistics -> ``{ds}-stat.npz`` for WORLDNorm.

Parity with the reference CLI (voice100/calc_stat.py:24-80): streaming
masked mean/std of f0 (mask f0 > 30), logspc (length mask), and codeap
(mask codeap < -0.2) over the predict loader. Output keys match the
WORLDNorm parameter names.
"""

from __future__ import annotations

from argparse import ArgumentParser

import numpy as np

__all__ = ["calc_stat", "cli_main"]


def calc_stat(data, output_path: str) -> dict:
    f0_dim, spc_dim, codeap_dim = data.audio_transform.vocoder.output_dims
    assert f0_dim == 1

    f0_sum = 0.0
    f0_sqr = 0.0
    f0_cnt = 0.0
    spc_sum = np.zeros(spc_dim)
    spc_sqr = np.zeros(spc_dim)
    spc_cnt = 0.0
    cap_sum = np.zeros(codeap_dim)
    cap_sqr = np.zeros(codeap_dim)
    cap_cnt = np.zeros(codeap_dim)

    for (f0, f0_len, logspc, codeap), _ in data.predict_dataloader():
        t = f0.shape[1]
        mask = (np.arange(t)[None, :] < f0_len[:, None]).astype(np.float64)
        f0mask = (f0 > 30.0) * mask
        capmask = (codeap < -0.2) * mask[:, :, None]

        f0_sum += float((f0 * f0mask).sum())
        f0_sqr += float((f0**2 * f0mask).sum())
        f0_cnt += float(f0mask.sum())

        spc_sum += (logspc * mask[:, :, None]).sum(axis=(0, 1))
        spc_sqr += (logspc**2 * mask[:, :, None]).sum(axis=(0, 1))
        spc_cnt += float(mask.sum())

        cap_sum += (codeap * capmask).sum(axis=(0, 1))
        cap_sqr += (codeap**2 * capmask).sum(axis=(0, 1))
        cap_cnt += capmask.sum(axis=(0, 1))

    def mean_std(s, sq, n):
        n = np.maximum(n, 1.0)
        mean = s / n
        var = np.maximum(sq / n - mean**2, 1e-12)
        return mean, np.sqrt(var)

    f0_mean, f0_std = mean_std(f0_sum, f0_sqr, f0_cnt)
    spc_mean, spc_std = mean_std(spc_sum, spc_sqr, spc_cnt)
    # reference uses the logspc count for codeap normalization
    # (voice100/calc_stat.py:58)
    cap_mean, cap_std = mean_std(cap_sum, cap_sqr, spc_cnt)

    stats = {
        "f0_mean": np.asarray([f0_mean], np.float32),
        "f0_std": np.asarray([f0_std], np.float32),
        "logspc_mean": spc_mean.astype(np.float32),
        "logspc_std": spc_std.astype(np.float32),
        "codeap_mean": cap_mean.astype(np.float32),
        "codeap_std": cap_std.astype(np.float32),
    }
    np.savez(output_path, **stats)
    return stats


def cli_main(argv=None) -> None:
    from ..data import AudioTextDataModule

    parser = ArgumentParser(
        description="Make the WORLD stat file for TTS training"
    )
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--dataset", type=str, default="ljspeech")
    parser.add_argument("--vocoder", type=str, default="world",
                        choices=["world", "world_mcep"])
    parser.add_argument("--language", type=str, default="en")
    parser.add_argument("--sample_rate", type=int, default=16000)
    parser.add_argument("--use_phone", action="store_true")
    parser.add_argument("--data_dir", type=str, default="./data")
    parser.add_argument("--cache_dir", type=str, default="./cache")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument(
        "--platform", type=str, default=None,
        help="force a jax platform (e.g. cpu); this machine's "
             "sitecustomize pre-registers the TPU backend",
    )
    args = parser.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    data = AudioTextDataModule(
        vocoder=args.vocoder,
        dataset=args.dataset,
        sample_rate=args.sample_rate,
        language=args.language,
        use_align=True,
        use_phone=args.use_phone,
        data_dir=args.data_dir,
        cache_dir=args.cache_dir,
        batch_size=args.batch_size,
    )
    data.setup("predict")
    calc_stat(data, args.output)
    print(f"[calc-stat] wrote {args.output}")


if __name__ == "__main__":
    cli_main()
