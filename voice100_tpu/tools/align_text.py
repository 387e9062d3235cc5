"""Batch forced alignment -> ``{ds}-[phone-]align-{split}.txt``.

Parity with the reference CLI (voice100/align_text.py:12-57): runs the
ASR model over the corpus, Viterbi-aligns each utterance to its text,
and writes ``text|aligntext|counts`` lines where counts is the per-slot
frame histogram over the 2L+1 blank-interleaved lattice.

TPU-first difference: the alignment itself is the batched on-device
``ctc_viterbi_align`` instead of a per-utterance NumPy loop
(voice100/models/_asr_v2.py:106-115).
"""

from __future__ import annotations

import os
from argparse import ArgumentParser

import numpy as np

__all__ = ["cli_main", "run_align"]


def run_align(model, variables, data, output_path: str) -> int:
    """Write align-text lines for every clip; returns the line count."""
    import jax
    import jax.numpy as jnp

    tokenizer = data.text_transform

    @jax.jit
    def best_path(variables, audio, audio_len, text, text_len):
        res, logits_len = model.apply(
            variables, audio, audio_len, text, text_len,
            method=type(model).ctc_best_path,
        )
        return res, logits_len

    n = 0
    loader = data.predict_dataloader()
    with open(output_path, "w", encoding="utf-8") as f:
        for batch, n_real in loader.iter_with_counts():
            (audio, audio_len), (text, text_len) = batch
            res, logits_len = best_path(
                variables,
                jnp.asarray(audio), jnp.asarray(audio_len),
                jnp.asarray(text), jnp.asarray(text_len),
            )
            path = np.asarray(res.path)
            labels = np.asarray(res.labels)
            logits_len = np.asarray(logits_len)
            # only the real rows: the loader pads the final batch to a
            # full static shape by repeating items, and duplicate align
            # lines would break downstream MergeDataset length checks
            for i in range(n_real):
                n_slots = 2 * int(text_len[i]) + 1
                hist = np.bincount(
                    path[i, : logits_len[i]], minlength=n_slots
                )[:n_slots]
                raw_text = tokenizer.decode(text[i, : int(text_len[i])])
                aligntext = tokenizer.decode(labels[i, : logits_len[i]])
                counts = " ".join(str(int(c)) for c in hist)
                f.write(f"{raw_text}|{aligntext}|{counts}\n")
                n += 1
    return n


def cli_main(argv=None) -> None:
    from ..training.checkpoint import load_variables
    from ..training.cli import load_config, build_from_config

    parser = ArgumentParser()
    parser.add_argument("--config", required=True,
                        help="model config YAML (asr_*)")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--data_dir", default="./data")
    parser.add_argument("--cache_dir", default="./cache")
    parser.add_argument("--dataset", default=None)
    parser.add_argument("--split", default="train")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--output", default=None)
    parser.add_argument(
        "--platform", type=str, default=None,
        help="force a jax platform (e.g. cpu); this machine's "
             "sitecustomize pre-registers the TPU backend",
    )
    args = parser.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    config = load_config(args.config)
    model, data, _, _ = build_from_config(
        config,
        {k: v for k, v in {
            "data_dir": args.data_dir,
            "cache_dir": args.cache_dir,
            "batch_size": args.batch_size,
        }.items() if v is not None},
    )
    if args.dataset:
        data.dataset = args.dataset
    # alignment always reads mel features (reference align_text.py:17)
    assert data.vocoder == "mel", "align-text expects a mel-mode config"
    variables = load_variables(args.checkpoint)

    infix = "phone-align" if data.use_phone else "align"
    output = args.output or os.path.join(
        args.data_dir, f"{data.dataset}-{infix}-{args.split}.txt"
    )
    data.setup("predict")
    n = run_align(model, variables, data, output)
    print(f"[align-text] wrote {n} lines to {output}")


if __name__ == "__main__":
    cli_main()
