"""One full training campaign through the real CLIs, end to end.

Round-4 verdict item 4: every piece of the stack had unit/e2e tests,
but the reference's complete documented workflow
(/root/reference/README.md:149-191) had never been executed as ONE
session on the chip. This script does exactly that, against a
multi-hour synthetic tonecode corpus (audio is a deterministic function
of text, so every stage is genuinely learnable):

  0. generate the corpus (tests/corpus_fixture.make_tonecode_corpus)
  1. ASR training (``python -m voice100_tpu fit``, bf16 + HBM device
     cache + multi-step scan dispatch) — interrupted mid-run with a
     real SIGTERM, then resumed from the saved 'last' checkpoint
  2. forced alignment over the corpus (``tools.align_text``) with the
     trained ASR — its output REPLACES the fixture's oracle align file
     (kept aside for an agreement metric)
  3. WORLD statistics (``tools.calc_stat``)
  4. duration-model training (TextToAlignText)
  5. acoustic-model training (AlignTextToAudio, world_mcep, the
     calc-stat file passed as --audio_stat)
  6. sample synthesis (``tools.update_samples``) -> WAV files
  7. round trip: the synthesized WAVs transcribed by the phase-1 ASR
     (inference.ASRPipeline), CER against the input sentences
  8. best-checkpoint audit: the ASR 'best' checkpoint's epoch must be
     the argmin-val-loss epoch from the training log

Each phase appends a JSONL record (wall time + key metrics) to
``<work>/endurance_log.jsonl``; ``--doc`` renders docs/endurance_run.md
from it. Reproduce with:

    python -m tools.endurance_run --work /tmp/endurance --doc
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

ASR_CONFIG = """\
seed_everything: 1234
trainer:
  max_epochs: {asr_epochs}
  gradient_clip_val: 1.0
  precision: bf16
  device_cache: true
  steps_per_dispatch: 8
  log_every_n_steps: 50
model:
  class_path: voice100_tpu.models.AudioToAlignText
  init_args:
    vocab_size: 29
    audio_size: 64
    encoder_settings:
    - [512, false, 5, 2, 2, false]
    - [512, false, 5, 1, 2, false]
    decoder_num_layers: 2
    decoder_hidden_size: 512
    learning_rate: 0.001
data:
  class_path: voice100_tpu.data.AudioTextDataModule
  init_args:
    vocoder: mel
    dataset: dummy_tonecode
    language: en
    sample_rate: 16000
    batch_size: 64
"""

ALIGN_CONFIG = """\
seed_everything: 1234
trainer:
  max_epochs: {align_epochs}
  gradient_clip_val: 1.0
  monitor: train_loss
  log_every_n_steps: 200
model:
  class_path: voice100_tpu.models.TextToAlignText
  init_args:
    vocab_size: 29
    num_layers: 2
    hidden_size: 256
    num_outputs: 2
    learning_rate: 0.001
data:
  class_path: voice100_tpu.data.AlignTextDataModule
  init_args:
    dataset: dummy_tonecode
    language: en
    batch_size: 128
    valid_ratio: 0.1
"""

TTS_CONFIG = """\
seed_everything: 1234
trainer:
  max_epochs: {tts_epochs}
  gradient_clip_val: 1.0
  monitor: train_loss
  precision: bf16
  log_every_n_steps: 200
model:
  class_path: voice100_tpu.models.AlignTextToAudio
  init_args:
    vocab_size: 29
    f0_size: 1
    logspc_size: 25
    codeap_size: 1
    encoder_num_layers: 2
    encoder_hidden_size: 512
    decoder_settings:
    - [512, false, 5, 1, 2, false]
    - [512, true, 5, 2, 2, false]
    - [512, false, 5, 1, 2, false]
    learning_rate: 0.001
data:
  class_path: voice100_tpu.data.AudioTextDataModule
  init_args:
    vocoder: world_mcep
    dataset: dummy_tonecode
    sample_rate: 16000
    language: en
    use_align: true
    batch_size: 64
    valid_ratio: 0.1
"""


class Log:
    def __init__(self, path: str) -> None:
        self.path = path
        self._t0 = time.time()
        # resumability: a phase recorded in an existing log is skipped
        # (its artifacts are on disk), so a crash mid-campaign resumes
        # instead of repaying the trained phases
        self.done = set()
        if os.path.exists(path):
            for line in open(path):
                self.done.add(json.loads(line)["phase"])

    def phase(self, name: str, t_start: float, **fields) -> None:
        rec = {
            "phase": name,
            "wall_s": round(time.time() - t_start, 1),
            "t_total_s": round(time.time() - self._t0, 1),
            **fields,
        }
        print(f"[endurance] {json.dumps(rec)}", flush=True)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        self.done.add(name)


PLATFORM = None  # set by main(); appended to every CLI invocation


def run(args, timeout=7200, **popen):
    if PLATFORM:
        args = list(args) + ["--platform", PLATFORM]
    print("[endurance] $", " ".join(args), flush=True)
    return subprocess.run(
        args, cwd=REPO, timeout=timeout, check=True, **popen
    )


def fit_args(cfg, work, name, **extra):
    out = [
        sys.executable, "-m", "voice100_tpu", "fit",
        "--config", cfg,
        "--data_dir", os.path.join(work, "data"),
        "--cache_dir", os.path.join(work, "cache"),
        "--checkpoint_dir", os.path.join(work, f"ckpt_{name}"),
        "--log_path", os.path.join(work, f"fit_{name}.jsonl"),
    ]
    for k, v in extra.items():
        out += [f"--{k}", str(v)]
    return out


def read_log(work, name):
    with open(os.path.join(work, f"fit_{name}.jsonl")) as f:
        return [json.loads(line) for line in f]


def phase_corpus(work, log, n_clips, chars_per_clip):
    from corpus_fixture import make_tonecode_corpus

    t = time.time()
    data_dir = os.path.join(work, "data")
    root = make_tonecode_corpus(
        data_dir, n_clips=n_clips, chars_per_clip=chars_per_clip,
    )
    # the REAL workflow must produce the alignment itself (phase 2);
    # keep the fixture's oracle aside for an agreement metric
    align_path = os.path.join(data_dir, "dummy_tonecode-align-train.txt")
    oracle_path = align_path + ".oracle"
    os.replace(align_path, oracle_path)
    n_samples = sum(
        os.path.getsize(os.path.join(root, "wavs", f)) - 44
        for f in os.listdir(os.path.join(root, "wavs"))
    ) // 2  # PCM16 payload (44-byte header)
    hours = n_samples / 16000 / 3600
    log.phase("corpus", t, clips=n_clips, hours=round(hours, 2))
    return data_dir, oracle_path


def phase_asr(work, log, asr_epochs, interrupt_after_epoch):
    cfg = os.path.join(work, "asr.yaml")
    if not os.path.exists(cfg):
        with open(cfg, "w") as f:
            f.write(ASR_CONFIG.format(asr_epochs=asr_epochs))
    log_path = os.path.join(work, "fit_asr.jsonl")
    last = os.path.join(work, "ckpt_asr", "last")

    if "asr_interrupt" not in log.done:
        # fresh start: the interrupt monitor reads the fit log, so a
        # stale one from a previous attempt must not trigger an
        # immediate SIGTERM (observed: the signal landed during jax
        # import, before the trainer's graceful handler existed)
        if os.path.exists(log_path):
            os.remove(log_path)
        # start, interrupt with a REAL SIGTERM once training is past
        # `interrupt_after_epoch`, confirm the graceful stop saved
        # 'last'
        t = time.time()
        asr_args = fit_args(cfg, work, "asr")
        if PLATFORM:
            asr_args += ["--platform", PLATFORM]
        proc = subprocess.Popen(asr_args, cwd=REPO)
        try:
            while proc.poll() is None:
                time.sleep(2.0)
                if not os.path.exists(log_path):
                    continue
                recs = [json.loads(line) for line in open(log_path)]
                done = [r["epoch"] for r in recs
                        if "train_time_s" in r]
                if done and max(done) >= interrupt_after_epoch:
                    proc.send_signal(signal.SIGTERM)
                    break
            rc = proc.wait(timeout=600)
        finally:
            if proc.poll() is None:
                proc.kill()
        assert rc == 0, f"ASR fit exited {rc} after SIGTERM"
        recs = read_log(work, "asr")
        assert any(r.get("event") == "stopped" for r in recs), (
            "no graceful-stop record; SIGTERM arrived after completion?"
        )
        assert os.path.isdir(last), "graceful stop did not save 'last'"
        stop_epoch = max(
            r["epoch"] for r in recs if "train_time_s" in r
        )
        log.phase("asr_interrupt", t, stopped_after_epoch=stop_epoch)

    if "asr_resume_train" not in log.done:
        # resume from 'last' and train to completion
        t = time.time()
        run(fit_args(cfg, work, "asr", restore_from=last))
        recs = read_log(work, "asr")
        epochs = {r["epoch"]: r for r in recs if "val_loss" in r}
        assert max(epochs) == asr_epochs - 1, sorted(epochs)
        final = epochs[max(epochs)]
        log.phase(
            "asr_resume_train", t,
            epochs=asr_epochs,
            final_val_loss=round(final["val_loss"], 4),
            final_val_cer=round(final["val_cer"], 4),
        )

    if "asr_best_audit" not in log.done:
        # best-checkpoint audit: 'best' must hold the argmin val-loss
        # epoch (runs on the main process's CPU-pinned jax)
        import orbax.checkpoint as ocp

        recs = read_log(work, "asr")
        epochs = {r["epoch"]: r for r in recs if "val_loss" in r}
        best_epoch = min(epochs, key=lambda e: epochs[e]["val_loss"])
        meta = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(os.path.join(work, "ckpt_asr", "best"))
        )["meta"]
        assert int(meta["epoch"]) == best_epoch + 1, (
            int(meta["epoch"]), best_epoch + 1,
        )
        log.phase(
            "asr_best_audit", time.time(), best_epoch=best_epoch,
            best_val_loss=round(epochs[best_epoch]["val_loss"], 4),
        )
    return cfg


def phase_align_text(work, log, asr_cfg, oracle_path):
    t = time.time()
    run([
        sys.executable, "-m", "voice100_tpu.tools.align_text",
        "--config", asr_cfg,
        "--checkpoint", os.path.join(work, "ckpt_asr", "best"),
        "--data_dir", os.path.join(work, "data"),
        "--cache_dir", os.path.join(work, "cache"),
        "--split", "train",
    ])
    produced = os.path.join(
        work, "data", "dummy_tonecode-align-train.txt"
    )
    assert os.path.exists(produced)
    n, err = _align_oracle_error(produced, oracle_path)
    log.phase("align_text", t, lines=n,
              oracle_mid_frame_err=err)
    return produced


def _align_oracle_error(produced, oracle_path):
    """Mean |midpoint - oracle midpoint| in frames, per character
    occurrence. The tonecode oracle renders each character as exactly
    10 contiguous frames with no blanks, while a real CTC Viterbi path
    interleaves blanks — so exact aligntext equality is the wrong
    metric; what matters is WHERE each character sits."""
    oracle = {}
    for line in open(oracle_path):
        text, aligntext, _ = line.rstrip("\n").split("|")
        oracle[text] = aligntext

    def midpoints(aligntext, text):
        mids, pos, ci = [], 0, 0
        i = 0
        n = len(aligntext)
        while i < n and ci < len(text):
            ch = text[ci]
            # span of this character occurrence: first..last index of
            # ch before the next distinct text character begins
            start = aligntext.find(ch, i)
            if start < 0:
                mids.append(None)
                ci += 1
                continue
            end = start
            j = start
            nxt = text[ci + 1] if ci + 1 < len(text) else None
            while j < n:
                if aligntext[j] == ch:
                    end = j
                elif nxt is not None and aligntext[j] == nxt:
                    break
                j += 1
            mids.append((start + end) / 2.0)
            i = end + 1
            ci += 1
        return mids

    n = 0
    total = cnt = 0.0
    for line in open(produced):
        text, aligntext, _ = line.rstrip("\n").split("|")
        ref = oracle.get(text)
        if ref is None:
            continue
        n += 1
        got = midpoints(aligntext, text)
        want = midpoints(ref, text)
        for g, w in zip(got, want):
            if g is not None and w is not None:
                total += abs(g - w)
                cnt += 1
    return n, round(total / max(cnt, 1.0), 2)


def phase_calc_stat(work, log):
    t = time.time()
    stat = os.path.join(work, "data", "dummy_tonecode-stat.npz")
    run([
        sys.executable, "-m", "voice100_tpu.tools.calc_stat",
        "--output", stat,
        "--dataset", "dummy_tonecode", "--vocoder", "world_mcep",
        "--language", "en",
        "--data_dir", os.path.join(work, "data"),
        "--cache_dir", os.path.join(work, "cache"),
        "--batch_size", "64",
    ])
    assert os.path.exists(stat)
    log.phase("calc_stat", t)
    return stat


def phase_fit(work, log, name, config_text):
    cfg = os.path.join(work, f"{name}.yaml")
    with open(cfg, "w") as f:
        f.write(config_text)
    t = time.time()
    extra = {}
    if name == "tts":
        extra["audio_stat"] = os.path.join(
            work, "data", "dummy_tonecode-stat.npz"
        )
    run(fit_args(cfg, work, name, **extra))
    recs = read_log(work, name)
    losses = [r for r in recs if "train_loss" in r and "train_time_s" in r]
    log.phase(
        f"{name}_train", t, epochs=len(losses),
        final_train_loss=round(losses[-1]["train_loss"], 4),
    )
    return cfg


def phase_samples(work, log, align_cfg, tts_cfg, sentences):
    t = time.time()
    prefix = os.path.join(work, "samples", "sample")
    os.makedirs(os.path.dirname(prefix), exist_ok=True)
    args = [
        sys.executable, "-m", "voice100_tpu.tools.update_samples",
        "--align_config", align_cfg,
        "--align_ckpt", os.path.join(work, "ckpt_align", "best"),
        "--audio_config", tts_cfg,
        "--audio_ckpt", os.path.join(work, "ckpt_tts", "best"),
        "--language", "en", "--no_phone",
        "--audio_stat",
        os.path.join(work, "data", "dummy_tonecode-stat.npz"),
        "--output_prefix", prefix,
    ]
    for s in sentences:
        args += ["--text", s]
    run(args)
    wavs = sorted(
        os.path.join(work, "samples", f)
        for f in os.listdir(os.path.join(work, "samples"))
        if f.endswith(".wav")
    )
    assert len(wavs) == len(sentences), wavs
    log.phase("update_samples", t, wavs=len(wavs))
    return wavs


def phase_round_trip(work, log, wavs, sentences):
    t = time.time()
    from voice100_tpu.data import AudioTextDataModule  # noqa: F401
    from voice100_tpu.dsp.audioio import load_audio
    from voice100_tpu.inference import ASRPipeline
    from voice100_tpu.models import AudioToAlignText
    from voice100_tpu.training.checkpoint import load_variables

    model = AudioToAlignText(
        audio_size=64, vocab_size=29,
        encoder_settings=((512, False, 5, 2, 2, False),
                          (512, False, 5, 1, 2, False)),
        decoder_num_layers=2, decoder_hidden_size=512,
    )
    variables = load_variables(os.path.join(work, "ckpt_asr", "best"))
    pipe = ASRPipeline(model, variables, batch_size=4,
                       buckets_sec=(6.0,))
    hyps = pipe.transcribe([load_audio(w) for w in wavs])

    def cer(hyp, ref):
        import numpy as np

        m, n = len(hyp), len(ref)
        dp = np.arange(n + 1)
        for i in range(1, m + 1):
            prev = dp.copy()
            dp[0] = i
            for j in range(1, n + 1):
                dp[j] = min(prev[j] + 1, dp[j - 1] + 1,
                            prev[j - 1] + (hyp[i - 1] != ref[j - 1]))
        return float(dp[n]) / max(n, 1)

    cers = [round(cer(h, r), 4) for h, r in zip(hyps, sentences)]
    log.phase("tts_asr_round_trip", t, cers=cers,
              mean_cer=round(sum(cers) / len(cers), 4),
              hyps=hyps, refs=sentences)


def write_doc(work):
    recs = [json.loads(line)
            for line in open(os.path.join(work, "endurance_log.jsonl"))]
    lines = [
        "# Endurance run: the full reference workflow in one session",
        "",
        "Generated by `python -m tools.endurance_run --work <dir> "
        "--doc` (round-4 verdict item 4). One continuous campaign on "
        "the chip through the real CLIs: corpus -> ASR train "
        "(bf16 + device cache + scan dispatch, interrupted by a real "
        "SIGTERM and resumed) -> align-text -> calc-stat -> duration "
        "train -> acoustic train -> update-samples WAVs -> TTS->ASR "
        "round trip, with a best-checkpoint audit.",
        "",
        "| phase | wall (s) | details |",
        "|---|---|---|",
    ]
    for r in recs:
        detail = {k: v for k, v in r.items()
                  if k not in ("phase", "wall_s", "t_total_s")}
        lines.append(
            f"| {r['phase']} | {r['wall_s']} | "
            f"{json.dumps(detail, ensure_ascii=False)} |"
        )
    total = recs[-1]["t_total_s"]
    lines += [
        "",
        f"Total wall time: **{total:.0f} s** "
        f"({total / 3600:.2f} h).",
        "",
        "Raw log: the `endurance_log.jsonl` lines above were copied "
        "verbatim from the run's work directory.",
    ]
    path = os.path.join(REPO, "docs", "endurance_run.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"[endurance] wrote {path}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", required=True)
    ap.add_argument("--n_clips", type=int, default=1900)
    ap.add_argument("--chars_per_clip", type=int, default=24)
    ap.add_argument("--asr_epochs", type=int, default=40)
    ap.add_argument("--align_epochs", type=int, default=150)
    ap.add_argument("--tts_epochs", type=int, default=120)
    ap.add_argument("--interrupt_after_epoch", type=int, default=2)
    ap.add_argument("--doc", action="store_true",
                    help="render docs/endurance_run.md from the log")
    ap.add_argument("--platform", default=None,
                    help="force every phase onto a jax platform "
                         "(e.g. cpu when the TPU tunnel is down)")
    args = ap.parse_args()

    os.makedirs(args.work, exist_ok=True)
    # the MAIN process only audits checkpoints and runs the final
    # 4-clip round trip — pin it to CPU (an orbax restore to the
    # tunneled TPU backend was observed to hang); every training/tool
    # phase is a subprocess with the default (TPU) platform
    import jax

    jax.config.update("jax_platforms", "cpu")
    global PLATFORM
    PLATFORM = args.platform
    log = Log(os.path.join(args.work, "endurance_log.jsonl"))

    data_dir = os.path.join(args.work, "data")
    oracle = os.path.join(
        data_dir, "dummy_tonecode-align-train.txt.oracle")
    if "corpus" not in log.done:
        data_dir, oracle = phase_corpus(
            args.work, log, args.n_clips, args.chars_per_clip
        )
    asr_cfg = phase_asr(
        args.work, log, args.asr_epochs, args.interrupt_after_epoch
    )
    if "align_text" not in log.done:
        phase_align_text(args.work, log, asr_cfg, oracle)
    if "calc_stat" not in log.done:
        phase_calc_stat(args.work, log)
    align_cfg = os.path.join(args.work, "align.yaml")
    if "align_train" not in log.done:
        align_cfg = phase_fit(
            args.work, log, "align",
            ALIGN_CONFIG.format(align_epochs=args.align_epochs),
        )
    tts_cfg = os.path.join(args.work, "tts.yaml")
    if "tts_train" not in log.done:
        tts_cfg = phase_fit(
            args.work, log, "tts",
            TTS_CONFIG.format(tts_epochs=args.tts_epochs),
        )
    with open(os.path.join(
            data_dir, "dummy-speech-tonecode", "metadata.csv")) as f:
        sentences = [line.split("|")[1] for line in f][:4]
    wavs = phase_samples(args.work, log, align_cfg, tts_cfg, sentences)
    phase_round_trip(args.work, log, wavs, sentences)
    if args.doc:
        write_doc(args.work)


if __name__ == "__main__":
    main()
