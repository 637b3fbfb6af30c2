"""Interactive web demo: audio upload -> generated motion video.

Usage: python -m syntalker_tpu.cli.demo -c configs/diffusion_beat2.yaml

Capability parity with the reference ``demo.py`` (Gradio app :700-761).
The ASR step (whisper-tiny, demo.py:41-46) and forced alignment (MFA
subprocess, :76-78) are optional preprocessing: with a local whisper
snapshot we transcribe and energy-align the words over voiced audio
(generate.py --transcript); without one the model runs audio-only
(word ids = silence), which the denoiser supports.
Falls back to a one-shot CLI when gradio is not installed.
"""

from __future__ import annotations

import logging
import tempfile
from pathlib import Path

from syntalker_tpu.cli.common import base_parser, setup

log = logging.getLogger("syntalker")


def transcribe_if_available(wav_path: str, whisper_path: str = "") -> str:
    """Optional whisper-tiny transcription (demo.py:41-46)."""
    if not whisper_path:
        return ""
    try:
        from transformers import pipeline

        asr = pipeline(
            "automatic-speech-recognition", model=whisper_path, local_files_only=True
        )
        return asr(wav_path)["text"]
    except Exception as e:
        log.warning(f"ASR unavailable: {e}")
        return ""


def run_one(cfg_path, overrides, wav_path, prompts, run_dir, transcript=""):
    from syntalker_tpu.cli import generate as gen_cli

    out = Path(run_dir) / "demo_out.npz"
    argv = ["-c", cfg_path, "--wav", wav_path, "--out", str(out), "--render",
            "--run-dir", run_dir] if cfg_path else [
        "--wav", wav_path, "--out", str(out), "--render", "--run-dir", run_dir]
    if transcript:
        argv += ["--transcript", transcript]
    for part, text in (prompts or {}).items():
        if text:
            argv += [f"--{part}-prompt", text]
    argv += overrides
    gen_cli.main(argv)
    video = out.with_suffix(".mp4")
    return str(video if video.exists() else out.with_suffix(".gif"))


def main(argv=None):
    p = base_parser(__doc__)
    p.add_argument("--wav", type=str, default="", help="one-shot mode input")
    p.add_argument("--whisper-path", type=str, default="",
                   help="local whisper snapshot for ASR (optional)")
    p.add_argument("--share", action="store_true")
    args = p.parse_args(argv)
    setup(args)

    if args.wav:  # one-shot CLI mode
        text = transcribe_if_available(args.wav, args.whisper_path)
        video = run_one(args.config, args.overrides, args.wav, {}, args.run_dir,
                        transcript=text)
        log.info(f"demo output: {video}")
        return

    try:
        import gradio as gr
    except ImportError:
        raise SystemExit(
            "gradio is not installed; run one-shot mode with --wav input.wav"
        )

    def fn(audio_file, upper, hands, lower):
        return run_one(
            args.config,
            args.overrides,
            audio_file,
            {"upper": upper, "hands": hands, "lower": lower},
            tempfile.mkdtemp(),
            transcript=transcribe_if_available(
                audio_file, args.whisper_path
            ),
        )

    gr.Interface(
        fn=fn,
        inputs=[
            gr.Audio(type="filepath", label="speech audio"),
            gr.Textbox(label="upper-body prompt (optional)"),
            gr.Textbox(label="hands prompt (optional)"),
            gr.Textbox(label="lower-body prompt (optional)"),
        ],
        outputs=gr.Video(label="generated motion"),
        title="SynTalker-TPU",
    ).launch(share=args.share)


if __name__ == "__main__":
    main()
