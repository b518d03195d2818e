"""Gradio demo: joint ASR + audio tagging in the browser.

Parity with the reference HF Space app (reference app.py:9-58): model-size
radio, mic/file input, language selection, tagging time-resolution textbox
rounded to 0.4 s multiples, rendered ASR segments + top-5 tags per segment.
Gradio is an optional dependency; the module degrades to a clear message
when it isn't installed.
"""

import numpy as np

import whisper_at_tpu as wat

MODEL_SIZES = ["tiny", "base", "small", "large-v1"]
_models = {}


def _get_model(size: str):
    if size not in _models:
        _models[size] = wat.load_model(size)
    return _models[size]


def round_time_res(value: float) -> float:
    """Round to the nearest positive multiple of 0.4 s (app.py behavior)."""
    try:
        value = float(value)
    except (TypeError, ValueError):
        return 10.0
    return max(0.4, round(value / 0.4) * 0.4)


def predict(audio_path: str, model_size: str, language: str, time_res) -> str:
    model = _get_model(model_size)
    time_res = round_time_res(time_res)
    lang = None if language in (None, "", "auto") else language
    result = wat.transcribe(model, audio_path, at_time_res=time_res, language=lang)
    tags = wat.parse_at_label(result, language="en", top_k=5, p_threshold=-1)

    lines = []
    for segment, tag in zip_segments_tags(result["segments"], tags, time_res):
        lines.append(segment)
        if tag is not None:
            names = ", ".join(name for name, _ in tag["audio tags"])
            lines.append(f"  [sounds: {names}]")
    return "\n".join(lines) if lines else result["text"]


def zip_segments_tags(segments, tags, time_res):
    for seg in segments:
        text = f"[{seg['start']:.1f}s -> {seg['end']:.1f}s] {seg['text'].strip()}"
        idx = int(seg["start"] // time_res)
        yield text, tags[idx] if idx < len(tags) else None


def main():
    try:
        import gradio as gr
    except ImportError:
        raise SystemExit(
            "The demo UI requires gradio (`pip install gradio`). The underlying "
            "API is available as whisper_at_tpu.transcribe / parse_at_label."
        )

    demo = gr.Interface(
        fn=predict,
        inputs=[
            gr.Audio(type="filepath", label="Audio (mic or file)"),
            gr.Radio(MODEL_SIZES, value="base", label="Model size"),
            gr.Textbox(value="auto", label="Language (code or 'auto')"),
            gr.Textbox(value="10", label="Tag time resolution (multiple of 0.4 s)"),
        ],
        outputs=gr.Textbox(label="Transcript + sound tags"),
        title="Whisper-AT (TPU): joint speech recognition and audio tagging",
    )
    demo.launch()


if __name__ == "__main__":
    main()
