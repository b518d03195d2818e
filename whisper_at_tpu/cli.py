"""Command-line interface for transcription + tagging.

Flag surface matches the reference CLI (whisper_at/transcribe.py:406-489)
plus the audio-tagging flags (--at_time_res, --at_low_compute).
"""

import argparse
import os
import warnings

import numpy as np

from .tokenizer import LANGUAGES, TO_LANGUAGE_CODE
from .transcribe import transcribe
from .utils import (
    get_writer,
    honor_jax_platforms_env,
    optional_float,
    optional_int,
    str2bool,
)


def cli(argv=None):
    # effective for every entry path: python -m whisper_at_tpu AND the
    # installed console script (setup.py: whisper_at_tpu.transcribe:cli)
    honor_jax_platforms_env()
    from . import available_models, load_model

    # fmt: off
    parser = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("audio", nargs="+", type=str, help="audio file(s) to transcribe")
    parser.add_argument("--model", default="small", help="name of the Whisper model to use, or a path to a local checkpoint (.npz native format, or a Whisper .pt — pair the latter with --at_checkpoint for tagging)")
    parser.add_argument("--at_checkpoint", type=str, default=None, help="local TL-TR head .pth to merge when --model is a local .pt")
    parser.add_argument("--batched", type=str2bool, default=False, help="use the batched TPU fast path (all 30s windows decode in parallel; implies condition_on_previous_text=False)")
    parser.add_argument("--model_dir", type=str, default=None, help="the path to save model files; uses ~/.cache/whisper by default")
    parser.add_argument("--output_dir", "-o", type=str, default=".", help="directory to save the outputs")
    parser.add_argument("--output_format", "-f", type=str, default="all", choices=["txt", "vtt", "srt", "tsv", "json", "all"], help="format of the output file; if not specified, all available formats will be produced")
    parser.add_argument("--verbose", type=str2bool, default=True, help="whether to print out progress and debug messages")

    parser.add_argument("--task", type=str, default="transcribe", choices=["transcribe", "translate"], help="whether to perform X->X speech recognition ('transcribe') or X->English translation ('translate')")
    parser.add_argument("--language", type=str, default=None, choices=sorted(LANGUAGES.keys()) + sorted([k.title() for k in TO_LANGUAGE_CODE.keys()]), help="language spoken in the audio, specify None to perform language detection")

    parser.add_argument("--at_time_res", type=float, default=10, help="audio tagging time resolution in seconds; must be a multiple of 0.4")
    parser.add_argument("--at_low_compute", type=str2bool, default=False, help="use the low-compute TL-TR-512 tagging head")

    parser.add_argument("--temperature", type=float, default=0, help="temperature to use for sampling")
    parser.add_argument("--best_of", type=optional_int, default=5, help="number of candidates when sampling with non-zero temperature")
    parser.add_argument("--beam_size", type=optional_int, default=5, help="number of beams in beam search, only applicable when temperature is zero")
    parser.add_argument("--patience", type=float, default=None, help="optional patience value to use in beam decoding, as in https://arxiv.org/abs/2204.05424, the default (1.0) is equivalent to conventional beam search")
    parser.add_argument("--length_penalty", type=float, default=None, help="optional token length penalty coefficient (alpha) as in https://arxiv.org/abs/1609.08144, uses simple length normalization by default")

    parser.add_argument("--suppress_tokens", type=str, default="-1", help="comma-separated list of token ids to suppress during sampling; '-1' will suppress most special characters except common punctuations")
    parser.add_argument("--initial_prompt", type=str, default=None, help="optional text to provide as a prompt for the first window")
    parser.add_argument("--condition_on_previous_text", type=str2bool, default=True, help="if True, provide the previous output of the model as a prompt for the next window")
    parser.add_argument("--fp16", type=str2bool, default=True, help="whether to perform inference in half precision (bfloat16 on TPU)")

    parser.add_argument("--temperature_increment_on_fallback", type=optional_float, default=0.2, help="temperature to increase when falling back when the decoding fails to meet either of the thresholds below")
    parser.add_argument("--compression_ratio_threshold", type=optional_float, default=2.4, help="if the gzip compression ratio is higher than this value, treat the decoding as failed")
    parser.add_argument("--logprob_threshold", type=optional_float, default=-1.0, help="if the average log probability is lower than this value, treat the decoding as failed")
    parser.add_argument("--no_speech_threshold", type=optional_float, default=0.6, help="if the probability of the <|nospeech|> token is higher than this value AND the decoding has failed due to `logprob_threshold`, consider the segment as silence")
    parser.add_argument("--word_timestamps", type=str2bool, default=False, help="(experimental) extract word-level timestamps and refine the results based on them")
    parser.add_argument("--prepend_punctuations", type=str, default="\"'“¿([{-", help="if word_timestamps is True, merge these punctuation symbols with the next word")
    parser.add_argument("--append_punctuations", type=str, default="\"'.。,，!！?？:：”)]}、", help="if word_timestamps is True, merge these punctuation symbols with the previous word")
    parser.add_argument("--highlight_words", type=str2bool, default=False, help="(requires --word_timestamps True) underline each word as it is spoken in srt and vtt")
    parser.add_argument("--max_line_width", type=optional_int, default=None, help="(requires --word_timestamps True) the maximum number of characters in a line before breaking the line")
    parser.add_argument("--max_line_count", type=optional_int, default=None, help="(requires --word_timestamps True) the maximum number of lines in a segment")
    # fmt: on

    args = parser.parse_args(argv).__dict__
    model_name: str = args.pop("model")
    at_checkpoint = args.pop("at_checkpoint")
    batched: bool = args.pop("batched")
    model_dir: str = args.pop("model_dir")
    output_dir: str = args.pop("output_dir")
    output_format: str = args.pop("output_format")
    at_low_compute: bool = args.pop("at_low_compute")
    os.makedirs(output_dir, exist_ok=True)

    if model_name not in available_models() and not os.path.isfile(model_name):
        parser.error(
            f"--model must be an official name {available_models()} or a "
            f"local checkpoint path; got {model_name!r}"
        )

    if model_name.endswith(".en") and args["language"] not in {"en", "English"}:
        if args["language"] is not None:
            warnings.warn(
                f"{model_name} is an English-only model but received "
                f"'{args['language']}'; using English instead."
            )
        args["language"] = "en"

    temperature = args.pop("temperature")
    if (increment := args.pop("temperature_increment_on_fallback")) is not None:
        temperature = tuple(np.arange(temperature, 1.0 + 1e-6, increment))
    else:
        temperature = [temperature]

    # validate flag combinations BEFORE the (potentially multi-GB) model
    # download — unlike the reference, which checks after load_model
    word_options = ["highlight_words", "max_line_count", "max_line_width"]
    if not args["word_timestamps"]:
        for option in word_options:
            if args[option]:
                parser.error(f"--{option} requires --word_timestamps True")
    if args["max_line_count"] and not args["max_line_width"]:
        warnings.warn("--max_line_count has no effect without --max_line_width")
    writer_args = {arg: args.pop(arg) for arg in word_options}

    model = load_model(model_name, download_root=model_dir,
                       at_low_compute=at_low_compute,
                       at_checkpoint=at_checkpoint)

    writer = get_writer(output_format, output_dir)
    audio_paths = args.pop("audio")
    if batched:
        args.pop("condition_on_previous_text", None)  # windows are parallel
        if len(audio_paths) > 1:
            # serving fast path: pack every file's windows into shared
            # device batches instead of one underfilled run per file
            from .transcribe import transcribe_many

            results = transcribe_many(model, audio_paths,
                                      temperature=temperature, **args)
            for audio_path, result in zip(audio_paths, results):
                writer(result, audio_path, writer_args)
            return
        from .transcribe import transcribe_batched

        run = transcribe_batched
    else:
        run = transcribe
    for audio_path in audio_paths:
        result = run(model, audio_path, temperature=temperature, **args)
        writer(result, audio_path, writer_args)



if __name__ == "__main__":
    cli()
