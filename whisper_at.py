"""Drop-in compatibility shim: `import whisper_at` -> whisper_at_tpu.

Code written against the reference package (e.g. the training utilities'
`import whisper_at` in utilities/whisper_at_as_eval.py) runs against this
framework unchanged.
"""

from whisper_at_tpu import *  # noqa: F401,F403
from whisper_at_tpu import (  # noqa: F401
    DecodingOptions,
    DecodingResult,
    ModelDimensions,
    Whisper,
    available_models,
    build_model,
    decode,
    detect_language,
    load_audio,
    load_model,
    log_mel_spectrogram,
    pad_or_trim,
    parse_at_label,
    print_label_name,
    print_support_language,
    transcribe,
    transcribe_batched,
)
