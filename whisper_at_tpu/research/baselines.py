"""wav2vec2 / HuBERT baseline runners for the noise-robustness comparison.

Equivalents of the reference's HF-transformers ASR scripts
(noise_robust_asr/asr_experiments/transcribe_{w2v,hubert}*.py) and the
SSL-model feature extractors (intermediate_feat_extract/{w2v,hubert}).
The torch models run on CPU (they are baselines, not the TPU product path);
model downloads are attempted lazily and failures surface clearly.
"""

import os
from typing import List, Optional

import numpy as np

from ..audio import load_audio

BASELINE_MODELS = {
    "wav2vec2-base": "facebook/wav2vec2-base-960h",
    "wav2vec2-robust": "facebook/wav2vec2-large-robust-ft-swbd-300h",
    "hubert-large": "facebook/hubert-large-ls960-ft",
    "hubert-xlarge": "facebook/hubert-xlarge-ls960-ft",
}


def _load_ctc(model_name: str):
    try:
        import torch  # noqa: F401
        from transformers import AutoModelForCTC, AutoProcessor
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("transformers/torch required for baselines") from e
    repo = BASELINE_MODELS.get(model_name, model_name)
    processor = AutoProcessor.from_pretrained(repo)
    model = AutoModelForCTC.from_pretrained(repo)
    model.eval()
    return processor, model


def transcribe_ctc(model_name: str, audio_paths: List[str], text_dir: str) -> List[str]:
    """Greedy CTC transcription of a file list into .txt outputs."""
    import torch

    processor, model = _load_ctc(model_name)
    os.makedirs(text_dir, exist_ok=True)
    outputs = []
    for path in audio_paths:
        out_path = os.path.join(
            text_dir, os.path.splitext(os.path.basename(path))[0] + ".txt"
        )
        if os.path.exists(out_path):
            continue
        audio = load_audio(path)
        inputs = processor(audio, sampling_rate=16000, return_tensors="pt")
        with torch.no_grad():
            logits = model(inputs.input_values).logits
        ids = torch.argmax(logits, dim=-1)
        text = processor.batch_decode(ids)[0]
        with open(out_path, "w") as f:
            f.write(text)
        outputs.append(out_path)
    return outputs


def extract_ssl_features(
    model_name: str,
    audio,
    pool: Optional[int] = 20,
) -> np.ndarray:
    """All-layer hidden states of a wav2vec2/HuBERT model, optionally
    time-pooled — the SSL analogue of the Whisper all-layer taps."""
    import torch
    from transformers import AutoModel, AutoProcessor

    repo = BASELINE_MODELS.get(model_name, model_name)
    processor = AutoProcessor.from_pretrained(repo)
    model = AutoModel.from_pretrained(repo, output_hidden_states=True)
    model.eval()

    if isinstance(audio, str):
        audio = load_audio(audio)
    inputs = processor(audio, sampling_rate=16000, return_tensors="pt")
    with torch.no_grad():
        out = model(inputs.input_values)
    # hidden_states: tuple of [1, T, D] incl. the embedding output
    taps = torch.stack(out.hidden_states, dim=0)[:, 0].numpy()  # [L+1, T, D]
    if pool:
        n_layers, t, d = taps.shape
        taps = taps[:, : (t // pool) * pool].reshape(
            n_layers, t // pool, pool, d
        ).mean(axis=2)
    return taps
