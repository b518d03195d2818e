"""wav2vec2 / HuBERT baseline runners for the noise-robustness comparison.

Equivalents of the reference's HF-transformers ASR scripts
(noise_robust_asr/asr_experiments/transcribe_{w2v,hubert}*.py) and the
SSL-model feature extractors (intermediate_feat_extract/{w2v,hubert}).
The torch models run on CPU (they are baselines, not the TPU product path);
model downloads are attempted lazily and failures surface clearly. In
egress-less environments `build_local_ctc`/`build_local_ssl` construct
random-weight models of the same architecture fully offline, so the whole
experiment loop (mix -> transcribe -> WER) stays executable end to end;
swap in a `processor_model` from `_load_ctc` when downloads work.
"""

import json
import os
import tempfile
from typing import List, Optional, Tuple

import numpy as np

from ..audio import load_audio

BASELINE_MODELS = {
    "wav2vec2-base": "facebook/wav2vec2-base-960h",
    "wav2vec2-robust": "facebook/wav2vec2-large-robust-ft-swbd-300h",
    "hubert-large": "facebook/hubert-large-ls960-ft",
    "hubert-xlarge": "facebook/hubert-xlarge-ls960-ft",
}

# the released wav2vec2/HuBERT CTC character inventory (letters + word
# boundary '|' + apostrophe), enough for WER scoring of English text
_CTC_VOCAB = ["<pad>", "<s>", "</s>", "<unk>", "|", "'"] + [
    chr(c) for c in range(ord("A"), ord("Z") + 1)
]


def _local_processor():
    from transformers import (
        Wav2Vec2CTCTokenizer,
        Wav2Vec2FeatureExtractor,
        Wav2Vec2Processor,
    )

    with tempfile.TemporaryDirectory() as td:
        vocab_path = os.path.join(td, "vocab.json")
        with open(vocab_path, "w") as f:
            json.dump({tok: i for i, tok in enumerate(_CTC_VOCAB)}, f)
        tokenizer = Wav2Vec2CTCTokenizer(
            vocab_path, unk_token="<unk>", pad_token="<pad>",
            word_delimiter_token="|",
        )
    feature_extractor = Wav2Vec2FeatureExtractor(
        feature_size=1, sampling_rate=16000, padding_value=0.0,
        do_normalize=True, return_attention_mask=False,
    )
    return Wav2Vec2Processor(
        feature_extractor=feature_extractor, tokenizer=tokenizer
    )


def _tiny_w2v_config(**overrides):
    from transformers import Wav2Vec2Config

    cfg = dict(
        vocab_size=len(_CTC_VOCAB),
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        conv_dim=(32, 32),
        conv_stride=(5, 4),
        conv_kernel=(10, 3),
        num_feat_extract_layers=2,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )
    cfg.update(overrides)
    return Wav2Vec2Config(**cfg)


def build_local_ctc(seed: int = 0, **config_overrides):
    """(processor, model) for a tiny RANDOM-weight wav2vec2 CTC baseline,
    constructed entirely offline — the architecture the reference's
    transcribe_wav2vec.py drives, minus the released weights this sandbox
    cannot fetch. Useful for exercising/benchmarking the runner itself."""
    import torch
    from transformers import Wav2Vec2ForCTC

    torch.manual_seed(seed)
    model = Wav2Vec2ForCTC(_tiny_w2v_config(**config_overrides))
    model.eval()
    return _local_processor(), model


def build_local_ssl(seed: int = 0, **config_overrides):
    """(processor, model) random-weight wav2vec2 encoder with hidden-state
    taps on, offline — for driving `extract_ssl_features`."""
    import torch
    from transformers import Wav2Vec2Model

    torch.manual_seed(seed)
    cfg = _tiny_w2v_config(output_hidden_states=True, **config_overrides)
    model = Wav2Vec2Model(cfg)
    model.eval()
    return _local_processor(), model


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


def transcribe_ctc(
    model_name: str,
    audio_paths: List[str],
    text_dir: str,
    processor_model: Optional[Tuple] = None,
) -> List[str]:
    """Greedy CTC transcription of a file list into .txt outputs."""
    import torch

    processor, model = processor_model or _load_ctc(model_name)
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
    processor_model: Optional[Tuple] = None,
) -> np.ndarray:
    """All-layer hidden states of a wav2vec2/HuBERT model, optionally
    time-pooled — the SSL analogue of the Whisper all-layer taps."""
    import torch

    if processor_model is not None:
        processor, model = processor_model
    else:
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
