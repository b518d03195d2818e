from .wer import calculate_wer, remove_punctuation, word_edit_distance
from .noisy_speech import add_noise, generate_noisy_set
from .feature_extract import extract_features, extract_feature_set
from .layer_probe import layer_wise_probe

__all__ = [
    "calculate_wer",
    "remove_punctuation",
    "word_edit_distance",
    "add_noise",
    "generate_noisy_set",
    "extract_features",
    "extract_feature_set",
    "layer_wise_probe",
]
