from .mel import log_mel_spectrogram_jax, mel_filters

__all__ = ["log_mel_spectrogram_jax", "mel_filters"]
