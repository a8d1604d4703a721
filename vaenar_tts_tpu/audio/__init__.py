from .dsp import (
    AudioProcessor,
    hann_window,
    hz_to_mel,
    istft,
    mel_filterbank,
    mel_to_hz,
    stft,
)

__all__ = [
    "AudioProcessor",
    "hann_window",
    "hz_to_mel",
    "istft",
    "mel_filterbank",
    "mel_to_hz",
    "stft",
]
