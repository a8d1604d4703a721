"""Objective evaluation metrics for parity checking.

The BASELINE targets include mel-L1 vs reference outputs on the LJSpeech test
set. These utilities compare predicted and reference mel-spectrograms with
length-aware alignment (the predicted length may differ from ground truth by
the +80 inference pad).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def mel_l1(pred: np.ndarray, ref: np.ndarray) -> float:
    """Mean absolute error over the overlapping frames of two [T, D] mels."""
    n = min(pred.shape[0], ref.shape[0])
    return float(np.mean(np.abs(pred[:n].astype(np.float64)
                                - ref[:n].astype(np.float64))))


def mel_l2(pred: np.ndarray, ref: np.ndarray) -> float:
    n = min(pred.shape[0], ref.shape[0])
    return float(np.mean((pred[:n].astype(np.float64)
                          - ref[:n].astype(np.float64)) ** 2))


def mcd(pred: np.ndarray, ref: np.ndarray, n_coeffs: int = 13) -> float:
    """Mel-cepstral distortion (dB) over overlapping frames of [T, D] log-mel
    inputs, via DCT-II cepstra (coefficient 0 excluded)."""
    from scipy.fftpack import dct
    n = min(pred.shape[0], ref.shape[0])
    c_pred = dct(pred[:n], type=2, axis=1, norm="ortho")[:, 1:n_coeffs]
    c_ref = dct(ref[:n], type=2, axis=1, norm="ortho")[:, 1:n_coeffs]
    k = 10.0 / np.log(10.0) * np.sqrt(2.0)
    return float(np.mean(k * np.sqrt(np.sum((c_pred - c_ref) ** 2, axis=1))))


def batch_summary(pairs: Sequence[tuple]) -> Dict[str, float]:
    """Aggregate (pred, ref) mel pairs into mean metrics."""
    l1s = [mel_l1(p, r) for p, r in pairs]
    l2s = [mel_l2(p, r) for p, r in pairs]
    mcds = [mcd(p, r) for p, r in pairs]
    return {
        "mel_l1": float(np.mean(l1s)),
        "mel_l2": float(np.mean(l2s)),
        "mcd_db": float(np.mean(mcds)),
        "n": len(l1s),
    }
