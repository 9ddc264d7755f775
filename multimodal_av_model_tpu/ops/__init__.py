from .resize import resize_bilinear, lip_frames_preprocess
from .logmel import log_mel_spectrogram, mel_filterbank, stft_magsq
from .ctc import ctc_loss, ctc_greedy_decode, ctc_collapse
from .metrics import levenshtein, wer, cer
from .contrastive import contrastive_loss_with_mask
from .beam_search import beam_search_decode
from .pallas.logmel_kernel import log_mel_spectrogram_pallas

__all__ = [
    "resize_bilinear",
    "lip_frames_preprocess",
    "log_mel_spectrogram",
    "mel_filterbank",
    "stft_magsq",
    "ctc_loss",
    "ctc_greedy_decode",
    "ctc_collapse",
    "levenshtein",
    "wer",
    "cer",
    "contrastive_loss_with_mask",
    "beam_search_decode",
    "log_mel_spectrogram_pallas",
]
