from .audio import AudioEncoder
from .av_model import (
    AudioOnlyCTC,
    MultiSpeakerAVModel,
    VisualOnlyCTC,
    downsample_mask_to,
    nchw_clip_to_channels_last,
)
from .decoder import CTCDecoder
from .fusion import CrossAttentionFusion
from .legacy import LipEncoder, MelAudioEncoder, MultimodalCTCKoreanModel
from .visual import VisualEncoder

__all__ = [
    "AudioEncoder",
    "AudioOnlyCTC",
    "MultiSpeakerAVModel",
    "VisualOnlyCTC",
    "downsample_mask_to",
    "nchw_clip_to_channels_last",
    "CTCDecoder",
    "CrossAttentionFusion",
    "LipEncoder",
    "MelAudioEncoder",
    "MultimodalCTCKoreanModel",
    "VisualEncoder",
]
