from .manifest import SentenceEntry, build_data_list, save_sentence_labels, speaker_id_of
from .mixing import mix_pair, make_speaker_masks, MASK_OTHER_SOLO, MASK_OVERLAP, MASK_TARGET_SOLO, MASK_PAD
from .pairs import RandomPairSampler, FixedPairSampler, generate_fixed_pairs
from .collate import collate_pairs, pick_bucket
from .pipeline import PrefetchingLoader, SyntheticPairSource, FilePairSource
from .avi import AviReader, avi_frame_reader, open_video, read_avi, write_avi
from .jpeg import decode_jpeg

__all__ = [
    "SentenceEntry",
    "build_data_list",
    "save_sentence_labels",
    "speaker_id_of",
    "mix_pair",
    "make_speaker_masks",
    "MASK_OTHER_SOLO",
    "MASK_OVERLAP",
    "MASK_TARGET_SOLO",
    "MASK_PAD",
    "RandomPairSampler",
    "FixedPairSampler",
    "generate_fixed_pairs",
    "collate_pairs",
    "pick_bucket",
    "PrefetchingLoader",
    "SyntheticPairSource",
    "FilePairSource",
    "AviReader",
    "avi_frame_reader",
    "open_video",
    "read_avi",
    "write_avi",
    "decode_jpeg",
]
