from .container import (
    MATCH_DTYPE,
    load_compressed,
    load_compressed_arrays,
    matches_to_struct,
    save_compressed,
    struct_to_matches,
)
from .multich import load_compressed_multi, save_compressed_multi
from .wav import read_wav, read_wav_mono, write_wav

__all__ = [
    "MATCH_DTYPE",
    "load_compressed",
    "load_compressed_arrays",
    "matches_to_struct",
    "save_compressed",
    "struct_to_matches",
    "load_compressed_multi",
    "save_compressed_multi",
    "read_wav",
    "read_wav_mono",
    "write_wav",
]
