from .container import (
    MATCH_DTYPE,
    load_compressed,
    load_compressed_arrays,
    matches_to_struct,
    save_compressed,
    struct_to_matches,
)
from .wav import read_wav_mono, write_wav

__all__ = [
    "MATCH_DTYPE",
    "load_compressed",
    "load_compressed_arrays",
    "matches_to_struct",
    "save_compressed",
    "struct_to_matches",
    "read_wav_mono",
    "write_wav",
]
