from .codec import process_file_compress, process_file_decompress
from .decode import decompress_audio, decompress_segment
from .encode import compress_audio, compress_audio_arrays, compress_audio_packed

__all__ = [
    "process_file_compress",
    "process_file_decompress",
    "decompress_audio", "decompress_segment",
    "compress_audio",
    "compress_audio_arrays",
    "compress_audio_packed",
]
