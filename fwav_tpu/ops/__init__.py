from .affine import affine_solve_single, affine_stats, batched_affine_match
from .dct import (
    correlation_upper_bound,
    dct2_matrix,
    multi_head_embedding,
    multi_head_embedding_batch,
    quick_energy,
    tile_embedding,
    tile_embedding_batch,
    tonal_embedding,
    tonal_embedding_batch,
    transient_embedding,
    transient_embedding_batch,
)
from .domains import (
    apply_symmetry,
    box_sums,
    build_bank_jax,
    build_domains_np,
    frame_ranges,
    n_domains_for,
)
from .search import (
    exact_search_block,
    pad_candidates,
    range_candidates_from_embedding_emb,
    topk_scores_block,
    topk_search_block,
)
from .vad import voiced_detection, voiced_mask_jax

__all__ = [
    "affine_solve_single", "affine_stats", "batched_affine_match",
    "correlation_upper_bound", "dct2_matrix", "multi_head_embedding",
    "multi_head_embedding_batch", "quick_energy", "tile_embedding",
    "tile_embedding_batch", "tonal_embedding", "tonal_embedding_batch",
    "transient_embedding", "transient_embedding_batch",
    "apply_symmetry", "box_sums", "build_bank_jax", "build_domains_np",
    "frame_ranges", "n_domains_for",
    "exact_search_block", "pad_candidates",
    "range_candidates_from_embedding_emb", "topk_scores_block",
    "topk_search_block",
    "voiced_detection", "voiced_mask_jax",
]
