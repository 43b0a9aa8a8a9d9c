"""Pallas epilogue kernels for the R2C/C2R path (BASELINE config 4).

The reference is C2C-only; R2C/C2R is this repo's config-4 extension built on
the classic half-length packing (rfft.py).  Round-3 hardware measurement
(results/RESULTS.md S10/S11) attributed 94% roundtrip overhead at N=2^20 to
XLA *materialized structural ops*: the (B, M, 2) stack/reshape pack costs
~2.9 ms and the roll/flip/concat untangle ~3.6 ms — each 5-10x over its HBM
floor — and both "layout-friendly" XLA rewrites (static strided lane slices,
``lax.pad`` interior dilation) wedge the axon backend mid-compile.  The fix,
queued there and implemented here, is to do pack and untangle inside Pallas
kernels where every structural movement is either a constant permutation
matmul on the (otherwise idle) MXU or a DMA-blocked store:

  * pack:       (B, 2M) real -> even/odd planes (B, M).  Lane deinterleave
                via a (2L, 2L) merged selection matrix [P_even | P_odd].
  * untangle:   half-length spectrum Z (B, M) -> R2C spectrum X (B, M+1).
                The spectral reversal V[k] = conj(Z[(M-k) mod M]) is resolved
                per output lane sub-block g from three streams of Z — sub g
                (U), sub (Mb-g) % Mb (contributes lane 0 of V) and sub
                (Mb-g-1) % Mb (contributes lanes 1..L-1, reversed) — so the
                lane flip + lane-0 injection is ONE constant (2L, L)
                merged matmul [J_shift; E_00]; no roll, no gather, no
                concat in HBM.  The Nyquist bin M is a closed form of Z[0]
                written by the final (partial) grid block.
  * retangle:   X (B, M+1) -> Z (B, M), the inverse pairing (same three-
                stream structure; the reversal reads X[M - g*L - l],
                reaching the partial block M/L only through its lane 0).
  * interleave: even/odd planes (B, M) -> (B, 2M) real (transpose of pack).

Performance structure (second iteration — the first ran each lt-sub-block as
its own grid step and its own matmuls, which at batch 16 used 16 of the
MXU's 128 rows and paid per-step DMA issue overhead over 1000+ grid steps,
measuring ~4x over the HBM floor at N=2^20/b=16):

  * K sub-blocks are processed per grid step (big blocks of K*lt lanes) —
    grid length drops K-fold and the three streams collapse to ~2x input
    reads (the reversed stream's K sub-needs are one contiguous big block;
    the lane-0 stream needs only one extra lt-block per step).
  * All K sub-blocks x {re, im} are stacked along SUBLANES into one
    (2K*bt, 2lt) operand and pushed through ONE merged matmul per grid
    step — sublane stacking of aligned (bt, lt) tiles is cheap VPU
    placement, and the row count restores full MXU occupancy at small
    batch.

Permutation matmuls are EXACT: every merged matrix still has at most one
nonzero per output column, so bf16 operands pass through the MXU unrounded
(fp32 accumulate, no actual additions), and fp32 operands use the 4-term
bitmask split (ops/dots.split_bf16), each term again exact under the 0/1
matrix.  Upcasts commute with permutations, so pack/interleave (pure
permutations) are bit-identical to the XLA formulations in rfft.py, which
remain the fallback for tiny shapes and non-TPU backends.  The untangle/
retangle elementwise chains match XLA to ~1 fp32 ulp (FMA contraction
order differs), so bf16 OUTPUT bit-identity is not guaranteed at large m
(at m = 8192 bf16 a few columns cross a rounding boundary); the fp32
intermediates agree to the last-place contraction difference only.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorfft_tpu.ops import dots
from tensorfft_tpu.utils.device import KERNEL_VMEM_LIMIT_BYTES

__all__ = ["pack_split", "interleave_split", "untangle_fwd", "retangle_inv",
           "epilogue_supported"]

#: matmul granularity (lanes) — one native lane tile pair; the permutation
#: MAC count scales linearly with this, so small is fast.
LANE_TILE = 256
#: target big-block width in lanes (amortizes grid-step DMA issue overhead).
#: Round-4 floor sweep at N=2^20/b=16 (results/RESULTS.md R4-S3): 16384 with
#: stack_rows=4096 wins both kernels decisively (pack_rt 256->197 us,
#: untangle_rt 297->243 us = 1.07x its own copy floor) — fewer grid steps
#: beat smaller VMEM temps on this backend.
LANE_BLOCK_TARGET = 16384
#: cap on stacked matmul rows (2*K*bt for untangle/retangle, K*bt for
#: pack/interleave) — past full MXU occupancy more K only grows VMEM temps,
#: but the DMA-issue saving dominates up to 4096 (same sweep).
MAX_STACK_ROWS = 4096


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _effective_lane_tile(m: int, lane_tile: int) -> int:
    """Effective matmul lane tile: ``lane_tile`` when it divides ``m``,
    else ``m`` itself for small non-multiples (e.g. m = 384 with the 256
    default — previously accepted when the default tile was 512)."""
    lt = min(lane_tile, m)
    if m % lt and m < 2 * lane_tile:
        lt = m
    return lt


def epilogue_supported(m: int, lane_tile: int = LANE_TILE) -> bool:
    """Whether the Pallas epilogue kernels can handle half-length ``m``."""
    return m >= 128 and m % _effective_lane_tile(m, lane_tile) == 0


def _subs_per_step(m: int, lt: int, bt: int, planes: int) -> int:
    """K: sub-blocks per grid step (see module docstring)."""
    if m % lt:
        raise ValueError(
            f"half-length {m} is not a multiple of the lane tile {lt}; "
            f"gate callers on epilogue_supported()")
    k = max(1, min(LANE_BLOCK_TARGET // lt,
                   m // lt,
                   MAX_STACK_ROWS // max(planes * bt, 1)))
    while m % (k * lt):
        k -= 1
    return k


def _permute_dot(x, p):
    """x @ p for a 0/1 single-nonzero-per-column matrix p — exact in x.

    bf16 x: one MXU pass (bf16 operands are consumed unrounded, fp32
    accumulate).  fp32 x: 4-term bitmask split of the DATA side (each mask
    step clears the residual's top 7 explicit mantissa bits exactly, so four
    terms cover fp32's 24-bit significand; the matrix side is exact in
    bf16), partial products summed in fp32 — each partial permutes one exact
    term, so the sum reconstructs the fp32 value bit-exactly.
    """
    pb = p.astype(jnp.bfloat16)
    if x.dtype == jnp.bfloat16:
        return jax.lax.dot(x, pb, preferred_element_type=jnp.float32)
    parts = dots.split_bf16(x.astype(jnp.float32), 4)
    out = jax.lax.dot(parts[0], pb, preferred_element_type=jnp.float32)
    for t in parts[1:]:
        out = out + jax.lax.dot(t, pb, preferred_element_type=jnp.float32)
    return out


@functools.lru_cache(maxsize=None)
def _pack_table(lt: int):
    """(2L, 2L) merged selection matrix [P_even | P_odd]."""
    pm = np.zeros((2 * lt, 2 * lt), np.float32)
    idx = np.arange(lt)
    pm[2 * idx, idx] = 1.0            # even lanes -> re columns 0..L-1
    pm[2 * idx + 1, lt + idx] = 1.0   # odd lanes  -> im columns L..2L-1
    return pm


@functools.lru_cache(maxsize=None)
def _interleave_table(lt: int):
    """(2L, 2L) transpose pairing: rows [re; im] -> interleaved lanes."""
    return _pack_table(lt).T.copy()


@functools.lru_cache(maxsize=None)
def _rev_table(lt: int):
    """(2L, L) merged shifted-reversal matrix [J_shift; E_00].

    Operand rows are the lane-concat [B_sub | A_sub]: J_shift places
    B_sub[:, L - l] at lane l for l = 1..L-1 (column 0 empty), E_00 places
    A_sub[:, 0] at lane 0.  One nonzero per column -> exact.
    """
    pm = np.zeros((2 * lt, lt), np.float32)
    l = np.arange(1, lt)
    pm[lt - l, l] = 1.0
    pm[lt, 0] = 1.0
    return pm


def _batch_pad(arrs, dtype):
    """Pad leading (batch) dim to the Mosaic sublane multiple."""
    b = arrs[0].shape[0]
    mult = 16 if jnp.dtype(dtype) == jnp.bfloat16 else 8
    pad = (-b) % mult
    if pad:
        arrs = [jnp.pad(a, ((0, pad), (0, 0))) for a in arrs]
    return arrs, b, b + pad


def _batch_tile(b_padded: int) -> int:
    bt = b_padded
    while bt > 256 and bt % 2 == 0:
        bt //= 2
    return bt


def _table_spec(a):
    return pl.BlockSpec(a.shape, lambda i, j, nd=a.ndim: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _stack_rows(blocks):
    return blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, axis=0)


def _cat_lanes(blocks):
    return blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, axis=1)


def _pack_kernel(x_ref, pm_ref, re_ref, im_ref, *, k, lt):
    bt = x_ref.shape[0]
    stacked = _stack_rows([x_ref[:, s * 2 * lt:(s + 1) * 2 * lt]
                           for s in range(k)])
    res = _permute_dot(stacked, pm_ref[:])
    re_ref[:] = _cat_lanes([res[s * bt:(s + 1) * bt, :lt]
                            for s in range(k)]).astype(re_ref.dtype)
    im_ref[:] = _cat_lanes([res[s * bt:(s + 1) * bt, lt:]
                            for s in range(k)]).astype(im_ref.dtype)


@functools.partial(jax.jit, static_argnames=("lane_tile", "interpret"))
def pack_split(x, *, lane_tile: int = LANE_TILE, interpret: bool | None = None
               ) -> Tuple[jax.Array, jax.Array]:
    """(B, 2M) real -> even/odd planes (B, M), each in x's dtype.

    Kernel replacement for rfft._deinterleave (measured ~2.9 ms of XLA
    stack/reshape at N=2^20/b=16 vs a ~0.1 ms HBM floor).
    """
    if interpret is None:
        interpret = _interpret_default()
    b0, n = x.shape
    m = n // 2
    lt = _effective_lane_tile(m, lane_tile)
    (x,), b0, b = _batch_pad([x], x.dtype)
    bt = _batch_tile(b)
    k = _subs_per_step(m, lt, bt, planes=1)
    L = k * lt
    pm = jnp.asarray(_pack_table(lt))
    grid = (b // bt, m // L)
    out_spec = pl.BlockSpec((bt, L), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_pack_kernel, k=k, lt=lt)
    re, im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bt, 2 * L), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM), _table_spec(pm)],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((b, m), x.dtype),
                   jax.ShapeDtypeStruct((b, m), x.dtype)),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * m * lt,
            bytes_accessed=4 * b * m * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, pm)
    if b != b0:
        re, im = re[:b0], im[:b0]
    return re, im


def _interleave_kernel(re_ref, im_ref, pm_ref, x_ref, *, k, lt):
    bt = re_ref.shape[0]
    stacked = _stack_rows([
        jnp.concatenate([re_ref[:, s * lt:(s + 1) * lt],
                         im_ref[:, s * lt:(s + 1) * lt]], axis=1)
        for s in range(k)])
    res = _permute_dot(stacked, pm_ref[:])
    x_ref[:] = _cat_lanes([res[s * bt:(s + 1) * bt]
                           for s in range(k)]).astype(x_ref.dtype)


@functools.partial(jax.jit, static_argnames=("lane_tile", "interpret"))
def interleave_split(re, im, *, lane_tile: int = LANE_TILE,
                     interpret: bool | None = None) -> jax.Array:
    """Even/odd planes (B, M) -> (B, 2M) real; transpose of pack_split."""
    if interpret is None:
        interpret = _interpret_default()
    b0, m = re.shape
    lt = _effective_lane_tile(m, lane_tile)
    (re, im), b0, b = _batch_pad([re, im], re.dtype)
    bt = _batch_tile(b)
    k = _subs_per_step(m, lt, bt, planes=1)
    L = k * lt
    pm = jnp.asarray(_interleave_table(lt))
    grid = (b // bt, m // L)
    in_spec = pl.BlockSpec((bt, L), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)
    kernel = functools.partial(_interleave_kernel, k=k, lt=lt)
    x = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec, in_spec, _table_spec(pm)],
        out_specs=pl.BlockSpec((bt, 2 * L), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2 * m), re.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * m * lt,
            bytes_accessed=4 * b * m * re.dtype.itemsize,
            transcendentals=0,
        ),
    )(re, im, pm)
    return x[:b0] if b != b0 else x


def _reversed_stream(b_re_ref, b_im_ref, a_re, a_im, pm_ref, *, k, lt):
    """Assemble V-perm for a big block: ONE stacked merged matmul.

    Per output sub s (global sub g = j*K + s): lanes 1.. come from the
    reversed-stream big block's local sub (K-1-s); lane 0 comes from
    ``a`` for s == 0 and from the big block's local sub (K-s) otherwise.
    Returns fp32 (re, im) big blocks of shape (bt, K*lt) — sign handling
    (conj) is the caller's.
    """
    bt = b_re_ref.shape[0]
    rows = []
    for s in range(k):
        b_re_s = b_re_ref[:, (k - 1 - s) * lt:(k - s) * lt]
        b_im_s = b_im_ref[:, (k - 1 - s) * lt:(k - s) * lt]
        if s == 0:
            a_re_s, a_im_s = a_re, a_im
        else:
            a_re_s = b_re_ref[:, (k - s) * lt:(k - s + 1) * lt]
            a_im_s = b_im_ref[:, (k - s) * lt:(k - s + 1) * lt]
        rows.append(jnp.concatenate([b_re_s, a_re_s], axis=1))
        rows.append(jnp.concatenate([b_im_s, a_im_s], axis=1))
    stacked = _stack_rows(rows)                      # (2K*bt, 2lt)
    res = _permute_dot(stacked, pm_ref[:])           # (2K*bt, lt) fp32
    v_re = _cat_lanes([res[2 * s * bt:(2 * s + 1) * bt] for s in range(k)])
    v_im = _cat_lanes([res[(2 * s + 1) * bt:(2 * s + 2) * bt]
                       for s in range(k)])
    return v_re, v_im


def _untangle_kernel(u_re_ref, u_im_ref, b_re_ref, b_im_ref,
                     a_re_ref, a_im_ref, w_re_ref, w_im_ref,
                     pm_ref, o_re_ref, o_im_ref, *, k, lt, mbk, scale):
    j = pl.program_id(1)
    # Reversed stream V[k] = conj(Z[(M-k) mod M]) for this big block
    # (exact permutes on the storage values, then upcast — commutes).
    v_re, v_im = _reversed_stream(b_re_ref, b_im_ref,
                                  a_re_ref[:], a_im_ref[:], pm_ref,
                                  k=k, lt=lt)
    v_im = -v_im
    u_re = u_re_ref[:].astype(jnp.float32)
    u_im = u_im_ref[:].astype(jnp.float32)
    w_re = w_re_ref[:]
    w_im = w_im_ref[:]
    a_re, a_im = u_re + v_re, u_im + v_im          # U + V
    b_re, b_im = u_re - v_re, u_im - v_im          # U - V
    # -i * w * b
    c_re = w_re * b_im + w_im * b_re
    c_im = -(w_re * b_re - w_im * b_im)
    out_re = (a_re + c_re) * scale
    out_im = (a_im + c_im) * scale
    # Final (partial) big block: bin M = 2*scale*(Re Z0 - Im Z0) in lane 0.
    # Its lane-0 stream is sub (mb - mbk*K) % mb = 0, so A[:, 0] = Z[:, 0].
    nyq = 2.0 * scale * (a_re_ref[:, 0:1].astype(jnp.float32)
                         - a_im_ref[:, 0:1].astype(jnp.float32))
    lane0 = jax.lax.broadcasted_iota(jnp.int32, out_re.shape, 1) == 0
    is_last = j == mbk
    out_re = jnp.where(is_last, jnp.where(lane0, nyq, 0.0), out_re)
    out_im = jnp.where(is_last, 0.0, out_im)
    o_re_ref[:] = out_re.astype(o_re_ref.dtype)
    o_im_ref[:] = out_im.astype(o_im_ref.dtype)


def _pack_phase_tables(n: int, sign: int, lt: int, blocks: int):
    """fp32 cos/sin of sign*2*pi*k/n, padded to ``blocks`` lane blocks."""
    k = np.arange(blocks * lt, dtype=np.float64)
    phase = sign * 2.0 * np.pi * k / n
    return (jnp.asarray(np.cos(phase)[None], jnp.float32),
            jnp.asarray(np.sin(phase)[None], jnp.float32))


@functools.partial(jax.jit,
                   static_argnames=("n", "scale", "lane_tile", "interpret"))
def untangle_fwd(z_re, z_im, *, n: int, scale: float,
                 lane_tile: int = LANE_TILE, interpret: bool | None = None
                 ) -> Tuple[jax.Array, jax.Array]:
    """Half-length spectrum Z (B, M) -> R2C spectrum X (B, M+1).

    Kernel replacement for rfft._untangle_fwd (measured ~3.6 ms of XLA
    roll/flip/concat at N=2^20/b=16 vs a ~0.2 ms HBM floor); outputs in Z's
    dtype, bit-identical to the XLA formulation.
    """
    if interpret is None:
        interpret = _interpret_default()
    b0, m = z_re.shape
    assert n == 2 * m
    lt = _effective_lane_tile(m, lane_tile)
    mb = m // lt
    (z_re, z_im), b0, b = _batch_pad([z_re, z_im], z_re.dtype)
    bt = _batch_tile(b)
    k = _subs_per_step(m, lt, bt, planes=2)
    L = k * lt
    mbk = m // L
    w_re, w_im = _pack_phase_tables(n, -1, L, mbk + 1)
    pm = jnp.asarray(_rev_table(lt))

    grid = (b // bt, mbk + 1)
    u_spec = pl.BlockSpec((bt, L),
                          lambda i, j: (i, jnp.minimum(j, mbk - 1)),
                          memory_space=pltpu.VMEM)
    # reversed stream: output subs [jK, jK+K) need Z subs
    # [mb-jK-K, mb-jK-1] (one contiguous big block) ...
    b_spec = pl.BlockSpec((bt, L), lambda i, j: (i, (mbk - j - 1) % mbk),
                          memory_space=pltpu.VMEM)
    # ... plus Z sub (mb - jK) % mb alone (lane 0 of the s == 0 sub).
    a_spec = pl.BlockSpec((bt, lt), lambda i, j: (i, (mb - j * k) % mb),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, L), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bt, L), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_untangle_kernel, k=k, lt=lt, mbk=mbk,
                               scale=float(scale))
    o_re, o_im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[u_spec, u_spec, b_spec, b_spec, a_spec, a_spec,
                  w_spec, w_spec, _table_spec(pm)],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((b, m + 1), z_re.dtype),
                   jax.ShapeDtypeStruct((b, m + 1), z_im.dtype)),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * m * lt,
            bytes_accessed=6 * b * m * z_re.dtype.itemsize,
            transcendentals=0,
        ),
    )(z_re, z_im, z_re, z_im, z_re, z_im, w_re, w_im, pm)
    if b != b0:
        o_re, o_im = o_re[:b0], o_im[:b0]
    return o_re, o_im


def _retangle_kernel(u_re_ref, u_im_ref, b_re_ref, b_im_ref,
                     a_re_ref, a_im_ref, w_re_ref, w_im_ref,
                     pm_ref, o_re_ref, o_im_ref, *, k, lt, scale):
    # The lane-0 stream block can be the PARTIAL Nyquist block (at j = 0 it
    # reads X subs [m, m+lt), of which only lane 0 exists) — its pad-garbage
    # lanes would poison the 0-weighted matmul columns if NaN, so mask them.
    a_lane0 = jax.lax.broadcasted_iota(jnp.int32, a_re_ref.shape, 1) == 0
    a_re = jnp.where(a_lane0, a_re_ref[:], 0).astype(a_re_ref.dtype)
    a_im = jnp.where(a_lane0, a_im_ref[:], 0).astype(a_im_ref.dtype)
    # Reversed stream conj(X[M - g*lt - l]) per sub g.
    r_re, r_im = _reversed_stream(b_re_ref, b_im_ref, a_re, a_im, pm_ref,
                                  k=k, lt=lt)
    r_im = -r_im
    x_re = u_re_ref[:].astype(jnp.float32)
    x_im = u_im_ref[:].astype(jnp.float32)
    w_re = w_re_ref[:]
    w_im = w_im_ref[:]
    a_re, a_im = x_re + r_re, x_im + r_im
    b_re, b_im = x_re - r_re, x_im - r_im
    # i * w * b
    c_re = -(w_re * b_im + w_im * b_re)
    c_im = w_re * b_re - w_im * b_im
    o_re_ref[:] = ((a_re + c_re) * scale).astype(o_re_ref.dtype)
    o_im_ref[:] = ((a_im + c_im) * scale).astype(o_im_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n", "scale", "out_dtype", "lane_tile",
                                    "interpret"))
def retangle_inv(re, im, *, n: int, scale: float, out_dtype,
                 lane_tile: int = LANE_TILE, interpret: bool | None = None
                 ) -> Tuple[jax.Array, jax.Array]:
    """R2C spectrum X (B, M+1) -> half-length spectrum Z (B, M).

    Inverse pairing of untangle_fwd (rfft._retangle_inv), same three-stream
    block structure; the lane-0 stream's j = 0 read is the partial Nyquist
    block, consumed only through its lane 0.
    """
    if interpret is None:
        interpret = _interpret_default()
    b0, m_plus = re.shape
    m = m_plus - 1
    assert n == 2 * m
    lt = _effective_lane_tile(m, lane_tile)
    mb = m // lt
    (re, im), b0, b = _batch_pad([re, im], re.dtype)
    bt = _batch_tile(b)
    k = _subs_per_step(m, lt, bt, planes=2)
    L = k * lt
    mbk = m // L
    w_re, w_im = _pack_phase_tables(n, +1, L, mbk)
    pm = jnp.asarray(_rev_table(lt))

    grid = (b // bt, mbk)
    u_spec = pl.BlockSpec((bt, L), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)
    # reversal needs X subs [mb-jK-K, mb-jK-1] (contiguous big block) plus
    # sub (mb - jK) alone (partial Nyquist block at j = 0, lane 0 only).
    b_spec = pl.BlockSpec((bt, L), lambda i, j: (i, mbk - j - 1),
                          memory_space=pltpu.VMEM)
    a_spec = pl.BlockSpec((bt, lt), lambda i, j: (i, mb - j * k),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, L), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bt, L), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_retangle_kernel, k=k, lt=lt,
                               scale=float(scale))
    o_re, o_im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[u_spec, u_spec, b_spec, b_spec, a_spec, a_spec,
                  w_spec, w_spec, _table_spec(pm)],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((b, m), jnp.dtype(out_dtype)),
                   jax.ShapeDtypeStruct((b, m), jnp.dtype(out_dtype))),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * m * lt,
            bytes_accessed=6 * b * m * re.dtype.itemsize,
            transcendentals=0,
        ),
    )(re, im, re, im, re, im, w_re, w_im, pm)
    if b != b0:
        o_re, o_im = o_re[:b0], o_im[:b0]
    return o_re, o_im
