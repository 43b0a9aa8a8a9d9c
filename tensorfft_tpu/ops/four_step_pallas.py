"""Fused Bailey four-step: two Pallas passes, zero standalone transposes.

Composes the whole-transform kernel (fused_pallas.py) into arbitrarily large
1D FFTs (N = n1 * n2) at the HBM-traffic floor of two read+write rounds:

  Pass K1 (columns):  x viewed (B, n1, n2).  Each program owns an
      (n1, T)-lane panel, runs all n1-stages in VMEM, and applies the
      four-step twiddle W[k1, j2] = exp(sign*2*pi*i*k1*j2/N) before the
      store, reconstructed per block from rank-separated tables
      P[k1, block] * Q[k1, lane] (dft.four_step_twiddle_factors) — the
      data-sized W never exists.

  Pass K2 (rows): reads TRANSPOSED blocks (1, k1_tile, n2) straight out of
      K1's output, transposes once in VMEM, runs all n2-stages, and writes
      the (n2, k1_tile) result into the output at the transposed position —
      so the final digit-swap of the four-step (X[k2*n1+k1] = Z[k1,k2]) is
      absorbed into the output BlockSpec instead of a third memory pass.

Compare the reference, whose every radix-16 step is a full global-memory
round trip (ComputeFFT.h:89-120): for N = 2^24 that is 5 round trips vs 2.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorfft_tpu import dft
from tensorfft_tpu.ops import dots
from tensorfft_tpu.utils.device import KERNEL_VMEM_LIMIT_BYTES
from tensorfft_tpu.ops.fused_pallas import (
    _interpret_default,
    gridslice_block,
    gridslice_layout,
    planar_stage_tables,
    stage_loop,
    stage_loop_planar,
    stage_table_arrays,
)


def _pass_tables(radices, scales, sign, algorithm, grouped, engine,
                 first_dot="default", complex_mult="block"):
    """Stage tables for one pass under the selected in-VMEM engine."""
    if engine in ("planar", "planar_vpu"):
        return planar_stage_tables(radices, scales, sign, algorithm,
                                   fold=(engine == "planar"),
                                   first_dot=first_dot)
    return stage_table_arrays(radices, scales, sign, algorithm, grouped,
                              first_dot=first_dot,
                              pretwiddle=(engine == "pretwiddle"),
                              complex_mult=complex_mult)


def _run_stages(state_re, state_im, table_refs, radices, algorithm, n, t,
                grouped, state_dtype, complex_mult, engine, first_dot):
    """Run one pass's stage sequence on separate (n, t) planes.

    Dispatches to the stacked block-complex engine or the planar engine
    (separate re/im planes end-to-end); returns (re, im) planes.
    """
    if engine in ("planar", "planar_vpu"):
        s_re, s_im, _ = stage_loop_planar(
            state_re, state_im, table_refs, radices, algorithm, n, t,
            fold=(engine == "planar"), state_dtype=state_dtype,
            first_dot=first_dot,
        )
        return s_re.reshape(n, t), s_im.reshape(n, t)
    state = jnp.stack([state_re, state_im])
    state, _ = stage_loop(state, table_refs, radices, algorithm, n, t,
                          grouped=grouped, state_dtype=state_dtype,
                          complex_mult=complex_mult, first_dot=first_dot,
                          pretwiddle=(engine == "pretwiddle"))
    state = state.reshape(2, n, t)
    return state[0], state[1]

__all__ = ["four_step_fft", "fft2_fused", "fused_fft_batch_major"]


def _col_kernel(refs, radices, algorithm, n1, t, bt, twiddle=True,
                grouped=False, state_dtype=jnp.float32,
                complex_mult="block", first_dot="default",
                engine="stacked"):
    """Pass K1: (bt, n1, T) block -> bt panels of n1-point FFTs
    (+ four-step twiddle).

    bt batch elements per program amortize grid/DMA overhead when n1*T is
    small (mid-size N); the loop is unrolled at trace time.  With
    twiddle=False this is a plain batched column FFT — the first pass of a
    row-column 2D transform (no P/Q refs in that case).
    """
    re_ref, im_ref = refs[0], refs[1]
    if twiddle:
        p_ref, q_ref = refs[2], refs[3]  # (1, 2, n1) this block's col, (2, n1, T)
        table_refs = refs[4:-2]
    else:
        table_refs = refs[2:-2]
    out_re_ref, out_im_ref = refs[-2], refs[-1]

    if twiddle:
        # Four-step twiddle W = P[:, block] * Q (complex), fp32 on the VPU.
        # P arrives BLOCKED, (blocks, 2, n1) sliced to this program's
        # (1, 2, n1) slab — a VMEM-resident (2, n1, blocks) table at
        # n1 = 16384 costs 4-64 MiB and tipped the K1 pass over the scoped
        # VMEM limit for 2^26/2^27 splits.  The slab stores k1 along lanes,
        # so one small (2, n1) -> (n1, 2) transpose re-orients it to the
        # (sublane = k1) layout the state uses; fp64-accurate phases are
        # preserved (no matmul extraction, so no bf16 operand truncation).
        p_t = p_ref[0].T  # (n1, 2)
        p_re = p_t[:, 0:1]
        p_im = p_t[:, 1:2]
        w_re = p_re * q_ref[0] - p_im * q_ref[1]
        w_im = p_re * q_ref[1] + p_im * q_ref[0]

    for i in range(bt):
        s_re, s_im = _run_stages(
            re_ref[i].astype(state_dtype), im_ref[i].astype(state_dtype),
            table_refs, radices, algorithm, n1, t, grouped, state_dtype,
            complex_mult, engine, first_dot,
        )
        s_re = s_re.astype(jnp.float32)
        s_im = s_im.astype(jnp.float32)
        if twiddle:
            o_re = s_re * w_re - s_im * w_im
            o_im = s_re * w_im + s_im * w_re
        else:
            o_re, o_im = s_re, s_im
        out_re_ref[i] = o_re.astype(out_re_ref.dtype)
        out_im_ref[i] = o_im.astype(out_im_ref.dtype)


def _col_kernel_gridslice(refs, scratch, radices, algorithm, n1, t, bt,
                          s_total, slice_block, grouped, state_dtype,
                          complex_mult, first_dot):
    """Pass K1 with the last stage's interleave deferred to the output DMA.

    Same mechanism as _row_kernel_gridslice, for the column pass (matters
    for the n1 = 8192/16384 splits of N = 2^25..2^27, where K1 runs the
    largest in-VMEM transforms of the whole sweep).  Differences from the
    stacked column kernel:

      * data refs are FOUR-dimensional (bt, R, S, t) views of the same
        (b, n1, n2) planes (a free reshape host-side) so the output — whose
        (r, s) slice-major blocks land at natural k1 = r*S + s — has the
        SAME array shape as the input and input_output_aliasing survives
        (measured worth ~50% on the fused kernel);
      * P/Q arrive permuted to slice-major row order (position a = s*R + r
        holds phase k1 = r*S + s), so the four-step twiddle stays ONE
        broadcast multiply on the un-interleaved stack of last-stage slices
        (per-slice 2D multiplies measured ~420 us slower on the fused
        kernel, round-3 stage breakdown);
      * last-stage slices are block-concatenated (jnp.stack axis=1 — a
        contiguous leading-dim concat, not the r*S+s sublane shuffle) and
        parked in scratch; each grid step stores C slices to their
        (R, C, t) output block.
    """
    re_ref, im_ref = refs[0], refs[1]
    p_ref, q_ref = refs[2], refs[3]  # slice-major permuted (see caller)
    table_refs = refs[4:-2]
    out_re_ref, out_im_ref = refs[-2], refs[-1]
    scr_re, scr_im = scratch
    r_last = radices[-1]
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _compute():
        p_t = p_ref[0].T  # (n1, 2)
        p_re = p_t[:, 0:1]
        p_im = p_t[:, 1:2]
        w_re = p_re * q_ref[0] - p_im * q_ref[1]  # (n1, t), slice-major rows
        w_im = p_re * q_ref[1] + p_im * q_ref[0]
        for i in range(bt):
            state = jnp.stack([
                re_ref[i].reshape(n1, t).astype(state_dtype),
                im_ref[i].reshape(n1, t).astype(state_dtype),
            ])
            slices, _ = stage_loop(
                state, table_refs, radices, algorithm, n1, t,
                grouped=grouped, state_dtype=state_dtype,
                complex_mult=complex_mult, first_dot=first_dot,
                emit_slices=True,
            )
            sm = jnp.stack(slices, axis=1)  # (2, S, R, t): block concat
            sm = sm.reshape(2, n1, t).astype(jnp.float32)
            o_re = sm[0] * w_re - sm[1] * w_im
            o_im = sm[0] * w_im + sm[1] * w_re
            scr_re[i] = o_re.reshape(s_total, r_last, t).astype(scr_re.dtype)
            scr_im[i] = o_im.reshape(s_total, r_last, t).astype(scr_im.dtype)

    for i in range(bt):
        out_re_ref[i] = gridslice_block(scr_re, s, slice_block, i)
        out_im_ref[i] = gridslice_block(scr_im, s, slice_block, i)


def _row_kernel(refs, radices, algorithm, n2, k1_tile, bt, transposed=True,
                grouped=False, state_dtype=jnp.float32,
                complex_mult="block", first_dot="default",
                engine="stacked"):
    """Pass K2: transposed-read (bt, k1_tile, n2) block -> n2-point FFTs.

    transposed=True writes each (n2, k1_tile) result at the digit-swapped
    position (four-step natural-k output); transposed=False transposes back
    in VMEM and stores in place (row-column 2D transform output layout).
    """
    re_ref, im_ref = refs[0], refs[1]
    out_re_ref, out_im_ref = refs[-2], refs[-1]
    table_refs = refs[2:-2]

    for i in range(bt):
        # Transpose in the storage dtype (bf16 halves the sublane-transpose
        # traffic, the slowest Mosaic lowering here), then upcast.
        s_re, s_im = _run_stages(
            re_ref[i].T.astype(state_dtype),  # (n2, k1_tile)
            im_ref[i].T.astype(state_dtype),
            table_refs, radices, algorithm, n2, k1_tile, grouped,
            state_dtype, complex_mult, engine, first_dot,
        )
        if transposed:
            out_re_ref[i] = s_re.astype(out_re_ref.dtype)
            out_im_ref[i] = s_im.astype(out_im_ref.dtype)
        else:
            out_re_ref[i] = s_re.T.astype(out_re_ref.dtype)
            out_im_ref[i] = s_im.T.astype(out_im_ref.dtype)


def _row_kernel_gridslice(refs, scratch, radices, algorithm, n2, k1_tile, bt,
                          s_total, slice_block, grouped, state_dtype,
                          complex_mult, first_dot):
    """Pass K2 with the last stage's interleave deferred to the output DMA.

    The K2 row pass inherits the fused kernel's dominant in-kernel cost at
    large n2: the last stage's S-way sublane interleave (jnp.stack, measured
    ~615 us of the N=16384/b=4096 fused kernel — the same transform this
    pass runs per block at n2 = 16384).  Same mechanism as the fused
    gridslice engine (fused_pallas.gridslice_kernel_body): grid gains an
    innermost slice dimension; step s == 0 runs the whole stage sequence
    (emit_slices=True) and parks the S slices contiguously in scratch; every
    step then stores C = ``slice_block`` slices as an (R, C, k1_tile) block
    at position (0, s, ik) of the (B, R, S, n1) output, whose (r, s)
    row-major order IS the natural k2 = r*S + s frequency order — the
    digit-swapped placement along n1 stays absorbed in the BlockSpec exactly
    as in the stacked row pass.
    """
    re_ref, im_ref = refs[0], refs[1]
    out_re_ref, out_im_ref = refs[-2], refs[-1]
    table_refs = refs[2:-2]
    scr_re, scr_im = scratch
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _compute():
        for i in range(bt):
            state = jnp.stack([
                re_ref[i].T.astype(state_dtype),  # (n2, k1_tile)
                im_ref[i].T.astype(state_dtype),
            ])
            slices, _ = stage_loop(
                state, table_refs, radices, algorithm, n2, k1_tile,
                grouped=grouped, state_dtype=state_dtype,
                complex_mult=complex_mult, first_dot=first_dot,
                emit_slices=True,
            )
            for kk, sl in enumerate(slices):
                scr_re[i, kk] = sl[0].astype(scr_re.dtype)
                scr_im[i, kk] = sl[1].astype(scr_im.dtype)

    for i in range(bt):
        out_re_ref[i] = gridslice_block(scr_re, s, slice_block, i)
        out_im_ref[i] = gridslice_block(scr_im, s, slice_block, i)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n1", "n2", "radices1", "radices2", "scales1", "scales2", "sign",
        "lane_tile", "algorithm", "interpret", "grouped", "state_dtype",
        "complex_mult", "first_dot", "engine", "k1_tile", "passes",
    ),
)
def four_step_fft(
    re,
    im,
    *,
    n1: int,
    n2: int,
    radices1: Tuple[int, ...],
    radices2: Tuple[int, ...],
    scales1: Tuple[float, ...],
    scales2: Tuple[float, ...],
    sign: int = dft.FORWARD,
    lane_tile: int = 128,
    algorithm: str = "bf16",
    interpret: bool | None = None,
    grouped: bool = False,
    state_dtype: str = "float32",
    complex_mult: str = "block",
    first_dot: str = "default",
    engine: str = "stacked",
    k1_tile: int = 128,
    passes: str = "both",
):
    """Large-N FFT on batch-major (B, N) planes, N = n1*n2.

    Returns (B, N) planes in natural frequency order, storage dtype = input
    dtype.

    ``passes`` is a measurement-only knob for per-pass floor attribution
    (benchmarks/exp_four_step_floor.py): "k1" returns after the column pass,
    "k2" skips it (feeding the raw input as the intermediate — numerically
    wrong, dataflow/time identical).  Production always runs "both".
    """
    if interpret is None:
        interpret = _interpret_default()
    if re.ndim != 2 or re.shape != im.shape:
        raise ValueError(
            f"four_step_fft expects matching (B, N) planes, got re {re.shape} "
            f"im {im.shape}"
        )
    b, n = re.shape
    if n != n1 * n2:
        raise ValueError(f"N={n} != n1*n2 = {n1}*{n2}")
    t = min(lane_tile, n2)
    if n2 % t != 0:
        raise ValueError(f"n2={n2} not divisible by lane tile {t}")
    # k1_tile is the K2 pass's lane-panel width (plan knob; effective tile is
    # clamped to n1).  Power-of-two values always divide the power-of-two n1.
    k1_tile = min(k1_tile, n1)
    if n1 % k1_tile != 0:
        raise ValueError(f"n1={n1} not divisible by k1 tile {k1_tile}")
    if min(t, k1_tile) < 128:
        # Mosaic cannot shape-cast bf16 vectors whose lane dim is below the
        # 128-lane register width ("infer-vector-layout: unsupported shape
        # cast"); narrow panels fall back to fp32 state.
        state_dtype = "float32"

    def batch_tile(panel_elems: int) -> int:
        # Enough batch elements per program to keep the block around 512K
        # elements (mid-size N would otherwise drown in grid/DMA overhead;
        # measured +10-20% over 256K targets); must divide b, so take the
        # largest power of two that does.
        target = max(1, (1 << 19) // max(panel_elems, 1))
        bt = 1
        while bt * 2 <= target and b % (bt * 2) == 0:
            bt *= 2
        return bt

    bt1 = batch_tile(n1 * t)
    bt2 = batch_tile(k1_tile * n2)

    re3 = re.reshape(b, n1, n2)
    im3 = im.reshape(b, n1, n2)

    # Pass K1.
    p_re, p_im, q_re, q_im = dft.four_step_twiddle_factors(
        n1, n2, t, dtype=np.float32, sign=sign
    )
    sd = jnp.dtype(state_dtype)
    # Deferred-interleave column pass (see _col_kernel_gridslice): falls back
    # to the stacked column pass when the plan shape cannot emit whole
    # last-stage slices.
    use_gs1 = False
    if engine.startswith("gridslice"):
        s1_total = gridslice_layout(radices1, grouped)
        slice_block1 = int(engine[len("gridslice"):] or 8)
        if (s1_total is not None and s1_total % slice_block1 == 0
                and radices1[-1] >= 8):
            use_gs1 = True
    # (blocks, 2, n1): block a's column P[:, :, a] as a lane-major slab, so
    # the kernel DMAs one 131 KB slab per grid step instead of holding the
    # whole table resident (O(n1 * n2/t) — up to 64 MiB at n1 = 16384).
    pq = np.stack([p_re, p_im]).transpose(2, 0, 1)
    qq = np.stack([q_re, q_im])                       # (2, n1, t)
    if use_gs1:
        # Slice-major phase order: position a = s*R + r carries k1 = r*S + s,
        # so the twiddle stays one broadcast multiply on the un-interleaved
        # slice stack.
        r_last1 = radices1[-1]
        perm = ((np.arange(n1) % r_last1) * s1_total
                + np.arange(n1) // r_last1)
        pq = pq[:, :, perm]
        qq = qq[:, perm, :]
    p_tab = jnp.asarray(pq.copy())
    q_tab = jnp.asarray(qq.copy())
    tables1 = _pass_tables(radices1, scales1, sign, algorithm, grouped,
                           engine, first_dot=first_dot,
                           complex_mult=complex_mult)

    if passes == "k2":
        # Floor-attribution: skip the column pass; the raw input stands in
        # as the intermediate (identical shapes/dataflow, garbage values).
        mid_re, mid_im = re3, im3
    elif use_gs1:
        re4 = re3.reshape(b, r_last1, s1_total, n2)
        im4 = im3.reshape(b, r_last1, s1_total, n2)
        data_spec1g = pl.BlockSpec(
            (bt1, r_last1, s1_total, t), lambda ib, it, s: (ib, 0, 0, it),
            memory_space=pltpu.VMEM,
        )
        out_spec1g = pl.BlockSpec(
            (bt1, r_last1, slice_block1, t), lambda ib, it, s: (ib, 0, s, it),
            memory_space=pltpu.VMEM,
        )
        p_spec_g = pl.BlockSpec(
            (1, 2, n1), lambda ib, it, s: (it, 0, 0), memory_space=pltpu.VMEM
        )
        q_spec_g = pl.BlockSpec(
            (2, n1, t), lambda ib, it, s: (0, 0, 0), memory_space=pltpu.VMEM
        )
        table_specs1g = [
            pl.BlockSpec(a.shape, lambda ib, it, s, nd=a.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
            for a in tables1
        ]
        kern1g = lambda *r: _col_kernel_gridslice(
            r[:-2], r[-2:], radices1, algorithm, n1, t, bt1, s1_total,
            slice_block1, grouped, sd, complex_mult, first_dot)
        mid_re, mid_im = pl.pallas_call(
            kern1g,
            grid=(b // bt1, n2 // t, s1_total // slice_block1),
            in_specs=[data_spec1g, data_spec1g, p_spec_g, q_spec_g]
            + table_specs1g,
            out_specs=(out_spec1g, out_spec1g),
            out_shape=(
                jax.ShapeDtypeStruct((b, r_last1, s1_total, n2), re.dtype),
                jax.ShapeDtypeStruct((b, r_last1, s1_total, n2), im.dtype),
            ),
            scratch_shapes=[
                pltpu.VMEM((bt1, s1_total, r_last1, t), re.dtype),
                pltpu.VMEM((bt1, s1_total, r_last1, t), im.dtype),
            ],
            interpret=interpret,
            input_output_aliases={0: 0, 1: 1},
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
                dimension_semantics=("arbitrary",) * 3,
            ),
        )(re4, im4, p_tab, q_tab, *tables1)
        mid_re = mid_re.reshape(b, n1, n2)
        mid_im = mid_im.reshape(b, n1, n2)
    else:
        data_spec1 = pl.BlockSpec(
            (bt1, n1, t), lambda ib, it: (ib, 0, it), memory_space=pltpu.VMEM
        )
        p_spec = pl.BlockSpec(
            (1, 2, n1), lambda ib, it: (it, 0, 0), memory_space=pltpu.VMEM
        )
        q_spec = pl.BlockSpec(
            (2, n1, t), lambda ib, it: (0, 0, 0), memory_space=pltpu.VMEM
        )
        table_specs1 = [
            pl.BlockSpec(a.shape, lambda ib, it, nd=a.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
            for a in tables1
        ]
        kern1 = lambda *refs: _col_kernel(refs, radices1, algorithm, n1, t,
                                          bt1, grouped=grouped,
                                          state_dtype=sd,
                                          complex_mult=complex_mult,
                                          first_dot=first_dot, engine=engine)
        mid_re, mid_im = pl.pallas_call(
            kern1,
            grid=(b // bt1, n2 // t),
            in_specs=[data_spec1, data_spec1, p_spec, q_spec] + table_specs1,
            out_specs=(data_spec1, data_spec1),
            out_shape=(
                jax.ShapeDtypeStruct((b, n1, n2), re.dtype),
                jax.ShapeDtypeStruct((b, n1, n2), im.dtype),
            ),
            interpret=interpret,
            input_output_aliases={0: 0, 1: 1},
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
            ),
        )(re3, im3, p_tab, q_tab, *tables1)

    if passes == "k1":
        # Floor-attribution: column pass alone (contiguous reshape, no
        # relayout — mid is already (b, n1, n2) in both engine branches).
        return mid_re.reshape(b, n), mid_im.reshape(b, n)

    # Pass K2.
    tables2 = _pass_tables(radices2, scales2, sign, algorithm, grouped,
                           engine, first_dot=first_dot,
                           complex_mult=complex_mult)
    if engine.startswith("gridslice"):
        # Deferred-interleave row pass (see _row_kernel_gridslice).  Falls
        # back to the stacked row pass when the plan shape cannot emit whole
        # last-stage slices (the engine string is then inert for K2, exactly
        # as it already is for K1).
        s_total2 = gridslice_layout(radices2, grouped)
        slice_block = int(engine[len("gridslice"):] or 8)
        r_last2 = radices2[-1]
        if (s_total2 is not None and s_total2 % slice_block == 0
                and r_last2 >= 8):
            in_spec2g = pl.BlockSpec(
                (bt2, k1_tile, n2), lambda ib, ik, s: (ib, ik, 0),
                memory_space=pltpu.VMEM,
            )
            out_spec2g = pl.BlockSpec(
                (bt2, r_last2, slice_block, k1_tile),
                lambda ib, ik, s: (ib, 0, s, ik), memory_space=pltpu.VMEM,
            )
            table_specs2g = [
                pl.BlockSpec(a.shape, lambda ib, ik, s, nd=a.ndim: (0,) * nd,
                             memory_space=pltpu.VMEM)
                for a in tables2
            ]
            kern2g = lambda *r: _row_kernel_gridslice(
                r[:-2], r[-2:], radices2, algorithm, n2, k1_tile, bt2,
                s_total2, slice_block, grouped, sd, complex_mult, first_dot)
            out_re, out_im = pl.pallas_call(
                kern2g,
                grid=(b // bt2, n1 // k1_tile, s_total2 // slice_block),
                in_specs=[in_spec2g, in_spec2g] + table_specs2g,
                out_specs=(out_spec2g, out_spec2g),
                out_shape=(
                    jax.ShapeDtypeStruct((b, r_last2, s_total2, n1), re.dtype),
                    jax.ShapeDtypeStruct((b, r_last2, s_total2, n1), im.dtype),
                ),
                scratch_shapes=[
                    pltpu.VMEM((bt2, s_total2, r_last2, k1_tile), re.dtype),
                    pltpu.VMEM((bt2, s_total2, r_last2, k1_tile), im.dtype),
                ],
                interpret=interpret,
                compiler_params=None if interpret else pltpu.CompilerParams(
                    vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
                    dimension_semantics=("arbitrary",) * 3,
                ),
            )(mid_re, mid_im, *tables2)
            return out_re.reshape(b, n), out_im.reshape(b, n)
    in_spec2 = pl.BlockSpec(
        (bt2, k1_tile, n2), lambda ib, ik: (ib, ik, 0), memory_space=pltpu.VMEM
    )
    out_spec2 = pl.BlockSpec(
        (bt2, n2, k1_tile), lambda ib, ik: (ib, 0, ik), memory_space=pltpu.VMEM
    )
    table_specs2 = [
        pl.BlockSpec(a.shape, lambda ib, ik, nd=a.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for a in tables2
    ]
    kern2 = lambda *refs: _row_kernel(refs, radices2, algorithm, n2, k1_tile,
                                      bt2, grouped=grouped, state_dtype=sd,
                                      complex_mult=complex_mult,
                                      first_dot=first_dot, engine=engine)
    out_re, out_im = pl.pallas_call(
        kern2,
        grid=(b // bt2, n1 // k1_tile),
        in_specs=[in_spec2, in_spec2] + table_specs2,
        out_specs=(out_spec2, out_spec2),
        out_shape=(
            jax.ShapeDtypeStruct((b, n2, n1), re.dtype),
            jax.ShapeDtypeStruct((b, n2, n1), im.dtype),
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
        ),
    )(mid_re, mid_im, *tables2)

    return out_re.reshape(b, n), out_im.reshape(b, n)


@functools.partial(
    jax.jit,
    static_argnames=(
        "radices1", "radices2", "scales1", "scales2", "sign", "lane_tile",
        "algorithm", "interpret", "grouped", "state_dtype", "complex_mult",
        "engine",
    ),
)
def fft2_fused(
    re,
    im,
    *,
    radices1: Tuple[int, ...],
    radices2: Tuple[int, ...],
    scales1: Tuple[float, ...],
    scales2: Tuple[float, ...],
    sign: int = dft.FORWARD,
    lane_tile: int = 128,
    algorithm: str = "bf16",
    interpret: bool | None = None,
    grouped: bool | Tuple[bool, bool] = False,
    state_dtype: str = "float32",
    complex_mult: str = "block",
    engine: str = "stacked",
):
    """2D FFT of (B, H, W) planes via the four-step kernels minus the twiddle.

    A row-column 2D transform IS the Bailey four-step without the inter-pass
    twiddle and without the output digit swap: pass 1 runs H-point FFTs down
    the columns, pass 2 runs W-point FFTs along the rows reading transposed
    blocks, storing back in place.  Output (B, H, W) = (B, kh, kw), natural
    order, one HBM round trip per pass (config-3: "2D FFT via row-column
    matmul stages with fused transpose").
    """
    if interpret is None:
        interpret = _interpret_default()
    grouped1, grouped2 = (
        grouped if isinstance(grouped, tuple) else (grouped, grouped)
    )
    if re.ndim != 3 or re.shape != im.shape:
        raise ValueError(
            f"fft2_fused expects matching (B, H, W) planes, got re {re.shape} "
            f"im {im.shape}"
        )
    b, h, w = re.shape
    t = min(lane_tile, w)
    if w % t != 0:
        raise ValueError(f"W={w} not divisible by lane tile {t}")
    kh_tile = min(128, h)
    if h % kh_tile != 0:
        raise ValueError(f"H={h} not divisible by row tile {kh_tile}")

    def batch_tile(panel_elems: int) -> int:
        target = max(1, (1 << 19) // max(panel_elems, 1))
        bt = 1
        while bt * 2 <= target and b % (bt * 2) == 0:
            bt *= 2
        return bt

    bt1 = batch_tile(h * t)
    bt2 = batch_tile(kh_tile * w)

    tables1 = _pass_tables(radices1, scales1, sign, algorithm, grouped1,
                           engine, complex_mult=complex_mult)
    data_spec1 = pl.BlockSpec(
        (bt1, h, t), lambda ib, it: (ib, 0, it), memory_space=pltpu.VMEM
    )
    table_specs1 = [
        pl.BlockSpec(a.shape, lambda ib, it, nd=a.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for a in tables1
    ]
    sd = jnp.dtype(state_dtype)
    kern1 = lambda *refs: _col_kernel(
        refs, radices1, algorithm, h, t, bt1, twiddle=False, grouped=grouped1,
        state_dtype=sd, complex_mult=complex_mult, engine=engine,
    )
    mid_re, mid_im = pl.pallas_call(
        kern1,
        grid=(b // bt1, w // t),
        in_specs=[data_spec1, data_spec1] + table_specs1,
        out_specs=(data_spec1, data_spec1),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w), re.dtype),
            jax.ShapeDtypeStruct((b, h, w), im.dtype),
        ),
        interpret=interpret,
        input_output_aliases={0: 0, 1: 1},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
        ),
    )(re, im, *tables1)

    tables2 = _pass_tables(radices2, scales2, sign, algorithm, grouped2,
                           engine, complex_mult=complex_mult)
    in_spec2 = pl.BlockSpec(
        (bt2, kh_tile, w), lambda ib, ik: (ib, ik, 0), memory_space=pltpu.VMEM
    )
    table_specs2 = [
        pl.BlockSpec(a.shape, lambda ib, ik, nd=a.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for a in tables2
    ]
    kern2 = lambda *refs: _row_kernel(
        refs, radices2, algorithm, w, kh_tile, bt2, transposed=False,
        grouped=grouped2, state_dtype=sd, complex_mult=complex_mult,
        engine=engine,
    )
    out_re, out_im = pl.pallas_call(
        kern2,
        grid=(b // bt2, h // kh_tile),
        in_specs=[in_spec2, in_spec2] + table_specs2,
        out_specs=(in_spec2, in_spec2),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w), re.dtype),
            jax.ShapeDtypeStruct((b, h, w), im.dtype),
        ),
        interpret=interpret,
        input_output_aliases={0: 0, 1: 1},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
        ),
    )(mid_re, mid_im, *tables2)

    return out_re, out_im


@functools.partial(
    jax.jit,
    static_argnames=("radices", "scales", "sign", "algorithm", "interpret",
                     "grouped", "state_dtype", "complex_mult", "first_dot",
                     "engine"),
)
def fused_fft_batch_major(
    re,
    im,
    *,
    radices: Tuple[int, ...],
    scales: Tuple[float, ...],
    sign: int = dft.FORWARD,
    algorithm: str = "bf16",
    interpret: bool | None = None,
    grouped: bool = False,
    state_dtype: str = "float32",
    complex_mult: str = "block",
    first_dot: str = "default",
    engine: str = "stacked",
):
    """Whole-transform FFT on batch-major (B, N) planes in ONE Pallas pass.

    The batch-major counterpart of fused_pallas.fused_fft: instead of the
    caller transposing to transform-major (two extra XLA passes over HBM),
    each program reads a (bt, N) row block, transposes once in VMEM, runs all
    stages, transposes back, and stores in place (the fft2 row kernel with a
    trivial column count).
    """
    if interpret is None:
        interpret = _interpret_default()
    if re.ndim != 2 or re.shape != im.shape:
        raise ValueError(
            f"fused_fft_batch_major expects matching (B, N) planes, got "
            f"re {re.shape} im {im.shape}"
        )
    b, n = re.shape
    # largest power-of-two divisor of b, capped at 128
    rt = 1
    while rt * 2 <= 128 and b % (rt * 2) == 0:
        rt *= 2
    row_tile = rt

    tables = _pass_tables(radices, scales, sign, algorithm, grouped,
                          engine, first_dot=first_dot,
                          complex_mult=complex_mult)
    in_spec = pl.BlockSpec(
        (row_tile, n), lambda ib: (ib, 0), memory_space=pltpu.VMEM
    )
    table_specs = [
        pl.BlockSpec(a.shape, lambda ib, nd=a.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for a in tables
    ]

    sd = jnp.dtype(state_dtype)

    def kernel(*refs):
        re_ref, im_ref = refs[0], refs[1]
        out_re_ref, out_im_ref = refs[-2], refs[-1]
        table_refs = refs[2:-2]
        # Transpose in the storage dtype (halves the slow sublane-transpose
        # traffic for bf16 data), then upcast to the state dtype.
        s_re, s_im = _run_stages(
            re_ref[:].T.astype(sd),  # (n, row_tile)
            im_ref[:].T.astype(sd),
            table_refs, radices, algorithm, n, row_tile, grouped, sd,
            complex_mult, engine, first_dot,
        )
        out_re_ref[:] = s_re.T.astype(out_re_ref.dtype)
        out_im_ref[:] = s_im.T.astype(out_im_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(b // row_tile,),
        in_specs=[in_spec, in_spec] + table_specs,
        out_specs=(in_spec, in_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, n), re.dtype),
            jax.ShapeDtypeStruct((b, n), im.dtype),
        ),
        interpret=interpret,
        input_output_aliases={0: 0, 1: 1},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
        ),
    )(re, im, *tables)


# ---------------------------------------------------------------------------
# R2C/C2R epilogue fusion (BASELINE config 4, round-4).
#
# The standalone Pallas pack/interleave kernels (ops/rfft_pallas.py) fixed
# the XLA structural-op pathology but remain separate HBM round trips: at
# N=2^20/b=16 the four epilogue kernels cost ~2.8 ms against a ~0.5 ms
# combined floor while the two half-length transforms cost ~0.9 ms (round-3
# S10/e3c9ffe measurements).  Here the FORWARD pack (lane deinterleave of
# the real input) rides the K1 column pass's input map, and the INVERSE
# interleave rides the K2 row pass's output map — so the R2C pipeline pays
# exactly the C2C pass count on those legs.  Both are constant permutation
# matmuls (exact: bf16 operands pass the MXU unrounded; fp32 uses the
# 4-term bitmask split), applied in the storage dtype, so results are
# bit-identical to the standalone-kernel path.
# ---------------------------------------------------------------------------


def _col_kernel_packed(refs, radices, algorithm, n1, t, bt,
                       grouped=False, state_dtype=jnp.float32,
                       complex_mult="block", first_dot="default",
                       engine="stacked"):
    """Pass K1 reading INTERLEAVED REAL input: (bt, n1, 2T) blocks of
    x.reshape(b, n1, 2*n2); z_re/z_im = even/odd lanes via one constant
    (2T, 2T) permutation matmul per batch element (rfft half-length pack,
    rfft.py:_deinterleave), then the standard column stages + four-step
    twiddle."""
    from tensorfft_tpu.ops import rfft_pallas

    x_ref = refs[0]
    p_ref, q_ref = refs[1], refs[2]
    pm_ref = refs[3]
    table_refs = refs[4:-2]
    out_re_ref, out_im_ref = refs[-2], refs[-1]

    p_t = p_ref[0].T  # (n1, 2)
    p_re = p_t[:, 0:1]
    p_im = p_t[:, 1:2]
    w_re = p_re * q_ref[0] - p_im * q_ref[1]
    w_im = p_re * q_ref[1] + p_im * q_ref[0]

    for i in range(bt):
        packed = rfft_pallas._permute_dot(x_ref[i], pm_ref[:])  # (n1, 2t) f32
        z_re = packed[:, :t].astype(state_dtype)
        z_im = packed[:, t:].astype(state_dtype)
        s_re, s_im = _run_stages(
            z_re, z_im, table_refs, radices, algorithm, n1, t, grouped,
            state_dtype, complex_mult, engine, first_dot,
        )
        s_re = s_re.astype(jnp.float32)
        s_im = s_im.astype(jnp.float32)
        o_re = s_re * w_re - s_im * w_im
        o_im = s_re * w_im + s_im * w_re
        out_re_ref[i] = o_re.astype(out_re_ref.dtype)
        out_im_ref[i] = o_im.astype(out_im_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n1", "n2", "radices1", "radices2", "scales1", "scales2", "sign",
        "lane_tile", "algorithm", "interpret", "grouped", "state_dtype",
        "complex_mult", "first_dot", "engine", "k1_tile",
    ),
)
def four_step_fft_packed_real(
    x,
    *,
    n1: int,
    n2: int,
    radices1: Tuple[int, ...],
    radices2: Tuple[int, ...],
    scales1: Tuple[float, ...],
    scales2: Tuple[float, ...],
    sign: int = dft.FORWARD,
    lane_tile: int = 128,
    algorithm: str = "bf16",
    interpret: bool | None = None,
    grouped: bool = False,
    state_dtype: str = "float32",
    complex_mult: str = "block",
    first_dot: str = "default",
    engine: str = "stacked",
    k1_tile: int = 128,
):
    """Four-step FFT of the HALF-LENGTH PACKED view of a real (B, 2N) array.

    Equivalent to ``four_step_fft(x[..., 0::2], x[..., 1::2], ...)`` with the
    lane deinterleave fused into K1's input map (zero extra HBM passes);
    bit-identical to running ops/rfft_pallas.pack_split first.  Returns
    (B, N) planes, N = n1 * n2.  K1 always runs the stacked packed kernel
    (gridslice K1 falls back); K2 follows ``engine`` unchanged.
    """
    from tensorfft_tpu.ops import rfft_pallas

    if interpret is None:
        interpret = _interpret_default()
    if x.ndim != 2 or x.shape[1] != 2 * n1 * n2:
        raise ValueError(
            f"four_step_fft_packed_real expects (B, 2*n1*n2) real input, "
            f"got {x.shape} for n1*n2 = {n1 * n2}"
        )
    b, _ = x.shape
    n = n1 * n2
    t = min(lane_tile, n2)
    if n2 % t != 0:
        raise ValueError(f"n2={n2} not divisible by lane tile {t}")
    k1_tile = min(k1_tile, n1)
    if min(t, k1_tile) < 128:
        state_dtype = "float32"
    sd = jnp.dtype(state_dtype)

    def batch_tile(panel_elems: int) -> int:
        target = max(1, (1 << 19) // max(panel_elems, 1))
        bt = 1
        while bt * 2 <= target and b % (bt * 2) == 0:
            bt *= 2
        return bt

    bt1 = batch_tile(n1 * t)
    bt2 = batch_tile(k1_tile * n2)

    x3 = x.reshape(b, n1, 2 * n2)
    p_re, p_im, q_re, q_im = dft.four_step_twiddle_factors(
        n1, n2, t, dtype=np.float32, sign=sign
    )
    pq = np.stack([p_re, p_im]).transpose(2, 0, 1)
    qq = np.stack([q_re, q_im])
    p_tab = jnp.asarray(pq.copy())
    q_tab = jnp.asarray(qq.copy())
    pm = jnp.asarray(rfft_pallas._pack_table(t))
    tables1 = _pass_tables(radices1, scales1, sign, algorithm, grouped,
                           engine, first_dot=first_dot,
                           complex_mult=complex_mult)

    x_spec = pl.BlockSpec(
        (bt1, n1, 2 * t), lambda ib, it: (ib, 0, it), memory_space=pltpu.VMEM
    )
    out_spec1 = pl.BlockSpec(
        (bt1, n1, t), lambda ib, it: (ib, 0, it), memory_space=pltpu.VMEM
    )
    p_spec = pl.BlockSpec(
        (1, 2, n1), lambda ib, it: (it, 0, 0), memory_space=pltpu.VMEM
    )
    q_spec = pl.BlockSpec(
        (2, n1, t), lambda ib, it: (0, 0, 0), memory_space=pltpu.VMEM
    )
    pm_spec = pl.BlockSpec(pm.shape, lambda ib, it: (0, 0),
                           memory_space=pltpu.VMEM)
    table_specs1 = [
        pl.BlockSpec(a.shape, lambda ib, it, nd=a.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for a in tables1
    ]
    eng1 = "stacked" if engine.startswith("gridslice") else engine
    kern1 = lambda *refs: _col_kernel_packed(
        refs, radices1, algorithm, n1, t, bt1, grouped=grouped,
        state_dtype=sd, complex_mult=complex_mult, first_dot=first_dot,
        engine=eng1)
    mid_re, mid_im = pl.pallas_call(
        kern1,
        grid=(b // bt1, n2 // t),
        in_specs=[x_spec, p_spec, q_spec, pm_spec] + table_specs1,
        out_specs=(out_spec1, out_spec1),
        out_shape=(
            jax.ShapeDtypeStruct((b, n1, n2), x.dtype),
            jax.ShapeDtypeStruct((b, n1, n2), x.dtype),
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * n * t,
            bytes_accessed=4 * b * n * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x3, p_tab, q_tab, pm, *tables1)

    # Pass K2: identical to four_step_fft's (shared stacked row kernel).
    tables2 = _pass_tables(radices2, scales2, sign, algorithm, grouped,
                           engine, first_dot=first_dot,
                           complex_mult=complex_mult)
    in_spec2 = pl.BlockSpec(
        (bt2, k1_tile, n2), lambda ib, ik: (ib, ik, 0), memory_space=pltpu.VMEM
    )
    out_spec2 = pl.BlockSpec(
        (bt2, n2, k1_tile), lambda ib, ik: (ib, 0, ik), memory_space=pltpu.VMEM
    )
    table_specs2 = [
        pl.BlockSpec(a.shape, lambda ib, ik, nd=a.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for a in tables2
    ]
    eng2 = "stacked" if engine.startswith("gridslice") else engine
    kern2 = lambda *refs: _row_kernel(refs, radices2, algorithm, n2, k1_tile,
                                      bt2, grouped=grouped, state_dtype=sd,
                                      complex_mult=complex_mult,
                                      first_dot=first_dot, engine=eng2)
    out_re, out_im = pl.pallas_call(
        kern2,
        grid=(b // bt2, n1 // k1_tile),
        in_specs=[in_spec2, in_spec2] + table_specs2,
        out_specs=(out_spec2, out_spec2),
        out_shape=(
            jax.ShapeDtypeStruct((b, n2, n1), x.dtype),
            jax.ShapeDtypeStruct((b, n2, n1), x.dtype),
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
        ),
    )(mid_re, mid_im, *tables2)

    return out_re.reshape(b, n), out_im.reshape(b, n)


def _row_kernel_interleave(refs, radices, algorithm, n2, k1_tile, bt,
                           grouped, state_dtype, complex_mult, first_dot,
                           engine):
    """Pass K2 writing INTERLEAVED REAL output: each (n2, k1_tile) re/im
    result pair becomes one (n2, 2*k1_tile) block of x.reshape(b, n2, 2*n1)
    via the constant interleave permutation matmul (in the storage dtype,
    so results are bit-identical to storing planes + interleave_split)."""
    from tensorfft_tpu.ops import rfft_pallas

    re_ref, im_ref = refs[0], refs[1]
    pm_ref = refs[2]
    table_refs = refs[3:-1]
    x_ref = refs[-1]

    for i in range(bt):
        s_re, s_im = _run_stages(
            re_ref[i].T.astype(state_dtype),
            im_ref[i].T.astype(state_dtype),
            table_refs, radices, algorithm, n2, k1_tile, grouped,
            state_dtype, complex_mult, engine, first_dot,
        )
        wide = jnp.concatenate([s_re, s_im], axis=1).astype(x_ref.dtype)
        x_ref[i] = rfft_pallas._permute_dot(
            wide, pm_ref[:]).astype(x_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n1", "n2", "radices1", "radices2", "scales1", "scales2", "sign",
        "lane_tile", "algorithm", "interpret", "grouped", "state_dtype",
        "complex_mult", "first_dot", "engine", "k1_tile",
    ),
)
def four_step_fft_to_real(
    re,
    im,
    *,
    n1: int,
    n2: int,
    radices1: Tuple[int, ...],
    radices2: Tuple[int, ...],
    scales1: Tuple[float, ...],
    scales2: Tuple[float, ...],
    sign: int = dft.INVERSE,
    lane_tile: int = 128,
    algorithm: str = "bf16",
    interpret: bool | None = None,
    grouped: bool = False,
    state_dtype: str = "float32",
    complex_mult: str = "block",
    first_dot: str = "default",
    engine: str = "stacked",
    k1_tile: int = 128,
):
    """Four-step FFT whose natural-order output planes are INTERLEAVED into
    one real (B, 2N) array inside K2's store (the irfft final interleave,
    rfft.py:_interleave, fused — zero extra HBM passes).  Bit-identical to
    four_step_fft + ops/rfft_pallas.interleave_split.  K1 follows ``engine``
    unchanged (including gridslice); K2 runs the stacked interleave kernel.
    """
    from tensorfft_tpu.ops import rfft_pallas

    if interpret is None:
        interpret = _interpret_default()
    if re.ndim != 2 or re.shape != im.shape:
        raise ValueError(
            f"four_step_fft_to_real expects matching (B, N) planes, got "
            f"re {re.shape} im {im.shape}"
        )
    b, n = re.shape
    if n != n1 * n2:
        raise ValueError(f"N={n} != n1*n2 = {n1}*{n2}")
    t = min(lane_tile, n2)
    if n2 % t != 0:
        raise ValueError(f"n2={n2} not divisible by lane tile {t}")
    k1_tile = min(k1_tile, n1)
    if n1 % k1_tile != 0:
        raise ValueError(f"n1={n1} not divisible by k1 tile {k1_tile}")
    if min(t, k1_tile) < 128:
        state_dtype = "float32"
    sd = jnp.dtype(state_dtype)

    def batch_tile(panel_elems: int) -> int:
        target = max(1, (1 << 19) // max(panel_elems, 1))
        bt = 1
        while bt * 2 <= target and b % (bt * 2) == 0:
            bt *= 2
        return bt

    bt1 = batch_tile(n1 * t)
    bt2 = batch_tile(k1_tile * n2)

    re3 = re.reshape(b, n1, n2)
    im3 = im.reshape(b, n1, n2)

    # Pass K1: byte-for-byte the four_step_fft column pass (incl. gridslice).
    p_re, p_im, q_re, q_im = dft.four_step_twiddle_factors(
        n1, n2, t, dtype=np.float32, sign=sign
    )
    use_gs1 = False
    if engine.startswith("gridslice"):
        s1_total = gridslice_layout(radices1, grouped)
        slice_block1 = int(engine[len("gridslice"):] or 8)
        if (s1_total is not None and s1_total % slice_block1 == 0
                and radices1[-1] >= 8):
            use_gs1 = True
    pq = np.stack([p_re, p_im]).transpose(2, 0, 1)
    qq = np.stack([q_re, q_im])
    if use_gs1:
        r_last1 = radices1[-1]
        perm = ((np.arange(n1) % r_last1) * s1_total
                + np.arange(n1) // r_last1)
        pq = pq[:, :, perm]
        qq = qq[:, perm, :]
    p_tab = jnp.asarray(pq.copy())
    q_tab = jnp.asarray(qq.copy())
    tables1 = _pass_tables(radices1, scales1, sign, algorithm, grouped,
                           engine, first_dot=first_dot,
                           complex_mult=complex_mult)

    if use_gs1:
        re4 = re3.reshape(b, r_last1, s1_total, n2)
        im4 = im3.reshape(b, r_last1, s1_total, n2)
        data_spec1g = pl.BlockSpec(
            (bt1, r_last1, s1_total, t), lambda ib, it, s: (ib, 0, 0, it),
            memory_space=pltpu.VMEM,
        )
        out_spec1g = pl.BlockSpec(
            (bt1, r_last1, slice_block1, t), lambda ib, it, s: (ib, 0, s, it),
            memory_space=pltpu.VMEM,
        )
        p_spec_g = pl.BlockSpec(
            (1, 2, n1), lambda ib, it, s: (it, 0, 0), memory_space=pltpu.VMEM
        )
        q_spec_g = pl.BlockSpec(
            (2, n1, t), lambda ib, it, s: (0, 0, 0), memory_space=pltpu.VMEM
        )
        table_specs1g = [
            pl.BlockSpec(a.shape, lambda ib, it, s, nd=a.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
            for a in tables1
        ]
        kern1g = lambda *r: _col_kernel_gridslice(
            r[:-2], r[-2:], radices1, algorithm, n1, t, bt1, s1_total,
            slice_block1, grouped, sd, complex_mult, first_dot)
        mid_re, mid_im = pl.pallas_call(
            kern1g,
            grid=(b // bt1, n2 // t, s1_total // slice_block1),
            in_specs=[data_spec1g, data_spec1g, p_spec_g, q_spec_g]
            + table_specs1g,
            out_specs=(out_spec1g, out_spec1g),
            out_shape=(
                jax.ShapeDtypeStruct((b, r_last1, s1_total, n2), re.dtype),
                jax.ShapeDtypeStruct((b, r_last1, s1_total, n2), im.dtype),
            ),
            scratch_shapes=[
                pltpu.VMEM((bt1, s1_total, r_last1, t), re.dtype),
                pltpu.VMEM((bt1, s1_total, r_last1, t), im.dtype),
            ],
            interpret=interpret,
            input_output_aliases={0: 0, 1: 1},
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
                dimension_semantics=("arbitrary",) * 3,
            ),
        )(re4, im4, p_tab, q_tab, *tables1)
        mid_re = mid_re.reshape(b, n1, n2)
        mid_im = mid_im.reshape(b, n1, n2)
    else:
        data_spec1 = pl.BlockSpec(
            (bt1, n1, t), lambda ib, it: (ib, 0, it), memory_space=pltpu.VMEM
        )
        p_spec = pl.BlockSpec(
            (1, 2, n1), lambda ib, it: (it, 0, 0), memory_space=pltpu.VMEM
        )
        q_spec = pl.BlockSpec(
            (2, n1, t), lambda ib, it: (0, 0, 0), memory_space=pltpu.VMEM
        )
        table_specs1 = [
            pl.BlockSpec(a.shape, lambda ib, it, nd=a.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
            for a in tables1
        ]
        kern1 = lambda *refs: _col_kernel(refs, radices1, algorithm, n1, t,
                                          bt1, grouped=grouped,
                                          state_dtype=sd,
                                          complex_mult=complex_mult,
                                          first_dot=first_dot, engine=engine)
        mid_re, mid_im = pl.pallas_call(
            kern1,
            grid=(b // bt1, n2 // t),
            in_specs=[data_spec1, data_spec1, p_spec, q_spec] + table_specs1,
            out_specs=(data_spec1, data_spec1),
            out_shape=(
                jax.ShapeDtypeStruct((b, n1, n2), re.dtype),
                jax.ShapeDtypeStruct((b, n1, n2), im.dtype),
            ),
            interpret=interpret,
            input_output_aliases={0: 0, 1: 1},
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
            ),
        )(re3, im3, p_tab, q_tab, *tables1)

    # Pass K2 with the interleave store epilogue.
    tables2 = _pass_tables(radices2, scales2, sign, algorithm, grouped,
                           engine, first_dot=first_dot,
                           complex_mult=complex_mult)
    pm = jnp.asarray(rfft_pallas._interleave_table(k1_tile))
    in_spec2 = pl.BlockSpec(
        (bt2, k1_tile, n2), lambda ib, ik: (ib, ik, 0), memory_space=pltpu.VMEM
    )
    out_spec2 = pl.BlockSpec(
        (bt2, n2, 2 * k1_tile), lambda ib, ik: (ib, 0, ik),
        memory_space=pltpu.VMEM
    )
    pm_spec = pl.BlockSpec(pm.shape, lambda ib, ik: (0, 0),
                           memory_space=pltpu.VMEM)
    table_specs2 = [
        pl.BlockSpec(a.shape, lambda ib, ik, nd=a.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for a in tables2
    ]
    eng2 = "stacked" if engine.startswith("gridslice") else engine
    kern2 = lambda *refs: _row_kernel_interleave(
        refs, radices2, algorithm, n2, k1_tile, bt2, grouped, sd,
        complex_mult, first_dot, eng2)
    x_out = pl.pallas_call(
        kern2,
        grid=(b // bt2, n1 // k1_tile),
        in_specs=[in_spec2, in_spec2, pm_spec] + table_specs2,
        out_specs=out_spec2,
        out_shape=jax.ShapeDtypeStruct((b, n2, 2 * n1), re.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
        ),
    )(mid_re, mid_im, pm, *tables2)

    return x_out.reshape(b, 2 * n)
