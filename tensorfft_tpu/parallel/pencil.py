"""Distributed transforms: one FFT sharded across chips.

No analog exists in the reference (its dead multi-GPU code had zero
inter-device communication, ComputeFFT.h:295-557); this is the config-5
extension from BASELINE.md.  The global transposes of the Bailey/pencil
decomposition are `jax.lax.all_to_all` collectives under `shard_map`, which
XLA maps onto ICI.

1D: distributed four-step.  x viewed (n1, n2) with the n2 axis sharded:
    local column FFTs (length n1) -> twiddle (per-shard table slice) ->
    tiled all_to_all (the global transpose) -> local row FFTs (length n2).
    Output is in natural frequency order, sharded over the k1 digit.

3D: slab decomposition over a 1D mesh.  x (nx, ny, nz) sharded over nx:
    local FFTs along z and y -> all_to_all swapping the sharded axis from
    x to z -> local FFTs along x.  (A 2D-mesh pencil variant splits two
    axes; the slab is the P<=nx special case and uses one collective.)
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tensorfft_tpu import dft
from tensorfft_tpu.fft import stage_scales
from tensorfft_tpu.ops import stages_jax
from tensorfft_tpu.plan import Precision, balanced_radices, exact_log2

__all__ = ["pencil_fft_1d", "pencil_fft_3d", "pencil_fft_3d_2d_mesh"]


def _engine(re, im, radices, scales, sign, algorithm):
    """Per-shard transform-major FFT engine.

    Uses the fused Pallas kernel on TPU and the staged XLA path elsewhere
    (CPU test meshes).  Both implement identical math.
    """
    if jax.default_backend() == "tpu":
        from tensorfft_tpu.ops import fused_pallas

        return fused_pallas.fused_fft(
            re, im, radices=tuple(radices), scales=tuple(scales), sign=sign,
            algorithm=algorithm,
        )
    return stages_jax.apply_stages(re, im, radices, scales, sign,
                                   algorithm=algorithm)


def pencil_fft_1d(
    re,
    im,
    mesh: Mesh,
    axis_name: str = "sp",
    n1: Optional[int] = None,
    scaling: str = "forward",
    forward: bool = True,
    precision: str = "bfloat16",
) -> Tuple[jax.Array, jax.Array]:
    """One large 1D FFT distributed over the mesh (distributed four-step).

    ``re``/``im``: (..., N) split planar.  N = n1*n2 with n2 divisible by the
    mesh size and n1 divisible by the mesh size.  Returns (..., N) in natural
    frequency order (values exactly ordered; device placement is sharded over
    the k1 digit of k).
    """
    re = jnp.asarray(re)
    im = jnp.asarray(im)
    batch_shape = re.shape[:-1]
    n = re.shape[-1]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    p = mesh.shape[axis_name]
    if n1 is None:
        n1 = 1 << (exact_log2(n) // 2)
    n2 = n // n1
    if n1 % p or n2 % p:
        raise ValueError(f"n1={n1}, n2={n2} must both be divisible by mesh size {p}")
    sign = dft.FORWARD if forward else dft.INVERSE
    algorithm = Precision(precision).dot_algorithm
    rad1 = balanced_radices(n1)
    rad2 = balanced_radices(n2)
    sc1 = stage_scales(rad1, scaling, forward)
    sc2 = stage_scales(rad2, scaling, forward)

    # Twiddle tables, rank-separated so each shard slices its own column:
    # W[k1, q*n2p + j2l] = pcol[k1, q] * q_tab[k1, j2l].
    n2p = n2 // p
    k1g = np.arange(n1, dtype=np.float64)[:, None]
    ph_p = (2.0 * np.pi * sign / n) * (k1g * (np.arange(p, dtype=np.float64)[None, :] * n2p))
    ph_q = (2.0 * np.pi * sign / n) * (k1g * np.arange(n2p, dtype=np.float64)[None, :])
    pcol = np.stack([np.cos(ph_p), np.sin(ph_p)]).astype(np.float32)  # (2, n1, p)
    qtab = np.stack([np.cos(ph_q), np.sin(ph_q)]).astype(np.float32)  # (2, n1, n2p)

    def shard_fn(re_l, im_l, pcol_l, qtab_l):
        # re_l: (b, n1, n2p) — the j2 axis is sharded.
        q = jax.lax.axis_index(axis_name)
        # Pass 1: FFT over j1 (transform-major (n1, b*n2p)).
        a_re = jnp.moveaxis(re_l, 1, 0).reshape(n1, b * n2p)
        a_im = jnp.moveaxis(im_l, 1, 0).reshape(n1, b * n2p)
        a_re, a_im = _engine(a_re, a_im, rad1, sc1, sign, algorithm)
        a_re = a_re.reshape(n1, b, n2p)
        a_im = a_im.reshape(n1, b, n2p)
        # Twiddle: W = pcol[:, q, None] * qtab  (complex), shapes (n1, n2p).
        pr = jax.lax.dynamic_slice_in_dim(pcol_l[0], q, 1, axis=1)
        pi = jax.lax.dynamic_slice_in_dim(pcol_l[1], q, 1, axis=1)
        w_re = pr * qtab_l[0] - pi * qtab_l[1]
        w_im = pr * qtab_l[1] + pi * qtab_l[0]
        w_re = w_re[:, None, :]
        w_im = w_im[:, None, :]
        a_re, a_im = (
            a_re * w_re - a_im * w_im,
            a_re * w_im + a_im * w_re,
        )
        # Global transpose: shard axis moves from j2 to k1.
        a_re = jax.lax.all_to_all(a_re, axis_name, split_axis=0, concat_axis=2, tiled=True)
        a_im = jax.lax.all_to_all(a_im, axis_name, split_axis=0, concat_axis=2, tiled=True)
        # a: (n1/p, b, n2) with full j2.  Pass 2: FFT over j2.
        n1p = n1 // p
        a_re = jnp.moveaxis(a_re, 2, 0).reshape(n2, n1p * b)
        a_im = jnp.moveaxis(a_im, 2, 0).reshape(n2, n1p * b)
        a_re, a_im = _engine(a_re, a_im, rad2, sc2, sign, algorithm)
        # (k2, k1l, b) -> (b, k2, k1l): global (b, n2, n1) is natural k order.
        a_re = a_re.reshape(n2, n1p, b).transpose(2, 0, 1)
        a_im = a_im.reshape(n2, n1p, b).transpose(2, 0, 1)
        return a_re, a_im

    from jax.experimental.shard_map import shard_map

    in_spec = P(None, None, axis_name)
    tab_spec = P(None, None, None)
    out_spec = P(None, None, axis_name)
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(in_spec, in_spec, tab_spec, tab_spec),
        out_specs=(out_spec, out_spec),
    )
    re3 = re.reshape(b, n1, n2)
    im3 = im.reshape(b, n1, n2)
    o_re, o_im = jax.jit(fn)(re3, im3, jnp.asarray(pcol), jnp.asarray(qtab))
    return (
        o_re.reshape(*batch_shape, n),
        o_im.reshape(*batch_shape, n),
    )


def pencil_fft_3d(
    re,
    im,
    mesh: Mesh,
    axis_name: str = "sp",
    scaling: str = "forward",
    forward: bool = True,
    precision: str = "bfloat16",
) -> Tuple[jax.Array, jax.Array]:
    """3D FFT of a (nx, ny, nz) volume, slab-sharded over nx.

    Local FFTs along z then y, one all_to_all moving the shard from x to z,
    local FFTs along x.  Output (kx, ky, kz) with kz sharded.  Total forward
    scale 1/(nx*ny*nz) under 'forward' scaling.
    """
    re = jnp.asarray(re)
    im = jnp.asarray(im)
    nx, ny, nz = re.shape
    p = mesh.shape[axis_name]
    if nx % p or nz % p:
        raise ValueError(f"nx={nx} and nz={nz} must be divisible by mesh size {p}")
    sign = dft.FORWARD if forward else dft.INVERSE
    algorithm = Precision(precision).dot_algorithm

    def axis_fft(a_re, a_im, length, batch):
        radices = balanced_radices(length)
        scales = stage_scales(radices, scaling, forward)
        return _engine(a_re.reshape(length, batch), a_im.reshape(length, batch),
                       radices, scales, sign, algorithm)

    def shard_fn(re_l, im_l):
        nxp = nx // p
        # FFT along z: transform-major (nz, nxp*ny).
        a_re = jnp.moveaxis(re_l, 2, 0)
        a_im = jnp.moveaxis(im_l, 2, 0)
        a_re, a_im = axis_fft(a_re, a_im, nz, nxp * ny)
        a_re = a_re.reshape(nz, nxp, ny)
        a_im = a_im.reshape(nz, nxp, ny)
        # FFT along y: (ny, nz*nxp).
        a_re = jnp.moveaxis(a_re, 2, 0)
        a_im = jnp.moveaxis(a_im, 2, 0)
        a_re, a_im = axis_fft(a_re, a_im, ny, nz * nxp)
        a_re = a_re.reshape(ny, nz, nxp)  # (ky, kz, x_local)
        a_im = a_im.reshape(ny, nz, nxp)
        # Global transpose: shard moves x -> z.
        a_re = jax.lax.all_to_all(a_re, axis_name, split_axis=1, concat_axis=2, tiled=True)
        a_im = jax.lax.all_to_all(a_im, axis_name, split_axis=1, concat_axis=2, tiled=True)
        # (ky, nz/p, nx): FFT along x.
        nzp = nz // p
        a_re = jnp.moveaxis(a_re, 2, 0)
        a_im = jnp.moveaxis(a_im, 2, 0)
        a_re, a_im = axis_fft(a_re, a_im, nx, ny * nzp)
        # (kx, ky, kz_local)
        return a_re.reshape(nx, ny, nzp), a_im.reshape(nx, ny, nzp)

    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis_name, None, None), P(axis_name, None, None)),
        out_specs=(P(None, None, axis_name), P(None, None, axis_name)),
    )
    return jax.jit(fn)(re, im)


def pencil_fft_3d_2d_mesh(
    re,
    im,
    mesh: Mesh,
    axis_names: Tuple[str, str] = ("py", "pz"),
    scaling: str = "forward",
    forward: bool = True,
    precision: str = "bfloat16",
) -> Tuple[jax.Array, jax.Array]:
    """True pencil-decomposed 3D FFT over a 2D device mesh (py x pz).

    The v5p-16-class decomposition (a 1D mesh can only slab): the volume is
    split into x-pencils — local (nx, ny/py, nz/pz) — and each transpose is a
    tiled all_to_all over ONE mesh axis, so communication stays inside mesh
    rows/columns (ICI neighbors on a torus):

        FFT x  ->  all_to_all(py): x<->y  ->  FFT y
               ->  all_to_all(pz): y<->z  ->  FFT z

    Output (kx, ky, kz) sharded (py, pz, None).  Total forward scale
    1/(nx*ny*nz) under 'forward' scaling.
    """
    re = jnp.asarray(re)
    im = jnp.asarray(im)
    nx, ny, nz = re.shape
    ax_y, ax_z = axis_names
    py = mesh.shape[ax_y]
    pz = mesh.shape[ax_z]
    if ny % py or nx % py or nz % pz or ny % pz:
        raise ValueError(
            f"(nx, ny, nz)=({nx},{ny},{nz}) must be divisible by mesh "
            f"({py},{pz}) on the exchanged axes"
        )
    sign = dft.FORWARD if forward else dft.INVERSE
    algorithm = Precision(precision).dot_algorithm

    def axis_fft(a_re, a_im, length, batch):
        radices = balanced_radices(length)
        scales = stage_scales(radices, scaling, forward)
        return _engine(a_re.reshape(length, batch), a_im.reshape(length, batch),
                       radices, scales, sign, algorithm)

    def shard_fn(re_l, im_l):
        nyl, nzl = ny // py, nz // pz
        # FFT along x (full locally): transform-major (nx, nyl*nzl).
        a_re, a_im = axis_fft(re_l, im_l, nx, nyl * nzl)
        a_re = a_re.reshape(nx, nyl, nzl)
        a_im = a_im.reshape(nx, nyl, nzl)
        # Transpose x<->y within py groups: (nx, nyl, nzl) -> (nx/py, ny, nzl).
        a_re = jax.lax.all_to_all(a_re, ax_y, split_axis=0, concat_axis=1, tiled=True)
        a_im = jax.lax.all_to_all(a_im, ax_y, split_axis=0, concat_axis=1, tiled=True)
        nxl = nx // py
        # FFT along y: (ny, nxl*nzl).
        a_re = jnp.moveaxis(a_re, 1, 0)
        a_im = jnp.moveaxis(a_im, 1, 0)
        a_re, a_im = axis_fft(a_re, a_im, ny, nxl * nzl)
        a_re = a_re.reshape(ny, nxl, nzl)
        a_im = a_im.reshape(ny, nxl, nzl)
        # Transpose y<->z within pz groups: (ny, nxl, nzl) -> (ny/pz, nxl, nz).
        a_re = jax.lax.all_to_all(a_re, ax_z, split_axis=0, concat_axis=2, tiled=True)
        a_im = jax.lax.all_to_all(a_im, ax_z, split_axis=0, concat_axis=2, tiled=True)
        nyl2 = ny // pz
        # FFT along z: (nz, nyl2*nxl).
        a_re = jnp.moveaxis(a_re, 2, 0)
        a_im = jnp.moveaxis(a_im, 2, 0)
        a_re, a_im = axis_fft(a_re, a_im, nz, nyl2 * nxl)
        # state (kz, ky_l2, kx_l) -> local (kx_l, ky_l2, kz)
        a_re = a_re.reshape(nz, nyl2, nxl).transpose(2, 1, 0)
        a_im = a_im.reshape(nz, nyl2, nxl).transpose(2, 1, 0)
        return a_re, a_im

    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(None, ax_y, ax_z), P(None, ax_y, ax_z)),
        out_specs=(P(ax_y, ax_z, None), P(ax_y, ax_z, None)),
    )
    return jax.jit(fn)(re, im)
