"""Spectral Poisson solver on the distributed 3D FFT (BASELINE.md config 5).

Solves  laplacian(u) = f  with periodic boundary conditions on an
(nx, ny, nz) grid: forward 3D FFT of f across the device mesh (slab/pencil
decomposition, all_to_all transposes), divide by the spectral Laplacian
eigenvalues -4*sum(sin^2(pi*k/n))/h^2 (or the continuous -|2 pi k|^2), zero
the mean mode, inverse 3D FFT.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from tensorfft_tpu.parallel.pencil import pencil_fft_3d

__all__ = ["poisson_solve_3d"]


def _spectral_laplacian(nx, ny, nz, lengths, discrete: bool):
    lx, ly, lz = lengths
    hx, hy, hz = lx / nx, ly / ny, lz / nz
    kx = np.fft.fftfreq(nx) * nx
    ky = np.fft.fftfreq(ny) * ny
    kz = np.fft.fftfreq(nz) * nz
    if discrete:
        ex = -4.0 / hx**2 * np.sin(np.pi * kx / nx) ** 2
        ey = -4.0 / hy**2 * np.sin(np.pi * ky / ny) ** 2
        ez = -4.0 / hz**2 * np.sin(np.pi * kz / nz) ** 2
    else:
        ex = -(2 * np.pi * kx / lx) ** 2
        ey = -(2 * np.pi * ky / ly) ** 2
        ez = -(2 * np.pi * kz / lz) ** 2
    lam = ex[:, None, None] + ey[None, :, None] + ez[None, None, :]
    lam[0, 0, 0] = 1.0  # mean mode handled by zeroing
    return lam


def poisson_solve_3d(
    f,
    mesh: Mesh,
    axis_name: str = "sp",
    lengths=(1.0, 1.0, 1.0),
    discrete: bool = True,
    precision: str = "float32",
):
    """Solve laplacian(u) = f (periodic, zero-mean u) on a device mesh.

    ``f``: real (nx, ny, nz) array.  Returns real u of the same shape.
    The heavy lifting is two distributed 3D FFTs (pencil_fft_3d).
    """
    f = jnp.asarray(f, jnp.float32)
    nx, ny, nz = f.shape
    lam = jnp.asarray(1.0 / _spectral_laplacian(nx, ny, nz, lengths, discrete),
                      jnp.float32)
    mask = np.ones((nx, ny, nz), np.float32)
    mask[0, 0, 0] = 0.0
    mask = jnp.asarray(mask)

    F_re, F_im = pencil_fft_3d(f, jnp.zeros_like(f), mesh,
                               axis_name=axis_name, precision=precision)
    U_re = F_re.astype(jnp.float32) * lam * mask
    U_im = F_im.astype(jnp.float32) * lam * mask
    u_re, _u_im = pencil_fft_3d(U_re, U_im, mesh, axis_name=axis_name,
                                forward=False, precision=precision)
    return u_re.astype(jnp.float32)
