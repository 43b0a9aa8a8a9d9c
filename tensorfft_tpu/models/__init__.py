"""Demo applications built on the FFT framework.

The reference has no applications layer; these realize the BASELINE.md demo
configs: FFT-based convolution (config 3/4) and a spectral Poisson solver on
the distributed 3D FFT (config 5).
"""

from tensorfft_tpu.models.fft_conv import fft_convolve_2d, fft_convolve_real
from tensorfft_tpu.models.poisson import poisson_solve_3d
