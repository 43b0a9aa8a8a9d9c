"""Spectral analysis walkthrough: windows, R2C, shifts, any-length FFTs.

The reference ships raw-kernel examples only (ExampleSingleFFT.cu:20-96);
this demonstrates the analysis vocabulary a production FFT framework adds
around the transform: leakage control with a DFT-even window, the R2C path
for real signals, center-DC display ordering, and a non-power-of-two
transform via the Bluestein path.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import tensorfft_tpu as tfft


def main():
    n, fs = 4096, 48_000.0
    t = np.arange(n) / fs
    # Two tones (one off-bin) + noise, real-valued.
    x = (1.00 * np.sin(2 * np.pi * 3000.37 * (fs / fs) * t)
         + 0.01 * np.sin(2 * np.pi * 9800.0 * t)
         + 0.001 * np.random.default_rng(0).standard_normal(n)
         ).astype(np.float32)

    # Rectangular vs hann-windowed R2C spectra (library 1/N scaling).
    w = np.asarray(tfft.window("hann", n, periodic=True))
    spec_rect = np.abs(tfft.rfft(x[None, :], precision="float32"))[0]
    spec_hann = np.abs(tfft.rfft((x * w)[None, :], precision="float32"))[0]
    freqs = np.asarray(tfft.rfftfreq(n, d=1.0 / fs))

    def peak(spec):
        k = int(spec.argmax())
        return freqs[k], spec[k]

    f_r, a_r = peak(spec_rect)
    f_h, a_h = peak(spec_hann)
    print(f"rect window:  peak {a_r:.4f} at {f_r:8.1f} Hz")
    print(f"hann window:  peak {a_h:.4f} at {f_h:8.1f} Hz")
    # The off-bin 3 kHz tone leaks across the whole band under the
    # rectangular window; hann drops the far-band leakage floor by orders
    # of magnitude (compare a quiet band, 15-20 kHz).
    quiet = (freqs > 15_000) & (freqs < 20_000)
    print(f"15-20 kHz leakage floor  rect: {np.median(spec_rect[quiet]):.2e}"
          f"   hann: {np.median(spec_hann[quiet]):.2e}")

    # Center-DC ordering for display (fftshift on a full C2C spectrum): the
    # mean of the signal lands at bin 0, and at N/2 after the shift.
    z = tfft.fft((x + 10.0).astype(np.float32)[None, :], precision="float32")
    z_c = np.asarray(tfft.fftshift(z, axes=-1))
    print(f"fftshift: DC bin moved from 0 to {np.abs(z_c[0]).argmax()}"
          f" (= N/2 = {n // 2})")

    # A non-power-of-two length via Bluestein: 1000-point transform.
    y = np.sin(2 * np.pi * 50 * np.arange(1000) / 1000)
    Y = tfft.fft_any(y[None, :].astype(np.float32))[0]
    print(f"fft_any(N=1000): tone recovered at bin {int(np.abs(Y).argmax())}"
          f" (expect 50), vs numpy max err "
          f"{np.abs(Y - np.fft.fft(y) / 1000).max():.2e}")


if __name__ == "__main__":
    main()
