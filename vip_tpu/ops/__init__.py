"""Low-level jittable device kernels (FFT transforms, linear algebra,
registration, aperture photometry). These are the TPU-native replacements
of the reference's native/accelerated dependencies (SURVEY.md table 2.a)."""

from . import fft
from . import linalg
from . import registration
