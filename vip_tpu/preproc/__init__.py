"""Preprocessing / calibration layer (reference L3:
vip_hci/preproc/__init__.py:31-39) — the hot FFT-transform layer."""

from .badframes import *
from .badpixremoval import *
from .cosmetics import *
from .derotation import *
from .parangles import *
from .recentering import *
from .rescaling import *
from .skysubtraction import *
from .subsampling import *
