"""Detection statistics (reference L6: vip_hci/metrics/__init__.py)."""

from .snr_source import *
from .stim import *
from .contrcurve import *
from .detection import *
