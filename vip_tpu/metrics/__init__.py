"""Detection statistics (reference L6: vip_hci/metrics/__init__.py)."""

from .completeness import *
from .contrcurve import *
from .detection import *
from .roc import *
from .snr_source import *
from .stim import *
