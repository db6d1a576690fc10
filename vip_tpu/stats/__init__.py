"""Statistics helpers (reference: vip_hci/stats/__init__.py)."""

from .bkg_proba import *
from .clip_sigma import *
from .distances import *
from .im_stats import *
from .utils_stats import *
