"""Statistics helpers (reference: vip_hci/stats/__init__.py)."""

from .utils_stats import *
