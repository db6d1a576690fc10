"""Greedy / iterative algorithms (reference L4c: vip_hci/greedy/__init__.py)."""

from .ipca_fullfr import *
from .inmf_fullfr import *
from .irollsub import *
