"""FITS I/O (reference L2: vip_hci/fits/__init__.py) — self-contained
reader/writer with a native mmap decoder."""

from .fits import *
from .headers import *
