"""Forward modeling (reference L7: vip_hci/fm/__init__.py)."""

from .fakecomp import *
