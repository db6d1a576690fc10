"""DS9 window control (reference vip_hci/vip_ds9.py).

Thin wrapper around pyds9 with the same ``Ds9Window`` API. pyds9 (and a
running X/DS9) is an optional, interactive-only dependency: the class is
importable everywhere and raises a clear error at construction when pyds9
is unavailable.
"""

__all__ = ["Ds9Window"]


def _require_pyds9():
    try:
        import pyds9
        return pyds9
    except ImportError as exc:
        raise ImportError(
            "pyds9 (and a DS9 installation) is required for Ds9Window. "
            "It is an optional interactive dependency not bundled with "
            "vip_tpu.") from exc


class Ds9Window:
    """DS9 window (reference vip_ds9.py:22-318)."""

    def __init__(self, wait=10):
        pyds9 = _require_pyds9()
        self.window = pyds9.DS9(wait=wait)

    def clear_frames(self):
        """Clear all frames (reference vip_ds9.py:37-41)."""
        self.window.set("frame clear all")

    def create_frame(self):
        """Create a new frame (reference vip_ds9.py:42-46)."""
        self.window.set("frame new")

    def cmap(self, value=None):
        """Set or get the colormap (reference vip_ds9.py:47-77)."""
        if value is not None:
            self.window.set("cmap {}".format(value))
        else:
            print(self.window.get("cmap"))

    def crosshair_get(self):
        """Get the crosshair coordinates (reference vip_ds9.py:78-93)."""
        return self.window.get("crosshair")

    def crosshair_set(self, x=None, y=None):
        """Set the crosshair (reference vip_ds9.py:94-109)."""
        if x is not None and y is not None:
            self.window.set("crosshair {} {} physical".format(x, y))
        else:
            self.window.set("mode crosshair")

    def delete_frame(self, all_frames=False):
        """Delete frame(s) (reference vip_ds9.py:110-123)."""
        if all_frames:
            self.window.set("frame delete all")
        else:
            self.window.set("frame delete")

    def display(self, *arrays, **kwargs):
        """Display numpy array(s) (reference vip_ds9.py:124-160)."""
        keep_prev = kwargs.get("keep_prev", False)
        if not keep_prev:
            self.clear_frames()
        for array in arrays:
            self.create_frame()
            self.window.set_np2arr(array)
        self.tile()

    def get(self, paramlist):
        """Raw XPA get (reference vip_ds9.py:161-167)."""
        return self.window.get(paramlist)

    def lock(self, scale=True, colorbar=True, crosshair=True, slices=True):
        """Lock display properties (reference vip_ds9.py:168-180)."""
        if scale:
            self.window.set("lock scale yes")
        if colorbar:
            self.window.set("lock colorbar yes")
        if crosshair:
            self.window.set("lock crosshair image")
        if slices:
            self.window.set("lock slice image")

    def pan(self, x=None, y=None):
        """Pan to coordinates (reference vip_ds9.py:181-196)."""
        if x is not None and y is not None:
            self.window.set("pan to {} {}".format(x, y))
        else:
            self.window.set("mode pan")

    def rotate(self, value=None):
        """Rotate the display (reference vip_ds9.py:197-210)."""
        if value is not None:
            self.window.set("rotate {}".format(value))
        else:
            self.window.set("rotate open")

    def scale(self, value=None):
        """Set or get the scale (reference vip_ds9.py:211-242)."""
        if value is not None:
            self.window.set("scale {}".format(value))
        else:
            print(self.window.get("scale"))

    def set(self, paramlist, data=None, data_func=-1):
        """Raw XPA set (reference vip_ds9.py:243-249)."""
        self.window.set(paramlist, data, data_func)

    def tile(self, mode="column"):
        """Set tiling (reference vip_ds9.py:250-281)."""
        if mode in ("off", "no"):
            self.window.set("tile no")
        else:
            self.window.set("tile yes")
            self.window.set("tile mode {}".format(mode))

    def unlock(self, scale=True, colorbar=True, crosshair=True,
               slices=True):
        """Unlock display properties (reference vip_ds9.py:282-293)."""
        if scale:
            self.window.set("lock scale no")
        if colorbar:
            self.window.set("lock colorbar no")
        if crosshair:
            self.window.set("lock crosshair none")
        if slices:
            self.window.set("lock slice none")

    def zoom(self, value="to fit"):
        """Zoom (reference vip_ds9.py:294-318)."""
        self.window.set("zoom {}".format(value))
