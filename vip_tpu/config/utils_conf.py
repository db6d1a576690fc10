"""Runtime utilities: array checks, progress, persistence, device batching.

TPU-native replacement of the reference's
``vip_hci/config/utils_conf.py``. The reference's central abstraction is
``pool_map`` — a fork-based ``multiprocessing.Pool`` map with BLAS-thread
pinning (utils_conf.py:445-551). On TPU the equivalent of the whole process
pool is *batched device computation*: every ``pool_map`` call site maps to a
``jax.vmap`` (single chip) or ``jax.shard_map`` (multi chip) axis. A
compatibility ``pool_map`` shim is still provided for host-side code paths
(e.g. plotting or I/O loops) — it executes serially or vectorized, never
forks.
"""

import os
import sys
from contextlib import contextmanager
from os.path import exists

import numpy as np

_PACKAGE_VERSION = "0.1.0"  # kept in sync with vip_tpu.__version__

sep = "-" * 80

__all__ = [
    "sep",
    "check_array",
    "frame_or_shape",
    "iterable",
    "pool_map",
    "make_chunks",
    "Progressbar",
    "Saveable",
    "redirect_output",
    "vip_figsize",
    "vip_figdpi",
]

vip_figsize = (8, 5)
vip_figdpi = 100


# ---------------------------------------------------------------------------
# array checking
# ---------------------------------------------------------------------------
def check_array(input_array, dim, msg=None):
    """Check the dimensionality of an input array.

    Parity with reference utils_conf.py:309-410: ``dim`` may be an int or a
    tuple of accepted ndims. 1d inputs may be list/tuple as well.
    """
    if msg is None:
        msg = "Input array"

    error = False
    if isinstance(dim, (int, np.integer)):
        dims = (dim,)
    else:
        dims = tuple(int(d) for d in dim)

    if 1 in dims and isinstance(input_array, (list, tuple)):
        input_array = np.asarray(input_array)

    if not isinstance(input_array, np.ndarray):
        try:
            import jax

            if not isinstance(input_array, jax.Array):
                error = True
        except ImportError:
            error = True
    if not error and input_array.ndim not in dims:
        error = True

    if error:
        dim_names = {1: "1d", 2: "2d", 3: "3d", 4: "4d"}
        wanted = " or ".join(dim_names.get(d, f"{d}d") for d in dims)
        raise TypeError(f"`{msg}` must be a {wanted} numpy ndarray")
    return input_array


def frame_or_shape(data):
    """Accept a 2d frame or a shape tuple; return a 2d array (of zeros for a
    shape). Mirrors reference utils_conf behavior used by ``var.shapes``."""
    if isinstance(data, tuple):
        return np.zeros(data)
    data = np.asarray(data)
    if data.ndim != 2:
        raise TypeError("`data` must be a frame or a shape tuple")
    return data


# ---------------------------------------------------------------------------
# pool_map compatibility shim (host-side only; device code uses vmap)
# ---------------------------------------------------------------------------
class _Iterable:
    """Marker wrapping the arguments of ``pool_map`` that vary per task
    (reference utils_conf.py:413-442)."""

    def __init__(self, it):
        self.it = it


def iterable(v):
    return _Iterable(v)


def pool_map(nproc, fkt, *args, msg=None, verbose=True, progressbar_single=False,
             **kwargs):
    """Map over the product of ``iterable``-wrapped args.

    Compatibility shim for reference ``pool_map`` (utils_conf.py:445-551).
    The TPU build never forks: hot paths are vmapped on device. The rare
    remaining host loops run here — serially for nproc=1, on a thread
    pool for nproc>1 (workers are independent by the reference's
    fork-pool contract, and numpy/scipy/jax release the GIL in their
    compute kernels). nproc=None maps to half the cores, as upstream.
    """
    iterables = [a.it for a in args if isinstance(a, _Iterable)]
    if not iterables:
        return [fkt(*args)]
    length = len(iterables[0])

    def _call(i):
        return fkt(*[a.it[i] if isinstance(a, _Iterable) else a
                     for a in args])

    if nproc is None:
        import multiprocessing

        nproc = max(1, multiprocessing.cpu_count() // 2)
    if nproc > 1 and length > 1:
        from concurrent.futures import ThreadPoolExecutor

        if verbose and msg is not None:
            # reference prints this before mapping (utils_conf.py:66-67)
            print(f"{msg} with {nproc} processes")
        with ThreadPoolExecutor(min(int(nproc), length)) as ex:
            return list(ex.map(_call, range(length)))
    idx = range(length)
    if progressbar_single:
        idx = Progressbar(idx, desc=msg, verbose=verbose, total=length)
    return [_call(i) for i in idx]


def pool_imap(nproc, fkt, *args, **kwargs):
    """Lazy variant of pool_map (reference utils_conf.py:554-613); yields
    results one at a time."""
    for res in pool_map(nproc, fkt, *args, **kwargs):
        yield res


def make_chunks(l, n):
    """Chunk ``l`` into ``n`` strided parts — same element placement as the
    reference (utils_conf.py:615-635): make_chunks(range(13), 3) ->
    [[0,3,6,9,12], [1,4,7,10], [2,5,8,11]]."""
    l = list(l)
    return [l[i::n] for i in range(n)]


# ---------------------------------------------------------------------------
# progress bar
# ---------------------------------------------------------------------------
class Progressbar:
    """Progress bars with selectable backends (reference
    utils_conf.py:133-213): ``tqdm`` (default), ``tqdm_notebook``,
    ``hide``; the module-level ``Progressbar.backend`` default can be
    changed globally with ``Progressbar.set``. Supports both the
    iterable-wrapping and the manual ``bar = Progressbar(total=n);
    bar.update()`` usage patterns. Falls back to the silent wrapper when
    tqdm is unavailable."""

    backend = "tqdm"

    def __new__(cls, iterable=None, desc=None, total=None, leave=True,
                backend=None, verbose=True):
        if backend is None:
            backend = Progressbar.backend
        if not verbose:
            backend = "hide"
        if backend in ("tqdm", "tqdm_notebook"):
            try:
                if backend == "tqdm_notebook":
                    from tqdm.notebook import tqdm
                else:
                    from tqdm import tqdm
            except ImportError:
                return NoProgressbar(iterable=iterable)
            return tqdm(iterable=iterable, desc=desc, total=total,
                        leave=leave, ascii=True, ncols=80, file=sys.stdout,
                        bar_format="{l_bar}{bar}| {n_fmt}/{total_fmt} "
                                   "[{elapsed}<{remaining}{postfix}]")
        elif backend == "pyprind":
            try:
                from pyprind import ProgBar, prog_bar
            except ImportError:
                return NoProgressbar(iterable=iterable)
            ProgBar._adjust_width = lambda self: None  # constant width
            if iterable is None:
                return ProgBar(total, title=desc, stream=1)
            return prog_bar(iterable, title=desc, stream=1,
                            iterations=total)
        elif backend == "hide":
            return NoProgressbar(iterable=iterable)
        raise NotImplementedError("unknown backend")

    def set(b):
        Progressbar.backend = b


# ---------------------------------------------------------------------------
# persistence
# ---------------------------------------------------------------------------
class Saveable:
    """Mixin adding compressed-``.npz`` save/load with class tagging.

    Uses the same on-disk layout as the reference (utils_conf.py:56-130):
    one npz entry per attribute in ``_saved_attributes``, plus
    ``_vip_object`` / ``_vip_version`` tags and ``_item_<name>`` markers
    for scalar (non-array) attributes — so files written here load in the
    reference package and vice versa.
    """

    def save(self, filename: str):
        names = getattr(self, "_saved_attributes", None)
        if names is None:
            names = sorted(self.__dict__)
        entries = {"_vip_object": type(self).__name__,
                   "_vip_version": _PACKAGE_VERSION}
        for name in names:
            if not hasattr(self, name):
                continue
            value = getattr(self, name)
            entries[name] = value
            if not isinstance(value, np.ndarray):
                entries["_item_" + name] = True
        np.savez_compressed(filename, **entries)
        return filename

    @classmethod
    def load(cls, filename: str):
        filename = str(filename)
        if not filename.endswith(".npz") and not exists(filename):
            filename = filename + ".npz"
        with np.load(filename, allow_pickle=True) as f:
            if "_vip_object" not in f:
                raise RuntimeError(
                    f"{filename} is not a saved VIP object")
            clsname = f["_vip_object"].item()
            if clsname != cls.__name__:
                raise RuntimeError(
                    f"File {filename} holds a {clsname}, not a "
                    f"{cls.__name__}; use {clsname}.load() instead")
            obj = cls.__new__(cls)
            for key in f.files:
                if key.startswith("_"):
                    continue
                value = f[key]
                if "_item_" + key in f.files:
                    # the marker records a non-ndarray attribute; lists
                    # and tuples land in npz as multi-element arrays
                    # where .item() raises (the reference has the same
                    # trap at utils_conf.py:120) — rebuild via tolist()
                    value = value.item() if value.ndim == 0 \
                        else value.tolist()
                setattr(obj, key, value)
        for name in getattr(cls, "_saved_attributes", ()):
            if not hasattr(obj, name):
                setattr(obj, name, None)
        post = getattr(obj, "_post_load", None)
        if callable(post):
            post()             # e.g. recompute shape-derived attributes
        return obj


@contextmanager
def redirect_output(filename):
    """Redirect stdout to a file (reference utils_conf.py:638-660)."""
    old = sys.stdout
    with open(filename, "a") as f:
        sys.stdout = f
        try:
            yield
        finally:
            sys.stdout = old


def eval_func_tuple(f_args):
    """Apply f to the rest of the tuple (reference helper)."""
    return f_args[0](*f_args[1:])


def algo_calculates_decorator(*calculated_attributes):
    """Decorator marking which attributes a PostProc method calculates
    (reference config/utils_conf.py:236-305)."""
    from functools import wraps
    from inspect import Parameter, signature

    def decorator(fkt):
        @wraps(fkt)
        def wrapper(self, *args, **kwargs):
            res = fkt(self, *args, **kwargs)
            sig = signature(fkt)
            all_kwargs = {k: v.default for k, v in sig.parameters.items()
                          if v.default is not Parameter.empty}
            all_kwargs.update(kwargs)
            if not hasattr(self, "_called_calculators"):
                self._called_calculators = []
            self._called_calculators.append(fkt.__name__)
            if all_kwargs.get("verbose", False):
                self._show_attribute_help(fkt.__name__)
            return res

        wrapper._calculates = set(calculated_attributes)
        return wrapper

    return decorator


def print_precision(array, precision=3):
    """Print an array with controlled precision
    (reference config/utils_conf.py)."""
    import numpy as np

    with np.printoptions(precision=precision, suppress=True):
        print(np.asarray(array))


class SaveableEmpty:
    """Empty shell used by ``Saveable`` to restore an object without calling
    __init__ (reference utils_conf.py:47-53)."""

    pass


class NoProgressbar:
    """Wraps an iterable with the ``Progressbar`` interface but without any
    output (reference utils_conf.py:215-227)."""

    def __init__(self, iterable=None):
        self.iterable = iterable

    def __iter__(self):
        return self.iterable.__iter__()

    def __next__(self):
        return self.iterable.__next__()

    def __getattr__(self, key):
        if key == "iterable":  # not set yet (e.g. mid-unpickle)
            raise AttributeError(key)
        return getattr(self.iterable, key)

    def update(self):
        pass


class FixedObj:
    """Marker wrapper produced by ``iterable()`` so ``pool_map`` passes the
    value through instead of repeating it (reference utils_conf.py:408-411)."""

    def __init__(self, v):
        self.v = v


def repeat(*args):
    """``itertools.repeat`` applied to every argument
    (reference utils_conf.py:593-612)."""
    import itertools as itt

    return [itt.repeat(a) for a in args]


def lines_of_code():
    """Print the number of source lines per file and in total
    (reference utils_conf.py:663-692)."""
    cur_path = os.path.dirname(os.path.abspath(__file__))
    path = os.path.dirname(cur_path)
    loclist = []
    for pydir, _, pyfiles in os.walk(path):
        for pyfile in pyfiles:
            if pyfile != "__init__.py" and pyfile.endswith(".py"):
                total = os.path.join(pydir, pyfile)
                with open(total) as fh:
                    loclist.append((len(fh.read().splitlines()),
                                    os.path.relpath(total, path)))
    for count, filename in sorted(loclist):
        print(f"{count:05d} lines in {filename}")
    print(f"\nTotal: {sum(x[0] for x in loclist)} lines in ({path})")
