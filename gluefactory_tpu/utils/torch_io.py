"""Torch-free reader for PyTorch checkpoint files (.pth/.pt/.tar).

The reference loads official weights with ``torch.load``
(gluefactory/models/matchers/lightglue.py:405-430 and the
gluefactory_nonfree extractors). This framework ingests the same checkpoint
files WITHOUT a torch runtime: tensors come out as numpy arrays, ready for
scripts/convert_weights.py.

Two on-disk formats are supported:

  1. Zip format (torch >= 1.6, ``_use_new_zipfile_serialization=True``):
     a zipfile with ``<prefix>/data.pkl`` (pickled object graph whose tensors
     reference storages by persistent id) and raw little-endian storage blobs
     under ``<prefix>/data/<key>``. Official LightGlue releases use this.
  2. Legacy format (torch < 1.6): a raw stream of [magic long, protocol long,
     sys_info dict, main object, storage key list] pickles followed by the
     storages, each serialized as an int64 element count + raw bytes. The
     official MagicLeap ``superpoint_v1.pth`` (2018) uses this format.

Only data is reconstructed — no code from the pickle is ever executed: the
unpickler resolves ``torch.*`` globals to local stubs and refuses everything
else, making this safer than an unrestricted ``torch.load``.
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from collections import OrderedDict
from typing import Any, BinaryIO, Dict

import numpy as np

try:  # bfloat16 support (ml_dtypes ships with jax)
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BFLOAT16 = None

_MAGIC_NUMBER = 0x1950A86A20F9469CFC6C

_STORAGE_DTYPES: Dict[str, Any] = {
    "DoubleStorage": np.float64,
    "FloatStorage": np.float32,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": _BFLOAT16,
    "ComplexFloatStorage": np.complex64,
    "ComplexDoubleStorage": np.complex128,
}


class _StorageType:
    """Stub for ``torch.FloatStorage`` & co. referenced from the pickle."""

    def __init__(self, name: str):
        self.name = name

    @property
    def dtype(self) -> np.dtype:
        if _STORAGE_DTYPES.get(self.name) is None:
            raise ValueError(f"unsupported torch storage type: {self.name}")
        return np.dtype(_STORAGE_DTYPES[self.name])


def _strided_view(storage: np.ndarray, storage_offset, size, stride) -> np.ndarray:
    size = tuple(int(s) for s in size)
    if stride is None:
        flat = storage[int(storage_offset) : int(storage_offset) + int(np.prod(size))]
        return flat.reshape(size)
    itemsize = storage.dtype.itemsize
    view = np.lib.stride_tricks.as_strided(
        storage[int(storage_offset) :],
        shape=size,
        strides=tuple(int(s) * itemsize for s in stride),
    )
    return np.ascontiguousarray(view)


def _rebuild_parameter(data, requires_grad=True, backward_hooks=None):
    return data


def _rebuild_from_type_v2(func, new_type, args, state):
    return func(*args)


class _Unpickler(pickle.Unpickler):
    """Data-only unpickler: torch globals become stubs, others are refused.

    ``rebuild_tensor`` is pluggable because the legacy format pickles tensors
    BEFORE their storage bytes appear in the stream (rebuilds must defer)."""

    def __init__(self, file, storage_loader, rebuild_tensor):
        super().__init__(file, encoding="latin1")
        self._load_storage = storage_loader
        self._globals = {
            ("collections", "OrderedDict"): OrderedDict,
            ("torch._utils", "_rebuild_tensor"): rebuild_tensor,
            ("torch._utils", "_rebuild_tensor_v2"): lambda s, o, sz, st, *rest: rebuild_tensor(s, o, sz, st),
            ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
            ("torch._tensor", "_rebuild_from_type_v2"): _rebuild_from_type_v2,
            ("torch.serialization", "_get_layout"): lambda name: None,
            ("torch", "device"): lambda *a: None,
            ("torch", "Size"): tuple,
        }

    def find_class(self, module, name):
        if (module, name) in self._globals:
            return self._globals[(module, name)]
        if module.startswith("torch") and name.endswith("Storage"):
            return _StorageType(name)
        raise pickle.UnpicklingError(
            f"refusing to load global {module}.{name} from torch checkpoint"
        )

    def persistent_load(self, saved_id):
        if not (isinstance(saved_id, tuple) and saved_id and saved_id[0] == "storage"):
            raise pickle.UnpicklingError(f"unexpected persistent id: {saved_id!r}")
        return self._load_storage(saved_id)


def _load_zip(f: BinaryIO):
    zf = zipfile.ZipFile(f)
    names = zf.namelist()
    pkl_name = next(n for n in names if n.endswith("data.pkl"))
    prefix = pkl_name[: -len("data.pkl")]
    byteorder = "little"
    if prefix + "byteorder" in names:
        byteorder = zf.read(prefix + "byteorder").decode().strip() or "little"

    cache: Dict[str, np.ndarray] = {}

    def load_storage(saved_id):
        _, storage_type, key, _location, numel = saved_id
        if key not in cache:
            raw = zf.read(f"{prefix}data/{key}")
            arr = np.frombuffer(raw, dtype=storage_type.dtype, count=int(numel)).copy()
            if byteorder != "little":  # pragma: no cover
                arr = arr.byteswap()
            cache[key] = arr
        return cache[key]

    with zf.open(pkl_name) as pf:
        return _Unpickler(io.BytesIO(pf.read()), load_storage, _strided_view).load()


class _Lazy:
    """Placeholder for an array whose bytes appear later in the stream."""

    __slots__ = ("array",)

    def __init__(self):
        self.array: np.ndarray | None = None


def _load_legacy(f: BinaryIO):
    magic = pickle.load(f)
    if magic != _MAGIC_NUMBER:
        raise ValueError("unrecognized torch checkpoint format (bad magic)")
    _protocol = pickle.load(f)
    _sys_info = pickle.load(f)

    storages: Dict[str, dict] = {}
    pending_views = []
    deferred_tensors = []

    def load_storage(saved_id):
        # legacy ids carry 6 fields: the extra one is view metadata
        _, storage_type, root_key, _location, numel, view_metadata = saved_id
        if root_key not in storages:
            storages[root_key] = {"dtype": storage_type.dtype, "lazy": _Lazy()}
        root = storages[root_key]["lazy"]
        if view_metadata is None:
            return root
        _view_key, offset, view_size = view_metadata
        lazy = _Lazy()
        pending_views.append((lazy, root, int(offset), int(view_size)))
        return lazy

    def rebuild_deferred(storage, storage_offset, size, stride):
        holder = _Lazy()
        deferred_tensors.append((holder, storage, storage_offset, size, stride))
        return holder

    result = _Unpickler(f, load_storage, rebuild_deferred).load()

    keys = pickle.load(f)
    for key in keys:
        info = storages[key]
        (numel,) = struct.unpack("<q", f.read(8))
        raw = f.read(numel * np.dtype(info["dtype"]).itemsize)
        info["lazy"].array = np.frombuffer(raw, dtype=info["dtype"], count=numel).copy()
    for lazy, root, offset, view_size in pending_views:
        lazy.array = root.array[offset : offset + view_size]
    for holder, storage, storage_offset, size, stride in deferred_tensors:
        holder.array = _strided_view(storage.array, storage_offset, size, stride)

    def resolve(obj):
        if isinstance(obj, _Lazy):
            return obj.array
        if isinstance(obj, dict):
            return type(obj)((k, resolve(v)) for k, v in obj.items())
        if isinstance(obj, (list, tuple)):
            return type(obj)(resolve(v) for v in obj)
        return obj

    return resolve(result)


def load(path_or_file) -> Any:
    """Load a torch checkpoint into numpy. Returns whatever object was saved
    (typically an OrderedDict[str, np.ndarray] state dict)."""
    if hasattr(path_or_file, "read"):
        data = path_or_file.read()
    else:
        with open(path_or_file, "rb") as fh:
            data = fh.read()
    f = io.BytesIO(data)
    if zipfile.is_zipfile(f):
        f.seek(0)
        return _load_zip(f)
    f.seek(0)
    return _load_legacy(f)


def load_state_dict(path_or_file) -> Dict[str, np.ndarray]:
    """Load a checkpoint and return a flat str->array state dict, unwrapping
    the common {'model': ...} / {'state_dict': ...} nesting."""
    obj = load(path_or_file)
    if isinstance(obj, dict):
        for key in ("model", "state_dict"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    if not isinstance(obj, dict):
        raise ValueError(f"checkpoint did not contain a state dict (got {type(obj)})")
    return {k: np.asarray(v) for k, v in obj.items() if isinstance(v, np.ndarray)}


__all__ = ["load", "load_state_dict"]
