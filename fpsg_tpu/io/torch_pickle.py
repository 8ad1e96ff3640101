"""Read PyTorch checkpoints without a torch dependency.

The reference ships two pretrained point-cloud-encoder checkpoints that the
trainer loads directly (``src/trainNetwork.py:57-60``): a modern zip-pickle
(``pretrained_pcencoder_pointnet.pt``) and a legacy (pre-1.6, non-zip)
serialization (``pretrained_pcencoder_dgcnn.pt``). This module parses both
formats with the stdlib only:

- **zip format**: a zip archive holding ``<name>/data.pkl`` (a pickle whose
  tensors are persistent-id references) plus one raw little-endian buffer
  per storage under ``<name>/data/<key>``.
- **legacy format**: magic-number pickle, protocol pickle, sys-info pickle,
  the object pickle (with persistent ids), a pickled list of storage keys,
  then each storage as ``int64 numel`` + raw bytes, in key order.

Tensors are materialized as numpy arrays (strided views honored via
``as_strided`` + copy). Only data needed for state dicts is supported;
exotic pickled objects raise.
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from collections import OrderedDict
from dataclasses import dataclass
from typing import Any, Dict

import numpy as np

_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("bool"),
}


@dataclass
class _StorageType:
    name: str

    @property
    def dtype(self) -> np.dtype:
        try:
            return _DTYPES[self.name]
        except KeyError:
            if self.name == "BFloat16Storage":
                import ml_dtypes

                return np.dtype(ml_dtypes.bfloat16)
            raise NotImplementedError(f"storage type {self.name}")


@dataclass
class _LazyStorage:
    dtype: np.dtype
    key: str
    numel: int
    data: np.ndarray = None  # filled by the loader


@dataclass
class _LazyTensor:
    """Tensor placeholder; materialized once storage bytes are read."""

    storage: _LazyStorage
    storage_offset: int
    size: tuple
    stride: tuple

    def materialize(self) -> np.ndarray:
        flat = self.storage.data
        itemsize = flat.dtype.itemsize
        if not self.size:
            return flat[self.storage_offset].copy()
        arr = np.lib.stride_tricks.as_strided(
            flat[self.storage_offset:],
            shape=tuple(self.size),
            strides=tuple(s * itemsize for s in self.stride),
        )
        return np.ascontiguousarray(arr)


def _rebuild_tensor_v2(
    storage: _LazyStorage,
    storage_offset: int,
    size,
    stride,
    requires_grad=False,
    backward_hooks=None,
    metadata=None,
) -> _LazyTensor:
    return _LazyTensor(storage, storage_offset, tuple(size), tuple(stride))


def _materialize(obj):
    if isinstance(obj, _LazyTensor):
        return obj.materialize()
    if isinstance(obj, OrderedDict):
        return OrderedDict((k, _materialize(v)) for k, v in obj.items())
    if isinstance(obj, dict):
        return {k: _materialize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_materialize(v) for v in obj)
    return obj


class _Stub:
    """Callable stand-in for torch classes irrelevant to state dicts."""

    def __init__(self, module, name):
        self.module, self.name = module, name

    def __call__(self, *a, **k):
        raise NotImplementedError(
            f"unsupported torch object in checkpoint: {self.module}.{self.name}"
        )


class _Unpickler(pickle.Unpickler):
    def __init__(self, f, storage_hook):
        super().__init__(f, encoding="latin1")
        self._storage_hook = storage_hook

    def find_class(self, module, name):
        # Restricted global table: ONLY the names a torch state-dict pickle
        # can legitimately reference. Anything else — in particular any
        # non-torch callable that could execute code on load — is refused,
        # so loading an untrusted .pt cannot run arbitrary code.
        if name == "_rebuild_tensor_v2" and module.startswith("torch"):
            return _rebuild_tensor_v2
        if module == "torch" and name.endswith("Storage"):
            return _StorageType(name)
        if (module, name) == ("collections", "OrderedDict"):
            return OrderedDict
        if name == "_rebuild_parameter" and module.startswith("torch"):
            return lambda data, requires_grad, hooks: data
        if module.startswith("torch"):
            return _Stub(module, name)
        raise pickle.UnpicklingError(
            f"global forbidden by restricted torch reader: {module}.{name}"
        )

    def persistent_load(self, saved_id):
        assert saved_id[0] == "storage", saved_id
        return self._storage_hook(saved_id)


def _load_zip(path: str) -> Any:
    with zipfile.ZipFile(path) as zf:
        pkl_name = next(n for n in zf.namelist() if n.endswith("/data.pkl"))
        prefix = pkl_name[: -len("data.pkl")]
        storages: Dict[str, _LazyStorage] = {}

        def hook(saved_id):
            _, storage_type, key, _location, numel = saved_id
            if key not in storages:
                storages[key] = _LazyStorage(storage_type.dtype, key, numel)
            return storages[key]

        with zf.open(pkl_name) as f:
            obj = _Unpickler(io.BytesIO(f.read()), hook).load()
        for key, st in storages.items():
            raw = zf.read(f"{prefix}data/{key}")
            st.data = np.frombuffer(raw, dtype=st.dtype)
    return _materialize(obj)


_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C


class _PreambleUnpickler(pickle.Unpickler):
    """For the legacy magic/protocol/sys-info pickles: pure literals only."""

    def find_class(self, module, name):
        raise pickle.UnpicklingError(
            f"global forbidden in torch file preamble: {module}.{name}"
        )

    def persistent_load(self, saved_id):
        raise pickle.UnpicklingError("persistent id forbidden in preamble")


def _load_preamble(f):
    return _PreambleUnpickler(f, encoding="latin1").load()


def _load_legacy(path: str) -> Any:
    with open(path, "rb") as f:
        magic = _load_preamble(f)
        if magic != _LEGACY_MAGIC:
            raise ValueError(f"not a legacy torch file: magic={magic!r}")
        _protocol = _load_preamble(f)
        _sys_info = _load_preamble(f)

        storages: Dict[str, _LazyStorage] = {}

        def hook(saved_id):
            _, storage_type, root_key, _location, numel, _view_meta = (
                list(saved_id) + [None]
            )[:6]
            if root_key not in storages:
                storages[root_key] = _LazyStorage(
                    storage_type.dtype, root_key, numel
                )
            return storages[root_key]

        obj = _Unpickler(f, hook).load()
        keys = _load_preamble(f)  # plain list of storage-key strings
        for key in keys:
            st = storages[key]
            (numel,) = struct.unpack("<q", f.read(8))
            st.data = np.frombuffer(
                f.read(numel * st.dtype.itemsize), dtype=st.dtype
            )
    return _materialize(obj)


def is_torch_file(path: str) -> bool:
    """True for either torch serialization format (zip or legacy)."""
    if zipfile.is_zipfile(path):
        return True
    try:
        with open(path, "rb") as f:
            return _load_preamble(f) == _LEGACY_MAGIC
    except Exception:
        return False


def load_torch_checkpoint(path: str) -> Any:
    """Load a torch ``.pt``/``.pth`` file into plain python/numpy objects."""
    if zipfile.is_zipfile(path):
        return _load_zip(path)
    return _load_legacy(path)
