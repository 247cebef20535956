"""Torch-free reader/writer for PyTorch `.pth` / `.pth.gzip` checkpoints.

The reference saves gzip-wrapped torch pickles (utils/utils.py:110-123) and
loads the released `se50.pth` / `FFRNet.pth` weights via torch.load
(pretrain/model_ir_se50.py:152, models/trainer.py:210). This module reads
both on-disk formats with no torch dependency:

  * the zipfile format (torch >= 1.6 default): `<name>/data.pkl` plus one
    raw little-endian buffer per storage under `<name>/data/<key>`;
  * the legacy format (magic 0x1950a86a20f9469cfc6c): sequential pickles
    (magic, protocol, sys_info, object, storage-key list) followed by
    `int64 numel` + raw bytes per storage.

Tensors come back as numpy arrays in an ordinary nested dict. Writing uses
torch when importable (for bit-faithful interop), else a built-in minimal
zipfile-format pickler that torch.load can read back.
"""

from __future__ import annotations

import gzip
import io
import pickle
import struct
import zipfile
from typing import Any, BinaryIO, Dict

import numpy as np

_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C
_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}
try:  # bfloat16 via ml_dtypes when present (ships with jax)
    import ml_dtypes

    _DTYPES["BFloat16Storage"] = ml_dtypes.bfloat16
except ImportError:  # pragma: no cover
    pass

# dtype -> torch storage class name, for the writer (built once, not per
# tensor)
_DTYPES_REV = {np.dtype(v): k for k, v in _DTYPES.items()}


class _Storage:
    """Placeholder for a torch storage: raw buffer + element dtype."""

    __slots__ = ("dtype", "data")

    def __init__(self, dtype, data=None):
        self.dtype = dtype
        self.data = data


class _StorageType:
    """Stub for torch.FloatStorage etc. encountered in pickles."""

    def __init__(self, name):
        self.name = name


class _LazyTensor:
    """Tensor whose storage bytes arrive after the pickle (legacy format)."""

    def __init__(self, storage, offset, size, stride):
        self.storage, self.offset, self.size, self.stride = storage, offset, size, stride

    def materialize(self):
        return _rebuild_tensor_v2(self.storage, self.offset, self.size, self.stride)


def _rebuild_tensor_v2(storage, storage_offset, size, stride, requires_grad=False,
                       backward_hooks=None, metadata=None):
    if storage.data is None:
        return _LazyTensor(storage, storage_offset, size, stride)
    dtype = np.dtype(storage.dtype)
    if not size:
        flat = np.frombuffer(storage.data, dtype=dtype,
                             count=1, offset=storage_offset * dtype.itemsize)
        return flat.reshape(()).copy()
    arr = np.frombuffer(storage.data, dtype=dtype,
                        offset=storage_offset * dtype.itemsize)
    byte_strides = tuple(s * dtype.itemsize for s in stride)
    return np.lib.stride_tricks.as_strided(arr, shape=tuple(size),
                                           strides=byte_strides).copy()


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


class _OrderedDictStub(dict):
    pass


class _TorchUnpickler(pickle.Unpickler):
    """Resolves torch globals to local stubs; storages via persistent_load."""

    def __init__(self, f, load_storage):
        super().__init__(f, encoding="latin1")
        self._load_storage = load_storage

    def find_class(self, module, name):
        if name in _DTYPES or name.endswith("Storage"):
            return _StorageType(name)
        if name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if name == "_rebuild_tensor":
            return lambda storage, offset, size, stride: _rebuild_tensor_v2(
                storage, offset, size, stride)
        if name == "_rebuild_parameter":
            return _rebuild_parameter
        if (module, name) == ("collections", "OrderedDict"):
            return _OrderedDictStub
        if module.startswith("torch"):
            if name.startswith("_rebuild"):
                # an unsupported tensor-reconstruction path (sparse /
                # quantized / _rebuild_parameter_with_state ...): a silent
                # None here would surface far away as an opaque
                # AttributeError in the tree converters (round-5 review)
                def _unsupported(*a, _name=f"{module}.{name}", **k):
                    raise ValueError(
                        f"unsupported torch checkpoint feature: {_name} "
                        "(sparse/quantized/stateful tensors are not "
                        "supported by this torch-free reader)")
                return _unsupported
            # Any other torch object (device, dtype, size...) -> inert stub.
            return lambda *a, **k: None
        return super().find_class(module, name)

    def persistent_load(self, pid):
        assert pid[0] == "storage", f"unknown persistent id {pid!r}"
        _, storage_type, key, _location, *rest = pid
        numel = rest[0] if rest else None
        name = storage_type.name if isinstance(storage_type, _StorageType) else str(storage_type)
        if name not in _DTYPES:
            raise ValueError(f"unsupported torch storage type {name}")
        return self._load_storage(str(key), _DTYPES[name], numel)


def _read_zip(f: BinaryIO) -> Any:
    with zipfile.ZipFile(f) as zf:
        pkl_name = next(n for n in zf.namelist() if n.endswith("/data.pkl"))
        prefix = pkl_name[: -len("data.pkl")]
        cache: Dict[str, bytes] = {}

        def load_storage(key, dtype, numel):
            if key not in cache:
                cache[key] = zf.read(f"{prefix}data/{key}")
            return _Storage(dtype, cache[key])

        return _TorchUnpickler(io.BytesIO(zf.read(pkl_name)), load_storage).load()


def _read_legacy(f: BinaryIO) -> Any:
    magic = pickle.load(f)
    if magic != _LEGACY_MAGIC:
        raise ValueError("not a legacy torch file")
    pickle.load(f)  # protocol version
    pickle.load(f)  # sys info

    storages: Dict[str, _Storage] = {}

    def load_storage(key, dtype, numel):
        st = storages.setdefault(key, _Storage(dtype))
        st.dtype = dtype
        return st

    result = _TorchUnpickler(f, load_storage).load()
    keys = pickle.load(f)
    for key in keys:
        (numel,) = struct.unpack("<q", f.read(8))
        st = storages[str(key)]
        st.data = f.read(numel * np.dtype(st.dtype).itemsize)
    return result


def _rebuild_seq(obj, mapped):
    """Rebuild a list/tuple/namedtuple from mapped elements."""
    if isinstance(obj, tuple) and hasattr(obj, "_fields"):  # namedtuple
        return type(obj)(*mapped)
    return type(obj)(mapped)


def _plain(obj):
    """Convert OrderedDict stubs to dicts; materialize lazy tensors."""
    if isinstance(obj, _LazyTensor):
        return obj.materialize()
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return _rebuild_seq(obj, [_plain(v) for v in obj])
    return obj


def load_pth(path: str) -> Any:
    """Load a .pth / .pth.gzip checkpoint into numpy arrays (no torch)."""
    opener = gzip.open if str(path).endswith(".gzip") else open
    with opener(path, "rb") as f:
        data = f.read()
    buf = io.BytesIO(data)
    if zipfile.is_zipfile(buf):
        buf.seek(0)
        return _plain(_read_zip(buf))
    buf.seek(0)
    return _plain(_read_legacy(buf))


# ---------------------------------------------------------------------------
# Writing
# ---------------------------------------------------------------------------


class _TorchGlobal:
    """Sentinel pickled as a `GLOBAL module.name` reference (no import)."""

    def __init__(self, module: str, name: str):
        self.module, self.name = module, name

    def __call__(self, *a, **k):  # save_reduce requires a callable func
        raise RuntimeError("sentinel, never invoked")


class _TensorOut:
    """ndarray wrapper destined for one storage entry in the archive."""

    def __init__(self, arr: np.ndarray, key: str):
        self.arr = np.ascontiguousarray(arr)
        self.key = key


def _contiguous_strides(shape):
    strides, acc = [], 1
    for s in reversed(shape):
        strides.append(acc)
        acc *= s
    return tuple(reversed(strides))


class _Pid:
    """Object whose pickling is a pure persistent id."""

    def __init__(self, pid):
        self.pid = pid


class _Writer(pickle._Pickler):  # pure-Python pickler: `save` is overridable
    def persistent_id(self, obj):
        if isinstance(obj, _Pid):
            return obj.pid
        return None

    def save(self, obj, save_persistent_id=True):  # type: ignore[override]
        if isinstance(obj, _TorchGlobal):
            self.write(pickle.GLOBAL + f"{obj.module}\n{obj.name}\n".encode())
            return
        if isinstance(obj, _TensorOut):
            storage_name = _DTYPES_REV.get(obj.arr.dtype)
            if storage_name is None:
                raise ValueError(
                    f"cannot write dtype {obj.arr.dtype} (tensor "
                    f"{obj.key!r}): no torch storage equivalent "
                    f"(supported: {sorted(str(d) for d in _DTYPES_REV)})")
            pid = ("storage", _TorchGlobal("torch", storage_name),
                   obj.key, "cpu", int(obj.arr.size))
            self.save_reduce(
                _TorchGlobal("torch._utils", "_rebuild_tensor_v2"),
                (_Pid(pid), 0, tuple(obj.arr.shape),
                 _contiguous_strides(obj.arr.shape), False, {}),
                obj=obj,
            )
            return
        super().save(obj, save_persistent_id)


def _write_zip(obj: Any, f: BinaryIO) -> None:
    """Minimal torch-zipfile writer readable by torch.load."""
    storages: Dict[str, np.ndarray] = {}
    counter = [0]

    def wrap(o):
        if isinstance(o, np.ndarray):
            key = str(counter[0])
            counter[0] += 1
            t = _TensorOut(o, key)
            storages[key] = t.arr
            return t
        if isinstance(o, np.generic):
            return o.item()
        if isinstance(o, dict):
            return {k: wrap(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return _rebuild_seq(o, [wrap(v) for v in o])
        return o

    wrapped = wrap(obj)
    buf = io.BytesIO()
    _Writer(buf, protocol=2).dump(wrapped)

    # Build the zip in memory: the output stream may be non-seekable (gzip).
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/version", "3\n")
        for key, arr in storages.items():
            zf.writestr(f"archive/data/{key}", arr.tobytes())
    f.write(zbuf.getvalue())


def save_pth(obj: Any, path: str, *, use_torch: bool = True) -> None:
    """Save a nested dict of numpy arrays as a torch-loadable .pth(.gzip)."""

    def _to_file(fobj):
        if use_torch:
            try:
                import torch

                def to_torch(o):
                    if isinstance(o, np.ndarray):
                        return torch.from_numpy(np.ascontiguousarray(o))
                    if isinstance(o, dict):
                        return {k: to_torch(v) for k, v in o.items()}
                    if isinstance(o, (list, tuple)):
                        return _rebuild_seq(o, [to_torch(v) for v in o])
                    return o

                # serialize to a buffer first: if torch rejects a dtype
                # (TypeError from torch.from_numpy on ml_dtypes bfloat16,
                # uint32, ...) nothing has hit fobj yet — gzip write
                # streams can't rewind — and the built-in writer below
                # handles those dtypes fine
                tmp = io.BytesIO()
                torch.save(to_torch(obj), tmp)
                fobj.write(tmp.getvalue())
                return
            except (ImportError, TypeError):  # pragma: no cover
                pass
        _write_zip(obj, fobj)

    if str(path).endswith(".gzip"):
        with gzip.GzipFile(str(path), "wb") as f:
            _to_file(f)
    else:
        with open(path, "wb") as f:
            _to_file(f)
