"""S5: torch-free loader for the reference's trained model archive.

The reference ships ``model.tar.gz`` (config.json + vocabulary/ +
weights.th) and loads it with AllenNLP's ``load_archive``
(relex/predictors/predictor_utils.py:8-15). torch/allennlp are not
available in this environment, so this module re-implements just enough
of the two public serialization formats to recover the trained float32
parameters into :class:`ModelWeights`:

* ``weights.th`` is the **legacy torch.save format** (pre-1.6 non-zip):
  four consecutive pickles (magic number 0x1950a86a20f9469cfc6c, protocol
  version 1001, sys_info dict, then the state_dict whose tensors are
  persistent-id references to storages), followed by the storage-key list
  and each storage's raw little-endian buffer prefixed by an int64 element
  count. Tensors rebuild via ``torch._utils._rebuild_tensor_v2(storage,
  offset, size, stride, ...)`` — reproduced here with numpy strided views.
  No torch import, no arbitrary-code unpickling: ``find_class`` whitelists
  the two symbols the format needs and rejects everything else.

* ``vocabulary/`` is AllenNLP's ``Vocabulary.save_to_files`` layout:
  padded namespaces get ``@@PADDING@@`` at index 0 implicitly and the file
  lines at 1..N (``@@UNKNOWN@@`` is the OOV entry, matching this engine's
  PAD_ID=0/OOV_ID=1 convention); non-padded namespaces (labels) index
  from 0.
"""

from __future__ import annotations

import collections
import io
import json
import pickle
import struct
import tarfile

import numpy as np

from relex_spark.scoring.weights import OOV_ID, PAD_ID, ModelWeights

_MAGIC = 0x1950A86A20F9469CFC6C
_PROTOCOL = 1001

_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("?"),
}


class _Storage:
    """Placeholder for a torch storage: bytes arrive after the main pickle."""

    __slots__ = ("dtype", "key", "numel", "array")

    def __init__(self, dtype: np.dtype, key: str, numel: int):
        self.dtype = dtype
        self.key = key
        self.numel = numel
        self.array: np.ndarray | None = None


class _LazyTensor:
    __slots__ = ("storage", "offset", "size", "stride")

    def __init__(self, storage: _Storage, offset: int, size, stride):
        self.storage = storage
        self.offset = offset
        self.size = tuple(size)
        self.stride = tuple(stride)

    def materialize(self) -> np.ndarray:
        base = self.storage.array
        if base is None:
            raise ValueError(f"storage {self.storage.key} has no data")
        item = base.itemsize
        view = np.lib.stride_tricks.as_strided(
            base[self.offset :],
            shape=self.size,
            strides=tuple(s * item for s in self.stride),
        )
        return np.ascontiguousarray(view)


class _StateDictUnpickler(pickle.Unpickler):
    """Whitelisting unpickler: only the symbols a torch state_dict needs."""

    def __init__(self, f, storages: dict[str, _Storage]):
        super().__init__(f)
        self._storages = storages

    def find_class(self, module: str, name: str):
        if (module, name) == ("torch._utils", "_rebuild_tensor_v2"):
            return lambda storage, off, size, stride, *a: _LazyTensor(
                storage, off, size, stride
            )
        if module == "torch" and name in _DTYPES:
            return name
        if (module, name) == ("collections", "OrderedDict"):
            return collections.OrderedDict
        raise pickle.UnpicklingError(f"disallowed global {module}.{name}")

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unexpected persistent id {pid!r}")
        typ, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        if len(pid) > 5 and pid[5]:
            raise pickle.UnpicklingError("storage view metadata not supported")
        dtype = _DTYPES[typ if isinstance(typ, str) else typ.__name__]
        if key not in self._storages:
            self._storages[key] = _Storage(dtype, key, numel)
        return self._storages[key]


def load_legacy_torch_state(f: io.BufferedIOBase) -> dict[str, np.ndarray]:
    """Parse a legacy (non-zip) ``torch.save`` stream → name → ndarray."""
    magic = pickle.load(f)
    if magic != _MAGIC:
        raise ValueError(f"not a legacy torch file (magic {magic:#x})")
    protocol = pickle.load(f)
    if protocol != _PROTOCOL:
        raise ValueError(f"unsupported torch protocol {protocol}")
    pickle.load(f)  # sys_info (endianness + type sizes); little-endian assumed
    state = _StateDictUnpickler(f, storages := {}).load()
    keys = pickle.load(f)
    for key in keys:
        (numel,) = struct.unpack("<q", f.read(8))
        st = storages[key]
        if numel != st.numel:
            raise ValueError(f"storage {key}: {numel} != declared {st.numel}")
        buf = f.read(numel * st.dtype.itemsize)
        st.array = np.frombuffer(buf, dtype=st.dtype)
    return {
        name: t.materialize() for name, t in state.items()
        if isinstance(t, _LazyTensor)
    }


def _read_vocab_lines(raw: bytes) -> list[str]:
    return raw.decode("utf-8").splitlines()


def load_reference_archive(tar_path: str) -> ModelWeights:
    """model.tar.gz → ModelWeights (the trained parameters, our layout).

    Mapping (AllenNLP 0.9 module layout → engine kernel layout):
      text_field_embedder.token_embedder_tokens.weight  → emb (V, d)
      offset_embedder_{head,tail}._embedding.weight     → offset tables
      text_encoder.conv_layer_i.{weight (nf, d_in, k), bias}
          → cnn_filters[k] = (W (k*d_in, nf) with row o*d_in+d, b)
      classifier_feedforward._linear_layers.0.{weight (C, d_enc), bias}
          → ff_w = weight.T, ff_b
    """
    with tarfile.open(tar_path, "r:gz") as tar:

        def read(name: str) -> bytes:
            member = tar.extractfile(name)
            if member is None:
                raise FileNotFoundError(name)
            return member.read()

        config = json.loads(read("config.json"))
        tokens = _read_vocab_lines(read("vocabulary/tokens.txt"))
        labels = _read_vocab_lines(read("vocabulary/labels.txt"))
        state = load_legacy_torch_state(io.BytesIO(read("weights.th")))

    token_to_id = {"<pad>": PAD_ID, "<oov>": OOV_ID}
    for i, tok in enumerate(tokens, start=1):  # padding occupies index 0
        if tok == "@@UNKNOWN@@":
            if i != OOV_ID:
                raise ValueError(f"@@UNKNOWN@@ at index {i}, expected {OOV_ID}")
            continue
        token_to_id[tok] = i

    emb = np.ascontiguousarray(
        state["text_field_embedder.token_embedder_tokens.weight"], dtype=np.float32
    )
    head_off = np.ascontiguousarray(
        state["offset_embedder_head._embedding.weight"], dtype=np.float32
    )
    tail_off = np.ascontiguousarray(
        state["offset_embedder_tail._embedding.weight"], dtype=np.float32
    )

    cnn_filters: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    i = 0
    while f"text_encoder.conv_layer_{i}.weight" in state:
        conv_w = state[f"text_encoder.conv_layer_{i}.weight"]  # (nf, d_in, k)
        conv_b = state[f"text_encoder.conv_layer_{i}.bias"]
        nf, d_in, k = conv_w.shape
        w = np.ascontiguousarray(
            conv_w.transpose(2, 1, 0).reshape(k * d_in, nf), dtype=np.float32
        )
        cnn_filters[k] = (w, np.ascontiguousarray(conv_b, dtype=np.float32))
        i += 1
    if not cnn_filters:
        raise ValueError("no text_encoder.conv_layer_* parameters found")

    ff_w = np.ascontiguousarray(
        state["classifier_feedforward._linear_layers.0.weight"].T, dtype=np.float32
    )
    ff_b = np.ascontiguousarray(
        state["classifier_feedforward._linear_layers.0.bias"], dtype=np.float32
    )

    model_cfg = config["model"]
    n_position = int(model_cfg["offset_embedder_head"]["n_position"])
    max_len = int(config["dataset_reader"].get("max_len", n_position))
    lowercase = bool(
        config["dataset_reader"]["token_indexers"]["tokens"].get(
            "lowercase_tokens", False
        )
    )
    offset_type = model_cfg["offset_embedder_head"]["type"]

    return ModelWeights(
        token_to_id=token_to_id,
        labels=labels,
        emb=emb,
        head_offset_emb=head_off,
        tail_offset_emb=tail_off,
        cnn_filters=cnn_filters,
        ff_w=ff_w,
        ff_b=ff_b,
        n_position=n_position,
        max_len=max_len,
        lowercase=lowercase,
        offset_type=offset_type,
    )
