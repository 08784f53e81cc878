"""AOT model export: serialize the jitted inference graph to StableHLO.

The reference has no deployment story beyond "clone the repo + load the
.pth" — serving a refiner means shipping the full python stack.  The
TPU-native equivalent is `jax.export`: the fully-jitted inference function
(on-device render + encoder + recurrence + pose update) is lowered once,
weights baked in as constants, and serialized as a version-pinned StableHLO
artifact that any JAX runtime of the same or newer minor version can load
and call WITHOUT the model code, the config system, or the checkpoint
format.  One file = one deployable model.

Artifact layout (a single file, little-endian):

    magic b"SCFLOWX1" | u64 meta_len | meta json (utf-8) | exported blob

The json carries the batch-entry spec (key -> shape/dtype), output keys,
lowering platforms, and provenance (config name, iters, image size) so a
server can validate requests without deserializing the graph.

Use `tools/export_model.py` to produce artifacts from a config +
checkpoint; `load_exported(path)` (below) to serve one.
"""

import json
import struct
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import numpy as np

_MAGIC = b"SCFLOWX1"


def batch_spec(
    batch_size: int,
    image_size: Tuple[int, int] = (256, 256),
    dtype=np.float32,
) -> Dict[str, Any]:
    """The abstract batch consumed by every refiner infer fn
    (refiners/system.py make_scflow_infer_fn / make_raft_infer_fn)."""
    import jax

    h, w = image_size
    b = batch_size
    return {
        "real_images": jax.ShapeDtypeStruct((b, h, w, 3), dtype),
        "ref_rotations": jax.ShapeDtypeStruct((b, 3, 3), np.float32),
        "ref_translations": jax.ShapeDtypeStruct((b, 3), np.float32),
        "k": jax.ShapeDtypeStruct((b, 3, 3), np.float32),
        "labels": jax.ShapeDtypeStruct((b,), np.int32),
    }


def export_infer(
    infer_fn: Callable,
    variables,
    spec: Dict[str, Any],
    platforms: Optional[Sequence[str]] = None,
    meta: Optional[Dict[str, Any]] = None,
) -> bytes:
    """Bake `variables` into `infer_fn(variables, batch)` as constants and
    serialize the closed graph for `platforms` (default: the current
    backend only).  Returns the artifact bytes."""
    import jax
    from jax import export as jexport

    closed = jax.jit(lambda batch: infer_fn(variables, batch))
    if not platforms:  # None or [] -> current backend
        platforms = (jax.default_backend(),)
    exported = jexport.export(closed, platforms=tuple(platforms))(spec)
    blob = bytes(exported.serialize())

    def describe(s):
        return {"shape": list(s.shape), "dtype": np.dtype(s.dtype).name}

    # caller meta first so the reserved self-description keys always win —
    # servers validate requests against these and must trust them
    header = dict(meta or {})
    header.update(
        {
            "format": 1,
            "platforms": list(platforms),
            "inputs": {k: describe(v) for k, v in spec.items()},
            "outputs": sorted(jax.eval_shape(closed, spec).keys()),
        }
    )
    payload = json.dumps(header).encode()
    return _MAGIC + struct.pack("<Q", len(payload)) + payload + blob


def read_meta(data: bytes) -> Dict[str, Any]:
    """Parse just the json header (cheap; no graph deserialization)."""
    if data[: len(_MAGIC)] != _MAGIC:
        raise ValueError("not a scflow_tpu export artifact (bad magic)")
    if len(data) < len(_MAGIC) + 8:
        raise ValueError(
            "truncated scflow_tpu export artifact: "
            f"{len(data)} bytes, header needs {len(_MAGIC) + 8}"
        )
    (n,) = struct.unpack_from("<Q", data, len(_MAGIC))
    off = len(_MAGIC) + 8
    if off + n > len(data):
        raise ValueError(
            "truncated/corrupt scflow_tpu export artifact: meta length "
            f"{n} exceeds file ({len(data)} bytes)"
        )
    try:
        return json.loads(data[off : off + n].decode())
    except (UnicodeDecodeError, json.JSONDecodeError) as e:
        raise ValueError(f"corrupt scflow_tpu export artifact meta: {e}") from e


def load_exported(path_or_bytes) -> Tuple[Callable, Dict[str, Any]]:
    """Load an artifact; returns (call, meta).  `call(batch)` runs the
    baked-weights inference graph under jit on the current backend (which
    must be one of meta['platforms'])."""
    import jax
    from jax import export as jexport

    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    meta = read_meta(data)
    backend = jax.default_backend()
    platforms = meta.get("platforms") or []
    if platforms and backend not in platforms:
        raise ValueError(
            f"artifact was exported for platforms {platforms}; current "
            f"backend is '{backend}' — re-export with --platforms {backend}"
        )
    (n,) = struct.unpack_from("<Q", data, len(_MAGIC))
    blob = data[len(_MAGIC) + 8 + n :]
    exported = jexport.deserialize(bytearray(blob))
    return jax.jit(exported.call), meta
