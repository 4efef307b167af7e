"""OME-Zarr (NGFF 0.4 / 0.5) HCS plates and positions on tensorstore.

Data layout is always ``plate.zarr/<row>/<col>/<fov>`` positions holding 5D
(T, C, Z, Y, X) arrays (reference: SURVEY.md L1; biahub/deskew.py:604-645).
OME-Zarr 0.4 stores are zarr v2; OME-Zarr 0.5 stores are zarr v3.

tensorstore performs chunk encode/decode and file I/O on native threads, so
reads/writes overlap Python-side orchestration and TPU compute for free.
"""

from __future__ import annotations

import json
import math
import shutil
from dataclasses import dataclass, field
from pathlib import Path
from typing import Iterator, Literal, Sequence

import numpy as np
import tensorstore as ts

__all__ = [
    "TransformationMeta",
    "ImageArray",
    "Position",
    "Plate",
    "open_ome_zarr",
    "create_empty_plate",
]

AXES_5D = [
    {"name": "t", "type": "time"},
    {"name": "c", "type": "channel"},
    {"name": "z", "type": "space", "unit": "micrometer"},
    {"name": "y", "type": "space", "unit": "micrometer"},
    {"name": "x", "type": "space", "unit": "micrometer"},
]

# Default cap on a single zarr chunk, in bytes. One chunk per (t, c) ZYX
# volume is ideal for the batch runner's unit of work, but huge volumes are
# split along Z to keep chunk reads streamable.
MAX_CHUNK_BYTES = 128 * 2**20


@dataclass
class TransformationMeta:
    """Coordinate transformation metadata (scale/translation) for a dataset level."""

    type: Literal["scale", "translation", "identity"]
    scale: Sequence[float] | None = None
    translation: Sequence[float] | None = None

    def to_ngff(self) -> dict:
        out: dict = {"type": self.type}
        if self.type == "scale":
            out["scale"] = [float(s) for s in (self.scale or [])]
        elif self.type == "translation":
            out["translation"] = [float(t) for t in (self.translation or [])]
        return out


def _dtype_to_zarr2(dtype: np.dtype) -> str:
    dtype = np.dtype(dtype)
    return dtype.newbyteorder("<").str


def _default_chunks(shape: Sequence[int], dtype: np.dtype) -> list[int]:
    """One chunk per (t, c) ZYX volume, split along Z if above MAX_CHUNK_BYTES."""
    shape = list(shape)
    itemsize = np.dtype(dtype).itemsize
    if len(shape) == 5:
        t, c, z, y, x = shape
        zc = z
        while zc > 1 and zc * y * x * itemsize > MAX_CHUNK_BYTES:
            zc = math.ceil(zc / 2)
        return [1, 1, zc, y, x]
    # Fallback for non-5D arrays: chunk the leading axes to 1
    lead = [1] * max(0, len(shape) - 3)
    return lead + shape[len(lead) :]


def _read_json(path: Path) -> dict:
    with open(path) as f:
        return json.load(f)


def _write_json(path: Path, payload: dict) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)


class _Group:
    """A zarr v2 or v3 group directory with JSON attributes."""

    def __init__(self, path: Path, version: str):
        self.path = Path(path)
        self.version = version  # OME-Zarr version: "0.4" (zarr v2) or "0.5" (zarr v3)

    # Context-manager parity with iohub: handles are stateless (tensorstore
    # opens arrays on demand), so close() is a no-op, but callers can scope
    # plate AND position handles uniformly.
    def close(self) -> None:
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    @property
    def _is_v3(self) -> bool:
        return self.version == "0.5"

    def ensure_group(self) -> None:
        if self._is_v3:
            meta = self.path / "zarr.json"
            if not meta.exists():
                _write_json(
                    meta,
                    {"zarr_format": 3, "node_type": "group", "attributes": {}},
                )
        else:
            meta = self.path / ".zgroup"
            if not meta.exists():
                _write_json(meta, {"zarr_format": 2})

    @property
    def zattrs(self) -> dict:
        if self._is_v3:
            meta = self.path / "zarr.json"
            if meta.exists():
                attrs = _read_json(meta).get("attributes", {})
                # OME-Zarr 0.5 nests NGFF metadata under the "ome" key; expose
                # it flattened so callers are version-agnostic.
                if "ome" in attrs:
                    flat = dict(attrs)
                    ome = flat.pop("ome")
                    flat.update(ome)
                    return flat
                return attrs
            return {}
        meta = self.path / ".zattrs"
        return _read_json(meta) if meta.exists() else {}

    def update_zattrs(self, updates: dict) -> None:
        if self._is_v3:
            meta = self.path / "zarr.json"
            payload = (
                _read_json(meta)
                if meta.exists()
                else {"zarr_format": 3, "node_type": "group", "attributes": {}}
            )
            attrs = payload.setdefault("attributes", {})
            ngff_keys = {"multiscales", "omero", "plate", "well"}
            for k, v in updates.items():
                if k in ngff_keys:
                    ome = attrs.setdefault("ome", {"version": "0.5"})
                    ome[k] = v
                else:
                    attrs[k] = v
            _write_json(meta, payload)
        else:
            meta = self.path / ".zattrs"
            payload = _read_json(meta) if meta.exists() else {}
            payload.update(updates)
            _write_json(meta, payload)


class ImageArray:
    """A single multiscale level: a 5D (T, C, Z, Y, X) zarr array.

    Thin numpy-like facade over a tensorstore handle. Slicing reads return
    numpy arrays; slice assignment writes through synchronously.
    """

    def __init__(self, store: ts.TensorStore):
        self._store = store

    @property
    def shape(self) -> tuple[int, ...]:
        return tuple(self._store.shape)

    @property
    def dtype(self) -> np.dtype:
        return np.dtype(self._store.dtype.numpy_dtype)

    @property
    def chunks(self) -> tuple[int, ...]:
        return tuple(self._store.chunk_layout.read_chunk.shape)

    def __getitem__(self, key) -> np.ndarray:
        return np.asarray(self._store[key].read().result())

    def __setitem__(self, key, value) -> None:
        value = np.asarray(value, dtype=self.dtype)
        self._store[key].write(value).result()

    def write_async(self, key, value):
        """Start a write and return the tensorstore future (for I/O overlap)."""
        value = np.asarray(value, dtype=self.dtype)
        return self._store[key].write(value)

    def read_async(self, key):
        """Start a read and return the tensorstore future."""
        return self._store[key].read()

    def __array__(self, dtype=None):
        out = self[...]
        return out.astype(dtype) if dtype is not None else out


def _open_array(path: Path, version: str, create_spec: dict | None = None) -> ImageArray:
    driver = "zarr3" if version == "0.5" else "zarr"
    spec: dict = {
        "driver": driver,
        "kvstore": {"driver": "file", "path": str(path)},
    }
    if create_spec is not None:
        spec["metadata"] = create_spec
        store = ts.open(spec, create=True, open=True).result()
    else:
        store = ts.open(spec, open=True).result()
    return ImageArray(store)


def _array_metadata(
    shape: Sequence[int],
    dtype: np.dtype,
    chunks: Sequence[int] | None,
    version: str,
    shards_ratio: Sequence[int] | None = None,
) -> dict:
    chunks = list(chunks) if chunks is not None else _default_chunks(shape, dtype)
    if version == "0.5":
        codecs: list = []
        if shards_ratio is not None:
            # Shards bundle shards_ratio x chunks into one object; the inner
            # chunk grid stays the write unit (reference: sharded zarr-v3
            # writes via zarrs, tests/conftest.py:10-27).
            shard_shape = [c * r for c, r in zip(chunks, shards_ratio)]
            shard_shape = [min(s, dim) for s, dim in zip(shard_shape, shape)]
            meta = {
                "shape": list(shape),
                "data_type": np.dtype(dtype).name,
                "chunk_grid": {
                    "name": "regular",
                    "configuration": {"chunk_shape": shard_shape},
                },
                "codecs": [
                    {
                        "name": "sharding_indexed",
                        "configuration": {
                            "chunk_shape": chunks,
                            "codecs": [
                                {"name": "bytes", "configuration": {"endian": "little"}},
                                {"name": "zstd", "configuration": {"level": 1}},
                            ],
                            "index_codecs": [
                                {"name": "bytes", "configuration": {"endian": "little"}},
                                {"name": "crc32c"},
                            ],
                        },
                    }
                ],
            }
            return meta
        codecs = [
            {"name": "bytes", "configuration": {"endian": "little"}},
            {"name": "zstd", "configuration": {"level": 1}},
        ]
        return {
            "shape": list(shape),
            "data_type": np.dtype(dtype).name,
            "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": chunks}},
            "codecs": codecs,
        }
    return {
        "shape": list(shape),
        "chunks": chunks,
        "dtype": _dtype_to_zarr2(dtype),
        "compressor": {"id": "blosc", "cname": "zstd", "clevel": 1, "shuffle": 1},
        "fill_value": 0,
    }


class Position(_Group):
    """One field of view: a group holding multiscale image arrays ("0", "1", ...)."""

    def __init__(self, path: Path, version: str = "0.4"):
        super().__init__(path, version)
        self._arrays: dict[str, ImageArray] = {}

    # -- metadata ----------------------------------------------------------

    @property
    def channel_names(self) -> list[str]:
        omero = self.zattrs.get("omero", {})
        return [ch.get("label", str(i)) for i, ch in enumerate(omero.get("channels", []))]

    @property
    def scale(self) -> list[float]:
        """Voxel size for the highest-resolution level, as a 5-element list."""
        ms = self.zattrs.get("multiscales", [])
        if ms:
            for tf in ms[0]["datasets"][0].get("coordinateTransformations", []):
                if tf.get("type") == "scale":
                    return [float(s) for s in tf["scale"]]
        return [1.0] * 5

    def set_scale(self, scale: Sequence[float]) -> None:
        attrs = self.zattrs
        ms = attrs.get("multiscales")
        if ms:
            ms[0]["datasets"][0]["coordinateTransformations"] = [
                {"type": "scale", "scale": [float(s) for s in scale]}
            ]
            self.update_zattrs({"multiscales": ms})

    def _init_metadata(
        self,
        channel_names: Sequence[str],
        datasets: list[dict] | None = None,
    ) -> None:
        self.ensure_group()
        ms_version = self.version
        multiscales = [
            {
                "axes": AXES_5D,
                "datasets": datasets
                or [
                    {
                        "path": "0",
                        "coordinateTransformations": [
                            {"type": "scale", "scale": [1.0] * 5}
                        ],
                    }
                ],
                "name": "",
                **({"version": ms_version} if ms_version == "0.4" else {}),
            }
        ]
        omero = {
            "channels": [{"label": str(n), "active": True} for n in channel_names],
            "id": 1,
            **({"version": ms_version} if ms_version == "0.4" else {}),
        }
        self.update_zattrs({"multiscales": multiscales, "omero": omero})

    # -- arrays ------------------------------------------------------------

    def __getitem__(self, name: str) -> ImageArray:
        if name not in self._arrays:
            self._arrays[name] = _open_array(self.path / name, self.version)
        return self._arrays[name]

    def __setitem__(self, name: str, data: np.ndarray) -> None:
        self.create_image(name, np.asarray(data))

    def __contains__(self, name: str) -> bool:
        child = self.path / name
        return (child / ".zarray").exists() or (child / "zarr.json").exists()

    @property
    def data(self) -> ImageArray:
        return self["0"]

    def array_names(self) -> list[str]:
        names = []
        for child in sorted(self.path.iterdir()):
            if (child / ".zarray").exists() or (
                (child / "zarr.json").exists()
                and _read_json(child / "zarr.json").get("node_type") == "array"
            ):
                names.append(child.name)
        return names

    def create_image(
        self,
        name: str,
        data: np.ndarray,
        chunks: Sequence[int] | None = None,
        transform: list[TransformationMeta] | None = None,
    ) -> ImageArray:
        data = np.asarray(data)
        arr = self.create_zeros(name, data.shape, data.dtype, chunks=chunks, transform=transform)
        arr[...] = data
        return arr

    def create_zeros(
        self,
        name: str,
        shape: Sequence[int],
        dtype: np.dtype,
        chunks: Sequence[int] | None = None,
        transform: list[TransformationMeta] | None = None,
        shards_ratio: Sequence[int] | None = None,
    ) -> ImageArray:
        meta = _array_metadata(shape, dtype, chunks, self.version, shards_ratio)
        arr = _open_array(self.path / name, self.version, create_spec=meta)
        self._arrays[name] = arr

        # Register the level in multiscales metadata
        attrs = self.zattrs
        ms = attrs.get("multiscales")
        tforms = (
            [t.to_ngff() for t in transform]
            if transform
            else [{"type": "scale", "scale": [1.0] * len(shape)}]
        )
        entry = {"path": name, "coordinateTransformations": tforms}
        if not ms:
            self._init_metadata(self.channel_names, datasets=[entry])
        else:
            datasets = ms[0]["datasets"]
            for i, d in enumerate(datasets):
                if d["path"] == name:
                    datasets[i] = entry
                    break
            else:
                datasets.append(entry)
            self.update_zattrs({"multiscales": ms})
        return arr

    def compute_pyramid(self, levels: int, method: str = "mean") -> None:
        """Create cascade-downsampled pyramid levels "1" .. "levels-1".

        Each level halves Y and X of the previous level (cascade, so chunk
        boundaries and aliasing don't compound from level 0); methods:
        mean/max/min/median/mode/stride over 2x2 blocks.
        """
        if levels <= 1:
            return
        scale = self.scale
        for lv in range(1, levels):
            prev = self[str(lv - 1)]
            T, C, Z, Y, X = prev.shape
            Y2, X2 = max(Y // 2, 1), max(X // 2, 1)
            lv_scale = list(scale)
            lv_scale[-2] = scale[-2] * (2**lv)
            lv_scale[-1] = scale[-1] * (2**lv)
            arr = self.create_zeros(
                str(lv),
                (T, C, Z, Y2, X2),
                prev.dtype,
                transform=[TransformationMeta(type="scale", scale=lv_scale)],
            )
            for t in range(T):
                for c in range(C):
                    data = prev[t, c]
                    arr[t, c] = _downsample_yx_2x(data, method)

    def append_channel(self, name: str) -> None:
        """Register an extra channel label (array must be resized separately)."""
        attrs = self.zattrs
        omero = attrs.get("omero", {"channels": []})
        omero["channels"].append({"label": str(name), "active": True})
        self.update_zattrs({"omero": omero})


class Plate(_Group):
    """An HCS plate: rows / columns / fields-of-view of 5D positions."""

    def __init__(self, path: Path, version: str = "0.4"):
        super().__init__(path, version)

    @property
    def channel_names(self) -> list[str]:
        names, pos = next(iter(self.positions()), (None, None))
        return pos.channel_names if pos is not None else []

    def _plate_meta(self) -> dict:
        return self.zattrs.get("plate", {})

    def _set_plate_meta(self, meta: dict) -> None:
        self.update_zattrs({"plate": meta})

    def position_keys(self) -> list[tuple[str, str, str]]:
        keys = []
        meta = self._plate_meta()
        for well in meta.get("wells", []):
            row, col = well["path"].split("/")
            well_group = _Group(self.path / row / col, self.version)
            for img in well_group.zattrs.get("well", {}).get("images", []):
                keys.append((row, col, img["path"]))
        return keys

    def positions(self) -> Iterator[tuple[str, Position]]:
        for row, col, fov in self.position_keys():
            yield f"{row}/{col}/{fov}", Position(self.path / row / col / fov, self.version)

    def __getitem__(self, name: str) -> Position:
        parts = str(name).strip("/").split("/")
        if len(parts) != 3:
            raise KeyError(f"Position key must be row/col/fov, got {name!r}")
        return Position(self.path.joinpath(*parts), self.version)

    def create_position(
        self,
        row: str,
        col: str,
        fov: str,
        channel_names: Sequence[str] | None = None,
    ) -> Position:
        row, col, fov = str(row), str(col), str(fov)
        self.ensure_group()
        _Group(self.path / row, self.version).ensure_group()
        well_group = _Group(self.path / row / col, self.version)
        well_group.ensure_group()

        # Update plate metadata idempotently
        meta = self._plate_meta() or {
            "acquisitions": [{"id": 0}],
            "rows": [],
            "columns": [],
            "wells": [],
            "field_count": 0,
            **({"version": self.version} if self.version == "0.4" else {}),
        }
        if row not in [r["name"] for r in meta["rows"]]:
            meta["rows"].append({"name": row})
        if col not in [c["name"] for c in meta["columns"]]:
            meta["columns"].append({"name": col})
        well_path = f"{row}/{col}"
        if well_path not in [w["path"] for w in meta["wells"]]:
            meta["wells"].append(
                {
                    "path": well_path,
                    "rowIndex": [r["name"] for r in meta["rows"]].index(row),
                    "columnIndex": [c["name"] for c in meta["columns"]].index(col),
                }
            )
        self._set_plate_meta(meta)

        # Update well metadata idempotently
        well_meta = well_group.zattrs.get("well", {"images": []})
        if self.version == "0.4":
            well_meta.setdefault("version", "0.4")
        existed = fov in [img["path"] for img in well_meta["images"]]
        if not existed:
            well_meta["images"].append({"path": fov})
            well_group.update_zattrs({"well": well_meta})
            meta["field_count"] = meta.get("field_count", 0) + 1
            self._set_plate_meta(meta)

        position = Position(self.path / row / col / fov, self.version)
        if not existed:
            names = channel_names if channel_names is not None else self._channels or []
            position._init_metadata(names)
        return position

    # channel names given at plate creation, used for new positions
    _channels: Sequence[str] | None = None

    def print_tree(self) -> None:
        for name, pos in self.positions():
            shapes = {n: pos[n].shape for n in pos.array_names()}
            print(f"{name}: {shapes}")



def _downsample_yx_2x(zyx: np.ndarray, method: str) -> np.ndarray:
    """Downsample the trailing (Y, X) axes by 2 with the given reduction."""
    Z, Y, X = zyx.shape
    if method == "stride":
        return zyx[:, ::2, ::2][:, : max(Y // 2, 1), : max(X // 2, 1)]
    Y2, X2 = max(Y // 2, 1), max(X // 2, 1)
    blocks = zyx[:, : Y2 * 2, : X2 * 2].reshape(Z, Y2, 2, X2, 2)
    if method == "mean":
        out = blocks.mean(axis=(2, 4))
    elif method == "max":
        out = blocks.max(axis=(2, 4))
    elif method == "min":
        out = blocks.min(axis=(2, 4))
    elif method == "median":
        out = np.median(blocks, axis=(2, 4))
    elif method == "mode":
        flat = blocks.transpose(0, 1, 3, 2, 4).reshape(Z, Y2, X2, 4)
        out = np.squeeze(
            np.take_along_axis(
                np.sort(flat, axis=-1), np.full((Z, Y2, X2, 1), 1), axis=-1
            ),
            -1,
        )
    else:
        raise ValueError(f"Unknown pyramid method: {method}")
    return out.astype(zyx.dtype)


def _detect_version(path: Path) -> str:
    if (path / "zarr.json").exists():
        return "0.5"
    return "0.4"


def _is_position(path: Path) -> bool:
    g = _Group(path, _detect_version(path))
    return "multiscales" in g.zattrs


def open_ome_zarr(
    path: str | Path,
    layout: Literal["auto", "hcs", "fov"] = "auto",
    mode: Literal["r", "r+", "a", "w", "w-"] = "r",
    channel_names: Sequence[str] | None = None,
    version: Literal["0.4", "0.5"] = "0.4",
):
    """Open (or create) an OME-Zarr HCS plate or single position.

    Mirrors the iohub entrypoint the reference uses everywhere
    (reference: biahub/deskew.py:12, biahub/cli/utils.py:13).
    """
    path = Path(path)
    if mode in ("w", "w-"):
        if path.exists():
            if mode == "w-":
                raise FileExistsError(path)
            shutil.rmtree(path)
        if layout in ("auto", "hcs"):
            plate = Plate(path, version)
            plate.ensure_group()
            plate._channels = list(channel_names or [])
            return plate
        position = Position(path, version)
        position._init_metadata(channel_names or [])
        return position

    if not path.exists():
        raise FileNotFoundError(path)
    detected = _detect_version(path)
    if _is_position(path):
        return Position(path, detected)
    plate = Plate(path, detected)
    plate._channels = list(channel_names) if channel_names else None
    return plate


def get_ome_zarr_version(path: str | Path) -> str:
    """Read the OME-Zarr version of an existing store."""
    return _detect_version(Path(path))


def create_empty_plate(
    store_path: str | Path,
    position_keys: Sequence[Sequence[str]],
    channel_names: Sequence[str],
    shape: Sequence[int],
    chunks: Sequence[int] | None = None,
    shards_ratio: Sequence[int] | None = None,
    scale: Sequence[float] | None = None,
    dtype: np.dtype = np.float32,
    version: Literal["0.4", "0.5"] = "0.4",
    metadata_sources: str | Path | None = None,
    metadata_keys: Sequence[str] | None = None,
) -> Plate:
    """Idempotently create an output plate with empty arrays for each position.

    Re-running with the same positions is a no-op; new positions get appended
    (reference: biahub/deskew.py:604-645, iohub.ngff.utils.create_empty_plate).
    Provenance zattrs matching the ``metadata_keys`` fnmatch allowlist are
    copied from the same position of ``metadata_sources``
    (reference: biahub/cli/utils.py:19-34).

    Multi-host runs serialize creation: the coordinator builds the plate
    while workers wait at a barrier, then every process returns a handle —
    the analog of the reference's init-on-the-login-node contract
    (reference: nextflow/modules/deskew.nf:30-40).
    """
    import fnmatch

    import jax

    if jax.process_count() > 1:
        from biahub_tpu.parallel.distributed import barrier, is_coordinator

        if not is_coordinator():
            barrier(f"plate-create:{store_path}")
            return open_ome_zarr(store_path, mode="r+")
        try:
            return _create_empty_plate_local(
                store_path, position_keys, channel_names, shape, chunks,
                shards_ratio, scale, dtype, version, metadata_sources,
                metadata_keys,
            )
        finally:
            barrier(f"plate-create:{store_path}")
    return _create_empty_plate_local(
        store_path, position_keys, channel_names, shape, chunks, shards_ratio,
        scale, dtype, version, metadata_sources, metadata_keys,
    )


def _create_empty_plate_local(
    store_path,
    position_keys,
    channel_names,
    shape,
    chunks=None,
    shards_ratio=None,
    scale=None,
    dtype=np.float32,
    version="0.4",
    metadata_sources=None,
    metadata_keys=None,
) -> "Plate":
    import fnmatch

    store_path = Path(store_path)
    plate = (
        Plate(store_path, _detect_version(store_path))
        if store_path.exists()
        else Plate(store_path, version)
    )
    plate.ensure_group()
    scale = list(scale) if scale is not None else [1.0] * len(shape)

    source_plate = None
    if metadata_sources is not None and Path(metadata_sources).exists():
        source_plate = open_ome_zarr(metadata_sources, mode="r")

    for key in position_keys:
        row, col, fov = (str(k) for k in key)
        position = plate.create_position(row, col, fov, channel_names=channel_names)
        if "0" not in position:
            position.create_zeros(
                "0",
                shape,
                np.dtype(dtype),
                chunks=chunks,
                shards_ratio=shards_ratio,
                transform=[TransformationMeta(type="scale", scale=scale)],
            )
        if source_plate is not None and metadata_keys:
            try:
                src_pos = source_plate[f"{row}/{col}/{fov}"]
                src_attrs = src_pos.zattrs
            except (KeyError, FileNotFoundError):
                src_attrs = {}
            carried = {
                k: v
                for k, v in src_attrs.items()
                if any(fnmatch.fnmatch(k, pat) for pat in metadata_keys)
            }
            if carried:
                position.update_zattrs(carried)
    return plate
