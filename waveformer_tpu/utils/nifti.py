"""Minimal NIfTI-1 reader/writer (pure numpy, gzip-aware).

Replaces the reference's SimpleITK IO (`light_training/prediction.py:209-227`,
`preprocessor_mri.py:58-89`) — SimpleITK is not in this image, and the only
capabilities the pipeline needs are: read voxel data + spacing/affine, write
a segmentation with spacing. Implements the NIfTI-1 single-file (.nii/.nii.gz)
layout: 348-byte header, vox_offset 352, Fortran-ordered data.
"""

from __future__ import annotations

import gzip
import struct
from dataclasses import dataclass, field
from typing import Tuple

import numpy as np

_DTYPES = {
    2: np.uint8,
    4: np.int16,
    8: np.int32,
    16: np.float32,
    64: np.float64,
    256: np.int8,
    512: np.uint16,
    768: np.uint32,
}
_DTYPE_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}


@dataclass
class NiftiImage:
    data: np.ndarray  # (X, Y, Z[, T]) — NIfTI axis order
    affine: np.ndarray = field(
        default_factory=lambda: np.eye(4, dtype=np.float32)
    )

    @property
    def spacing(self) -> Tuple[float, float, float]:
        return tuple(float(np.linalg.norm(self.affine[:3, i])) for i in range(3))


def _open(path: str, mode: str):
    if str(path).endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def load(path: str) -> NiftiImage:
    with _open(path, "rb") as f:
        hdr = f.read(352)
        sizeof_hdr = struct.unpack_from("<i", hdr, 0)[0]
        if sizeof_hdr != 348:
            raise ValueError(f"{path}: not a little-endian NIfTI-1 file")
        dim = struct.unpack_from("<8h", hdr, 40)
        ndim = dim[0]
        shape = tuple(int(d) for d in dim[1 : 1 + ndim])
        datatype = struct.unpack_from("<h", hdr, 70)[0]
        pixdim = struct.unpack_from("<8f", hdr, 76)
        vox_offset = int(struct.unpack_from("<f", hdr, 108)[0])
        scl_slope = struct.unpack_from("<f", hdr, 112)[0]
        scl_inter = struct.unpack_from("<f", hdr, 116)[0]
        sform_code = struct.unpack_from("<h", hdr, 254)[0]
        srow = np.asarray(
            struct.unpack_from("<12f", hdr, 280), np.float32
        ).reshape(3, 4)
        if datatype not in _DTYPES:
            raise ValueError(f"{path}: unsupported NIfTI datatype {datatype}")
        np_dtype = _DTYPES[datatype]
        if vox_offset > 352:
            f.read(vox_offset - 352)
        raw = f.read(int(np.prod(shape)) * np.dtype(np_dtype).itemsize)
    data = np.frombuffer(raw, dtype=np_dtype).reshape(shape, order="F")
    if scl_slope not in (0.0, 1.0) or scl_inter != 0.0:
        slope = scl_slope if scl_slope != 0.0 else 1.0
        data = data.astype(np.float32) * slope + scl_inter
    affine = np.eye(4, dtype=np.float32)
    if sform_code > 0:
        affine[:3, :] = srow
    else:
        # fall back to pixdim spacing on the diagonal
        for i in range(3):
            affine[i, i] = pixdim[1 + i] if pixdim[1 + i] != 0 else 1.0
    return NiftiImage(data=data, affine=affine)


def save(img: NiftiImage, path: str) -> None:
    data = np.asarray(img.data)
    if data.dtype not in _DTYPE_CODES:
        data = data.astype(np.float32)
    code = _DTYPE_CODES[data.dtype]
    ndim = data.ndim
    dim = [ndim] + list(data.shape) + [1] * (7 - ndim)
    spacing = NiftiImage(data=data, affine=img.affine).spacing
    pixdim = [1.0] + list(spacing) + [1.0] * (7 - 3)

    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    struct.pack_into("<8h", hdr, 40, *dim)
    struct.pack_into("<h", hdr, 70, code)
    struct.pack_into("<h", hdr, 72, data.dtype.itemsize * 8)
    struct.pack_into("<8f", hdr, 76, *pixdim)
    struct.pack_into("<f", hdr, 108, 352.0)
    struct.pack_into("<f", hdr, 112, 1.0)  # scl_slope
    struct.pack_into("<h", hdr, 252, 0)  # qform_code
    struct.pack_into("<h", hdr, 254, 1)  # sform_code
    struct.pack_into("<12f", hdr, 280, *np.asarray(img.affine[:3, :], np.float32).reshape(-1))
    hdr[344:348] = b"n+1\x00"

    with _open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(b"\x00" * 4)  # extension flag
        f.write(np.asfortranarray(data).tobytes(order="F"))
