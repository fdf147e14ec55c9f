"""Minimal pure-Python float32 TIFF codec.

The reference leans on dxchange/tifffile for every volume dump
(ref tensorflow_recon/fullfield.py:615-641 etc.). Neither is available here,
so this module implements the small subset needed: uncompressed grayscale
float32 (and uint8/16) TIFFs, single- or multi-page, read and write.
"""

import os
import struct

import numpy as np

__all__ = ["write_tiff", "read_tiff", "write_tiff_stack", "read_tiff_stack"]

_SAMPLE_FORMATS = {np.dtype("float32"): 3, np.dtype("uint8"): 1,
                   np.dtype("uint16"): 1, np.dtype("int32"): 2}


def _ifd_entries(h, w, dtype, strip_offset):
    bits = dtype.itemsize * 8
    count = h * w * dtype.itemsize
    return [
        (256, 3, 1, w),            # ImageWidth
        (257, 3, 1, h),            # ImageLength
        (258, 3, 1, bits),         # BitsPerSample
        (259, 3, 1, 1),            # Compression: none
        (262, 3, 1, 1),            # Photometric: BlackIsZero
        (273, 4, 1, strip_offset), # StripOffsets
        (277, 3, 1, 1),            # SamplesPerPixel
        (278, 3, 1, h),            # RowsPerStrip
        (279, 4, 1, count),        # StripByteCounts
        (339, 3, 1, _SAMPLE_FORMATS[dtype]),  # SampleFormat
    ]


def write_tiff(arr, fname, dtype="float32", overwrite=True):
    """Write a 2D image or a 3D stack (pages along axis 0) as a TIFF file.

    Appends '.tiff' if no TIFF suffix is present (dxchange convention).
    """
    if not fname.endswith((".tiff", ".tif")):
        fname = fname + ".tiff"
    if os.path.exists(fname) and not overwrite:
        raise FileExistsError(fname)
    d = os.path.dirname(fname)
    if d:
        os.makedirs(d, exist_ok=True)
    arr = np.asarray(arr)
    if np.iscomplexobj(arr):
        arr = np.abs(arr)
    arr = arr.astype(dtype)
    pages = arr[None] if arr.ndim == 2 else arr.reshape(-1, arr.shape[-2], arr.shape[-1])
    dt = arr.dtype

    with open(fname, "wb") as f:
        f.write(b"II*\x00")
        f.write(struct.pack("<I", 8))  # offset of first IFD
        offset = 8
        n_pages = pages.shape[0]
        for i, page in enumerate(pages):
            h, w = page.shape
            n_entries = len(_ifd_entries(h, w, dt, 0))
            ifd_size = 2 + n_entries * 12 + 4
            data_offset = offset + ifd_size
            entries = _ifd_entries(h, w, dt, data_offset)
            next_ifd = data_offset + h * w * dt.itemsize if i + 1 < n_pages else 0
            buf = struct.pack("<H", n_entries)
            for tag, typ, cnt, val in entries:
                buf += struct.pack("<HHII", tag, typ, cnt, val)
            buf += struct.pack("<I", next_ifd)
            f.write(buf)
            f.write(page.astype("<" + dt.str[1:]).tobytes())
            offset = next_ifd if next_ifd else 0
    return fname


def read_tiff(fname):
    """Read a (subset-of-spec) TIFF written by :func:`write_tiff` or similar.

    Returns a 2D array for single-page files, 3D (pages, H, W) otherwise.
    """
    if not os.path.exists(fname) and os.path.exists(fname + ".tiff"):
        fname = fname + ".tiff"
    with open(fname, "rb") as f:
        data = f.read()
    if data[:2] == b"II":
        en = "<"
    elif data[:2] == b"MM":
        en = ">"
    else:
        raise ValueError("Not a TIFF file: %s" % fname)
    (ifd_offset,) = struct.unpack(en + "I", data[4:8])
    pages = []
    while ifd_offset:
        (n_entries,) = struct.unpack(en + "H", data[ifd_offset:ifd_offset + 2])
        tags = {}
        for i in range(n_entries):
            off = ifd_offset + 2 + i * 12
            tag, typ, cnt, val = struct.unpack(en + "HHII", data[off:off + 12])
            if typ == 3 and cnt == 1:  # SHORT stored left-justified
                val = struct.unpack(en + "HH", data[off + 8:off + 12])[0]
            tags[tag] = val
        w, h = tags[256], tags[257]
        bits = tags.get(258, 32)
        fmt = tags.get(339, 3)
        strip_offset = tags[273]
        if fmt == 3:
            dt = np.dtype(en + "f%d" % (bits // 8))
        elif fmt == 2:
            dt = np.dtype(en + "i%d" % (bits // 8))
        else:
            dt = np.dtype(en + "u%d" % (bits // 8))
        count = h * w * dt.itemsize
        page = np.frombuffer(data[strip_offset:strip_offset + count], dtype=dt)
        pages.append(page.reshape(h, w).astype(dt.newbyteorder("=")))
        (ifd_offset,) = struct.unpack(en + "I",
                                      data[ifd_offset + 2 + n_entries * 12:
                                           ifd_offset + 2 + n_entries * 12 + 4])
    arr = np.stack(pages)
    return arr[0] if arr.shape[0] == 1 else arr


def write_tiff_stack(arr, fname_prefix, dtype="float32", overwrite=True, digit=5):
    """Write a 3D volume as numbered single-page TIFFs (dxchange convention)."""
    arr = np.asarray(arr)
    names = []
    for i, page in enumerate(arr):
        names.append(write_tiff(page, "{}_{:0{d}d}".format(fname_prefix, i, d=digit),
                                dtype=dtype, overwrite=overwrite))
    return names


def read_tiff_stack(fname_prefix, indices, digit=5):
    """Read numbered single-page TIFFs back into a 3D volume."""
    pages = [read_tiff("{}_{:0{d}d}.tiff".format(fname_prefix, i, d=digit))
             for i in indices]
    return np.stack(pages)
