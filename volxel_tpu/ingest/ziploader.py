"""ZIP series ingest (reference dicom_preprocessor/src/zip.rs:36-125).

Reads every file entry of a ZIP archive as a DICOM slice, enforcing the
reference's single-folder constraint (zip.rs:57-70), and folds them into a
series / brick grid.
"""

from __future__ import annotations

import io
import zipfile
from pathlib import Path

import numpy as np  # noqa: F401  (re-exported convenience)

from volxel_tpu.grid.brick import BrickGrid
from volxel_tpu.ingest.dicom import DicomError, parse_dicom
from volxel_tpu.ingest.series import DicomSeries, _fold_slices, series_to_grid


class ZipIngestError(DicomError):
    pass


def _open_zip(source) -> zipfile.ZipFile:
    if isinstance(source, (bytes, bytearray, memoryview)):
        return zipfile.ZipFile(io.BytesIO(bytes(source)))
    return zipfile.ZipFile(Path(source))


def read_zip_series(source) -> DicomSeries:
    try:
        zf = _open_zip(source)
    except zipfile.BadZipFile as e:
        raise ZipIngestError(f"Not a valid ZIP archive: {e}") from e
    with zf:
        entries = [i for i in zf.infolist() if not i.is_dir()]
        if not entries:
            raise ZipIngestError("ZIP archive contains no files")
        # single-folder constraint (zip.rs:57-70)
        folders = {str(Path(i.filename).parent) for i in entries}
        if len(folders) > 1:
            raise ZipIngestError(
                f"ZIP must contain a single folder of DICOM files, found: {sorted(folders)}"
            )
        files = [parse_dicom(zf.read(i)) for i in entries]
    return _fold_slices(files)


def read_zip_to_grid(source) -> BrickGrid:
    """ZIP bytes/path -> BrickGrid (zip.rs:117-125)."""
    return series_to_grid(read_zip_series(source))
