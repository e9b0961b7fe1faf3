"""Shared machinery for benchmark dataset modules.

Parity: the reference's dataset modules (``src/schnetpack/datasets/*``) are
AtomsDataModule subclasses that download raw archives on first use and
convert them into an ASE DB.  This environment has no network egress, so
every dataset here follows the same pattern with an explicit offline path:
if the raw file already exists at ``raw_path`` it is converted; otherwise a
clear error explains what to download and where to place it.
"""
from __future__ import annotations

import os
import urllib.error
import urllib.request
from typing import Optional

from ..data.datamodule import AtomsDataModule


class DownloadableDataModule(AtomsDataModule):
    """AtomsDataModule that builds its DB from raw files on first setup."""

    #: human-readable download instructions (per dataset)
    download_url: Optional[str] = None

    def __init__(self, *args, raw_dir: Optional[str] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.raw_dir = raw_dir or os.path.dirname(os.path.abspath(self.datapath))

    def prepare_data(self) -> None:
        if os.path.exists(self.datapath):
            return
        os.makedirs(os.path.dirname(os.path.abspath(self.datapath)), exist_ok=True)
        self._build_database()

    def setup(self, stage: Optional[str] = None):
        self.prepare_data()
        super().setup(stage)

    # -- helpers ---------------------------------------------------------
    def _fetch(self, url: str, filename: str) -> str:
        """Return a local path for ``filename``: reuse if present in
        raw_dir, else attempt download (fails loudly without egress)."""
        local = os.path.join(self.raw_dir, filename)
        if os.path.exists(local):
            return local
        try:
            os.makedirs(self.raw_dir, exist_ok=True)
            urllib.request.urlretrieve(url, local)  # nosec - dataset fetch
            return local
        except (urllib.error.URLError, OSError) as e:
            raise RuntimeError(
                f"Raw data file {filename!r} not found in {self.raw_dir} and "
                f"download from {url} failed ({e}). Place the file there "
                "manually to proceed offline."
            ) from e

    def _build_database(self) -> None:
        raise NotImplementedError
