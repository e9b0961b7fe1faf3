from .base import DownloadableDataModule
from .md17 import MD17, MD22, GDMLDataModule, rMD17
from .misc import (
    ANI1,
    ISO17,
    QM7X,
    TMQM,
    MaterialsProject,
    OrganicMaterialsDatabase,
)
from .qm9 import QM9

__all__ = [
    "DownloadableDataModule", "GDMLDataModule", "MD17", "MD22", "rMD17",
    "ANI1", "ISO17", "QM7X", "TMQM", "MaterialsProject",
    "OrganicMaterialsDatabase", "QM9",
]
