from .hdf5 import HDF5Loader
from .spectra import (
    IRSpectrum,
    PowerSpectrum,
    RamanSpectrum,
    VibrationalSpectrum,
    fft_autocorrelation,
)

__all__ = [
    "HDF5Loader", "IRSpectrum", "PowerSpectrum", "RamanSpectrum",
    "VibrationalSpectrum", "fft_autocorrelation",
]
