from . import activations, cutoff, math, radial, scatter
from .activations import shifted_softplus, softplus_inverse
from .cutoff import cosine_cutoff, mollifier_cutoff, switch_function
from .math import safe_norm, safe_normalize, stable_sinh_div
from .radial import bessel_rbf, gaussian_rbf
from .scatter import gather, segment_mean, segment_softmax, segment_sum

__all__ = [
    "activations", "cutoff", "math", "radial", "scatter",
    "shifted_softplus", "softplus_inverse",
    "cosine_cutoff", "mollifier_cutoff", "switch_function",
    "safe_norm", "safe_normalize", "stable_sinh_div",
    "bessel_rbf", "gaussian_rbf",
    "gather", "segment_mean", "segment_softmax", "segment_sum",
]
