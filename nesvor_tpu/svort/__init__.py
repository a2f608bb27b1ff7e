from .srr import CG, SRR, PSFreconstruction
from .registration import VVR, Registration, resample

__all__ = ["CG", "SRR", "PSFreconstruction", "VVR", "Registration", "resample"]
