"""Import-time stub; the head-to-head never exercises the WPE/beamformer
frontend that actually needs ComplexTensor."""
from .tensor import ComplexTensor
