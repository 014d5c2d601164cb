"""fhe_icp_tpu — a TPU-native FHE ciphertext-arithmetic framework.

A from-scratch JAX/XLA/Pallas implementation of the encrypted document
similarity capability of the reference (shipstone-labs/fhe-icp), with the
crypto core (RNS-BGV: modular arithmetic, negacyclic NTT, ciphertext
add/mul, relinearization, modulus switching, encrypted dot products) as
first-class TPU kernels instead of an external native runtime.
"""

__version__ = "0.1.0"

from . import ops

__all__ = ["ops", "__version__"]
