"""TPU-native BGV crypto core: RNS modular arithmetic, negacyclic NTT,
ciphertext ops, and encrypted dot products."""

from .params import PRESETS, DEFAULT_PRESET, CryptoParams, get_params
from .context import CryptoContext
from .cipher import (Ciphertext, KeySet, PublicKey, RelinKey, SecretKey,
                     decrypt, encrypt_pk, encrypt_sym, keygen)
from . import arith, dot, encoding, modmath, ntt, primes

__all__ = [
    "PRESETS", "DEFAULT_PRESET", "CryptoParams", "get_params", "CryptoContext",
    "Ciphertext", "KeySet", "PublicKey", "RelinKey", "SecretKey",
    "decrypt", "encrypt_pk", "encrypt_sym", "keygen",
    "arith", "dot", "encoding", "modmath", "ntt", "primes",
]
