"""Polynomial-kernel similarity fully under encryption — a depth-2 walk.

The reference can only evaluate its polynomial kernel in the clear
(/root/reference/similarity_alternatives.py:8-83); its FHE backend never
composes two ciphertext multiplications.  This demo runs the whole
kernel sim = ((1 + cos)/2)^2 homomorphically on LIVE ciphertexts:

    slotwise ct x ct  ->  relinearize  ->  log2(d) prefix rotations
    ->  + scale^2 (plaintext)  ->  ct x ct SQUARE  ->  decrypt slot 0

and shows the encrypted integer result is EXACTLY the quantized-clear
simulation.  Uses the tiny test ring so it runs in ~a minute on CPU:

    env -u PYTHONPATH JAX_PLATFORMS=cpu python examples/polynomial_kernel.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fhe_icp_tpu.models.poly import FHEPolynomialSimilarity  # noqa: E402


def main() -> None:
    m = FHEPolynomialSimilarity(input_dim=64, preset="test-512-poly",
                                scale=90)
    print("compiling (keygen + rotation keys + range/depth checks)...")
    info = m.compile()
    print(f"  circuit max bits: {info['circuit_max_bits']}, "
          f"rotations: {m.metrics['rotations']}")

    rng = np.random.default_rng(0)
    a = rng.standard_normal(64)
    probes = {
        "identical": a,
        "noisy copy": a + 0.25 * rng.standard_normal(64),
        "independent": rng.standard_normal(64),
        "opposite": -a,
    }
    print(f"{'pair':<14}{'clear':>10}{'quantized':>12}{'encrypted':>12}"
          f"{'exact?':>8}")
    for name, b in probes.items():
        clear = m.predict_clear(a, b)
        qc = m.predict_quantized_clear(a, b)
        enc = m.predict_encrypted(a, b)
        print(f"{name:<14}{clear:>10.4f}{qc:>12.4f}{enc:>12.4f}"
              f"{str(enc == qc):>8}")
    print("\nencrypted == quantized-clear on every probe: the depth-2 "
          "circuit (two ct x ct multiplications + rotations) is exact.")


if __name__ == "__main__":
    main()
