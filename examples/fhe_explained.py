"""A guided tour of the FHE pipeline, with real ciphertexts at every step.

Reference parity: /root/reference/fhe_explained.py (a concept walkthrough
that could only print explanations — Concrete hides the objects).  Here
every concept is demonstrated on live BGV ciphertexts.

Run: python examples/fhe_explained.py
"""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import numpy as np

from fhe_icp_tpu.ops.noise import noise_budget_bits
from fhe_icp_tpu.ops.runtime import FheRuntime
from fhe_icp_tpu.utils.quantize import prepare_embedding_for_fhe


def main() -> None:
    print(__doc__)

    print("1) Parameters — an RNS-BGV ring, chosen from the HE security "
          "standard:")
    rt = FheRuntime("test-512-mult")   # tiny demo ring (NOT secure)
    rt.generate_keys(seed=0)
    ctx = rt.ctx
    print(f"   ring degree N={ctx.n}, {ctx.n_limbs} RNS limbs, "
          f"log2(q)={ctx.params.log_q}, plaintext modulus t={ctx.t}\n")

    print("2) Encryption hides the message in noise: c0 + c1*s = m + t*e")
    m = np.asarray([42] + [0] * (ctx.n - 1), dtype=np.int32)
    ct = rt.encrypt(m, seed=1)
    print(f"   ciphertext shape {tuple(ct.data.shape)} uint32; the same "
          f"message encrypts differently every time")
    print(f"   noise budget: {noise_budget_bits(ctx, rt.keys.sk, ct)} bits\n")

    print("3) Homomorphic operations compute on ciphertexts:")
    a = np.asarray([5] + [0] * (ctx.n - 1), dtype=np.int32)
    b = np.asarray([7] + [0] * (ctx.n - 1), dtype=np.int32)
    ca, cb = rt.encrypt(a, seed=2), rt.encrypt(b, seed=3)
    print(f"   dec(enc(5) + enc(7)) = {int(np.asarray(rt.decrypt(rt.add(ca, cb)))[0])}")
    prod = rt.mul_ct(ca, cb)
    print(f"   dec(enc(5) * enc(7)) = {int(np.asarray(rt.decrypt(prod))[0])}"
          f"   (budget after mul: "
          f"{noise_budget_bits(ctx, rt.keys.sk, prod)} bits)\n")

    print("4) A document similarity score is ONE encrypted dot product:")
    rng = np.random.default_rng(0)
    e1 = rng.standard_normal(128)
    e2 = 0.8 * e1 + 0.2 * rng.standard_normal(128)
    q1, _ = prepare_embedding_for_fhe(e1)       # the scale-1000 contract
    q2, _ = prepare_embedding_for_fhe(e2)
    ct1 = rt.encrypt_vector(q1, seed=4)
    score_ct = rt.dot_ct_pt(ct1, q2)
    raw = int(rt.decrypt_dot(score_ct, 128))
    true = float(e1 @ e2 / (np.linalg.norm(e1) * np.linalg.norm(e2)))
    print(f"   encrypted score: {raw / 1e6:.4f}   true cosine: {true:.4f}")
    print("   (the server never saw e1 in the clear)\n")

    print("5) Fully encrypted compare (both sides hidden) uses ct x ct + "
          "relinearization:")
    ct2r = rt.encrypt_vector(q2, seed=5, rev=True)
    raw2 = int(rt.decrypt_dot(rt.dot_ct_ct(ct1, ct2r), 128))
    print(f"   ct x ct score: {raw2 / 1e6:.4f} (same value, more noise)")


if __name__ == "__main__":
    main()
