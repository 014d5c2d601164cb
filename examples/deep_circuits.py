"""Deep leveled circuits: walking the RNS modulus ladder.

The reference's backend (Zama Concrete, TFHE) refreshes noise with
bootstrapping inside every compiled op (/root/reference/
fhe_similarity.py:108-140 hides it in `compile()`).  This framework is
leveled BGV: depth is provisioned up front via the modulus chain, and
each ct x ct multiplication walks one rung — square, relinearize back to
two polynomials, then modulus-switch one limb down, which divides the
noise by ~2^31 and keeps the ladder going.

With the depth plaintext modulus t = 2^16 + 1, one 31-bit limb absorbs
one multiplication, so multiplicative depth = n_limbs - 1.  The secure
production analog is the `deep-16384` preset (12 limbs -> depth 11);
this demo uses a tiny 6-limb ring (NOT secure) so it runs in seconds.

The message is m = a + b*X^{N/2}.  Because X^{N/2} squares to -1 in the
negacyclic ring, homomorphic squaring is exactly complex squaring
(a, b) -> (a^2 - b^2, 2ab) mod t — so each rung is checked bit-exact
against two lines of integer arithmetic.

Run: python examples/deep_circuits.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fhe_icp_tpu.ops.noise import noise_budget_bits
from fhe_icp_tpu.ops.params import T_DEPTH, CryptoParams
from fhe_icp_tpu.ops.runtime import FheRuntime


def main() -> None:
    print(__doc__)
    params = CryptoParams("demo-512-deep", n=512, n_limbs=6, t=T_DEPTH,
                          allow_insecure=True)
    rt = FheRuntime(params)
    rt.generate_keys(seed=0)
    ctx, t = rt.ctx, rt.ctx.t

    a, b = 123, -77
    m = np.zeros(ctx.n, dtype=np.int32)
    m[0], m[ctx.n // 2] = a, b
    ct = rt.encrypt(m, seed=7)

    def report(tag, ct, a, b):
        got = np.asarray(rt.decrypt(ct), dtype=np.int64)
        ok = got[0] == a and got[ctx.n // 2] == b
        budget = noise_budget_bits(ctx, rt.keys.sk, ct)
        print(f"  {tag:<28} level={ct.level}  value=({a}, {b})  "
              f"noise budget={budget:>3} bits  exact={ok}")
        assert ok

    print(f"ring N={ctx.n}, {ctx.n_limbs} limbs, t=2^16+1 -> "
          f"depth {ctx.n_limbs - 1}\n")
    report("fresh", ct, a, b)
    for rung in range(ctx.n_limbs - 1):
        ct = rt.mul_ct(ct, ct, relinearize=True)
        aa = (a * a - b * b + t // 2) % t - t // 2
        bb = (2 * a * b + t // 2) % t - t // 2
        a, b = aa, bb
        if ct.level > 2:
            ct = rt.mod_switch(ct)
        report(f"square #{rung + 1} (+relin+switch)", ct, a, b)

    print("\nEvery rung decrypted bit-exact; the budget column shows the "
          "noise\nheadroom the modulus switch wins back after each "
          "squaring.")


if __name__ == "__main__":
    main()
