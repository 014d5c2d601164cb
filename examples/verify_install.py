"""Installation check: imports, device inventory, one encrypted round trip.

Reference parity: /root/reference/verify_install.py (43 lines).
Run: python examples/verify_install.py
"""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import sys


def main() -> int:
    ok = True
    for pkg in ("jax", "numpy", "flax", "transformers"):
        try:
            mod = __import__(pkg)
            print(f"[ok] {pkg} {getattr(mod, '__version__', '?')}")
        except ImportError as e:
            print(f"[FAIL] {pkg}: {e}")
            ok = pkg in ("flax", "transformers") and ok  # optional deps

    import jax
    print(f"[ok] backend={jax.default_backend()} devices={jax.devices()}")

    import numpy as np

    from fhe_icp_tpu.ops.runtime import FheRuntime

    rt = FheRuntime("test-512")
    rt.generate_keys(seed=0)
    m = np.arange(rt.ctx.n, dtype=np.int32) % 201 - 100
    out = np.asarray(rt.decrypt(rt.encrypt(m, seed=1)))
    if (out == m).all():
        print("[ok] BGV encrypt/decrypt round trip is exact")
    else:
        print("[FAIL] encrypt/decrypt mismatch")
        ok = False

    ct = rt.encrypt_vector(np.asarray([7], dtype=np.int32), seed=2)
    got = int(rt.decrypt_dot(rt.dot_ct_pt(ct, np.asarray([2], np.int32)), 1))
    if got == 14:
        print("[ok] encrypted y=2x: predict(7) == 14")
    else:
        print(f"[FAIL] encrypted y=2x returned {got}")
        ok = False

    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
