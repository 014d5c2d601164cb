"""Subprocess keygen worker: generate a KeySet on a clean CPU backend.

In TPU-tunnel environments the PJRT plugin (registered into every python
process via sitecustomize) routes ALL XLA compilation — including
CPU-target graphs — through a remote compile service: the keygen graph
that compiles in ~3 s on a local CPU backend takes ~6 min through the
tunnel (measured; the "AOT result ... machine features don't match"
loader warnings are the tell).  `FheRuntime.generate_keys` therefore
shells out to THIS module with the plugin environment scrubbed, and
loads the resulting arrays back.

Determinism: the worker runs the same `cipher.keygen(ctx, PRNGKey(seed))`
on the same threefry PRNG, so the key material is bit-identical to an
in-process CPU run with the same seed.

Usage: python -m fhe_icp_tpu.ops.keygen_worker <params_json> <out_npz>
where params_json = {"params": {name,n,n_limbs,t,cbd_k,allow_insecure},
"seed": int, "rlk_levels": [..] | null}.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    cfg = json.loads(sys.argv[1])
    out_path = sys.argv[2]

    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from .cipher import keygen
    from .context import CryptoContext
    from .params import CryptoParams

    params = CryptoParams(**cfg["params"])
    ctx = CryptoContext(params)
    ks = jax.jit(lambda k: keygen(ctx, k,
                                  rlk_levels=cfg["rlk_levels"]))(
        jax.random.PRNGKey(cfg["seed"]))
    ks = jax.block_until_ready(ks)

    arrays = {
        "s": np.asarray(ks.sk.s),
        "s_ntt_mont": np.asarray(ks.sk.s_ntt_mont),
        "s2_ntt_mont": np.asarray(ks.sk.s2_ntt_mont),
        "pk_b": np.asarray(ks.pk.b_ntt),
        "pk_a": np.asarray(ks.pk.a_ntt),
    }
    for lv, rk in ks.rlk.keys.items():
        arrays[f"rlk_{lv}"] = np.asarray(rk)
    np.savez(out_path, **arrays)


if __name__ == "__main__":
    main()
