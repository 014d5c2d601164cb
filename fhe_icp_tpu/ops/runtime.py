"""FheRuntime: jitted, cached entry points over the pure crypto functions.

The functional layers (cipher/arith/dot) are pure and eager-agnostic;
this class closes them over a CryptoContext and wraps each operation in
`jax.jit` exactly once, so repeated calls hit the XLA executable cache.
Ciphertext is a registered pytree (level/is_ntt are static aux data), so
ops retrace only when the level or arity actually changes.

This is the layer the pipeline, CLI, and benchmarks call — the analog of
the compiled `fhe_circuit` handle the reference gets back from Concrete
(/root/reference/fhe_similarity.py:120-140), except the "circuit" here is
XLA-compiled TPU code.
"""

from __future__ import annotations

import functools
import itertools
import os
from typing import Optional

import jax
import jax.numpy as jnp

_cache_ready = False

# -- fresh encryption randomness ---------------------------------------------
# RLWE encryption must NEVER reuse (a, e) across different messages:
# c0 - c0' = m - m' leaks the plaintext difference.  The reference gets
# this for free because Concrete samples fresh per execute
# (/root/reference/fhe_similarity.py:151).  Here every encrypt entry
# point defaults to a never-repeating key: a process-wide base drawn
# from os.urandom folded with a monotonic counter, so reuse within a
# process is impossible and cross-process collision requires matching
# 63-bit bases.  Pass an explicit integer seed only for deterministic
# tests / known-answer vectors.
_entropy_base = None
_entropy_counter = itertools.count()


def fresh_prng_key():
    """A never-repeating jax PRNGKey backed by OS entropy."""
    global _entropy_base
    if _entropy_base is None:
        _entropy_base = jax.random.PRNGKey(
            int.from_bytes(os.urandom(8), "little") >> 1)
    return jax.random.fold_in(_entropy_base, next(_entropy_counter))


def _prng_key(seed: Optional[int]):
    return fresh_prng_key() if seed is None else jax.random.PRNGKey(seed)


def _ensure_cpu_platform() -> None:
    """Make the CPU backend reachable when JAX_PLATFORMS pins an accelerator.

    TPU tunnel environments pin JAX_PLATFORMS to the accelerator platform
    only, which unregisters CPU — and `generate_keys(on="cpu")` then
    silently falls back to the accelerator, where the keygen graph pays
    minutes of REMOTE compile (measured ~390 s at pairwise-4096 in round
    2 vs seconds on CPU).  Appending ",cpu" keeps the accelerator the
    default device while making `jax.devices("cpu")` work.  Must run
    before JAX initializes backends; harmless afterwards (the update is
    simply ignored once backends exist).
    """
    plats = os.environ.get("JAX_PLATFORMS", "")
    if not plats or "cpu" in plats.split(","):
        return
    try:
        jax.config.update("jax_platforms", plats + ",cpu")
    except Exception:
        pass


def _machine_fingerprint() -> str:
    """Short hash of the host CPU's feature set.

    XLA:CPU AOT artifacts embed the compile machine's feature flags and
    refuse (loudly — cpu_aot_loader.cc errors on every load) to run on a
    host whose features differ.  Two populations share a host here yet
    produce incompatible artifacts: processes with a tunnel PJRT plugin
    registered route even CPU-target compiles through the REMOTE compile
    service, whose artifacts carry extra pseudo-features
    (+prefer-no-scatter/gather) that plugin-free local processes reject.
    Scope the cache by host CPU features AND compile-path markers so each
    population keeps its artifacts to itself.
    """
    import hashlib
    import platform
    feats = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats += " " + " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        feats += " " + platform.processor()
    # Compile-path markers: tunnel plugin present? platform pinning?
    feats += (f" tunnel={bool(os.environ.get('PALLAS_AXON_POOL_IPS'))}"
              f" plats={os.environ.get('JAX_PLATFORMS', '')}")
    return hashlib.sha256(feats.encode()).hexdigest()[:10]


def _setup_compile_cache() -> None:
    """Persistent XLA compilation cache, scoped per backend AND machine.

    Keygen/relin graphs take minutes to compile on remote-compile TPU
    tunnels; cache across processes.  The directory is suffixed with the
    backend platform (CPU artifacts never collide with TPU ones) and a
    CPU-feature fingerprint (artifacts from a different machine type fail
    to AOT-load and spam cpu_aot_loader errors — see _machine_fingerprint).
    Disable with FHE_JAX_CACHE=0.
    """
    global _cache_ready
    if _cache_ready or os.environ.get("FHE_JAX_CACHE", "1") != "1":
        return
    _cache_ready = True
    _ensure_cpu_platform()
    if (jax.default_backend() == "cpu"
            and not os.environ.get("PALLAS_AXON_POOL_IPS")
            and os.environ.get("FHE_JAX_CACHE_CPU") != "1"):
        # Local CPU compiles take seconds — and this XLA build's CPU AOT
        # loader rejects its OWN gather/scatter-containing artifacts
        # (it stamps +prefer-no-scatter/gather tuning prefs into the
        # target features, then treats them as missing host CPUID bits on
        # reload — verified empirically: an identical process errors on
        # the artifacts it just wrote).  Persisting buys ~1.5 s/process
        # and floods stderr with cpu_aot_loader errors; skip it.  Opt
        # back in with FHE_JAX_CACHE_CPU=1.
        return
    try:
        base = os.path.expanduser(os.environ.get(
            "FHE_JAX_CACHE_DIR", "~/.cache/fhe_icp_tpu_jax"))
        jax.config.update(
            "jax_compilation_cache_dir",
            f"{base}-{jax.default_backend()}-{_machine_fingerprint()}")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these flags
        pass

from . import arith, dot
from .cipher import (Ciphertext, KeySet, decrypt, encrypt_pk, encrypt_sym,
                     keygen)
from .context import CryptoContext
from .encoding import encode_fwd, encode_rev
from .params import CryptoParams, get_params


class FheRuntime:
    """Jitted FHE operations bound to one parameter set + key set."""

    def __init__(self, params: CryptoParams | str,
                 keys: Optional[KeySet] = None,
                 rlk_levels: Optional[list] = None):
        """`rlk_levels` restricts relinearization-key generation to the
        listed levels (default: every level >= 2).  ct x pt workloads can
        pass [] — keygen for a 12-limb ring is dominated by the unrolled
        per-level digit loops otherwise."""
        _setup_compile_cache()
        if isinstance(params, str):
            params = get_params(params)
        self.params = params
        self.ctx = CryptoContext(params)
        self.keys = keys
        self._rlk_levels = rlk_levels

        ctx = self.ctx
        self._keygen = jax.jit(
            lambda key: keygen(ctx, key, rlk_levels=rlk_levels))
        self._encrypt_sym = jax.jit(
            lambda sk, key, m: encrypt_sym(ctx, sk, key, m))
        self._encrypt_pk = jax.jit(
            lambda pk, key, m: encrypt_pk(ctx, pk, key, m))
        self._decrypt = jax.jit(lambda sk, ct: decrypt(ctx, sk, ct))
        self._add = jax.jit(lambda a, b: arith.add(ctx, a, b))
        self._sub = jax.jit(lambda a, b: arith.sub(ctx, a, b))
        self._neg = jax.jit(lambda a: arith.neg(ctx, a))
        self._mul_ct = jax.jit(lambda a, b: arith.mul_ct(ctx, a, b))
        self._relin = jax.jit(lambda rk, a: arith.relinearize(ctx, rk, a))
        self._mod_switch = jax.jit(lambda a: arith.mod_switch(ctx, a))
        self._dot_ct_pt = jax.jit(lambda a, b: dot.dot_ct_pt(ctx, a, b))
        self._dot_ct_ct = jax.jit(
            lambda rk, a, b: dot.dot_ct_ct(ctx, rk, a, b))
        self._dot_ct_ct_deg2 = jax.jit(
            lambda a, b: dot.dot_ct_ct_deg2(ctx, a, b))
        self._matvec = jax.jit(lambda cts, q: dot.matvec_ct_pt(ctx, cts, q))
        self._decrypt_dot = jax.jit(
            lambda sk, ct, d: dot.decrypt_dot(ctx, sk, ct, d),
            static_argnums=2)
        self._encrypt_vec = jax.jit(
            lambda sk, key, v: encrypt_sym(ctx, sk, key,
                                           encode_fwd(v, ctx.n)))
        self._encrypt_vec_rev = jax.jit(
            lambda sk, key, v: encrypt_sym(ctx, sk, key,
                                           encode_rev(v, ctx.n)))

    # -- keys --------------------------------------------------------------
    def generate_keys(self, seed: int = 0, on: str = "cpu") -> KeySet:
        """Generate a key set.  Runs on the CPU backend by default: keygen
        is a one-shot host-side operation whose (large, digit-unrolled)
        graph can take minutes to compile on remote-compile TPU backends,
        vs seconds on CPU; the resulting arrays are pushed to the default
        device afterwards.

        When a tunnel PJRT plugin is active in-process it routes even
        CPU-TARGET compiles through the remote service (measured: ~6 min
        for this graph vs ~3 s locally), so keygen then runs in a clean
        subprocess (ops/keygen_worker.py) with the plugin scrubbed —
        bit-identical key material, seconds of wall clock.  Set
        FHE_KEYGEN_SUBPROCESS=0 to force the in-process path.
        """
        if (on == "cpu"
                and os.environ.get("FHE_KEYGEN_SUBPROCESS", "1") == "1"
                and os.environ.get("PALLAS_AXON_POOL_IPS")
                and jax.default_backend() != "cpu"):
            ks = self._keygen_subprocess(seed)
            if ks is not None:
                self.keys = jax.device_put(ks, jax.devices()[0])
                return self.keys
        try:
            dev = jax.devices(on)[0]
        except RuntimeError:
            dev = jax.devices()[0]
        with jax.default_device(dev):
            ks = jax.block_until_ready(
                self._keygen(jax.random.PRNGKey(seed)))
        default = jax.devices()[0]
        if dev != default:
            ks = jax.device_put(ks, default)
        self.keys = ks
        return self.keys

    def _keygen_subprocess(self, seed: int) -> Optional[KeySet]:
        """Run ops/keygen_worker.py in a plugin-free subprocess."""
        import dataclasses
        import json
        import subprocess
        import sys
        import tempfile

        import numpy as np

        from .cipher import PublicKey, RelinKey, SecretKey
        cfg = json.dumps({
            "params": dataclasses.asdict(self.params),
            "seed": int(seed),
            "rlk_levels": self._rlk_levels,
        })
        env = {k: v for k, v in os.environ.items()
               if k not in ("PYTHONPATH", "PALLAS_AXON_POOL_IPS")}
        env["JAX_PLATFORMS"] = "cpu"
        repo_root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        env["PYTHONPATH"] = repo_root
        try:
            with tempfile.TemporaryDirectory() as td:
                out = os.path.join(td, "keys.npz")
                r = subprocess.run(
                    [sys.executable, "-m", "fhe_icp_tpu.ops.keygen_worker",
                     cfg, out],
                    env=env, capture_output=True, timeout=600)
                if r.returncode != 0:
                    raise RuntimeError(r.stderr.decode()[-500:])
                z = dict(np.load(out))
        except Exception as e:  # fall back to the in-process path
            import logging
            logging.getLogger(__name__).warning(
                "subprocess keygen failed (%s); using in-process path", e)
            return None
        sk = SecretKey(s=jnp.asarray(z["s"]),
                       s_ntt_mont=jnp.asarray(z["s_ntt_mont"]),
                       s2_ntt_mont=jnp.asarray(z["s2_ntt_mont"]))
        pk = PublicKey(b_ntt=jnp.asarray(z["pk_b"]),
                       a_ntt=jnp.asarray(z["pk_a"]))
        rlk = RelinKey(keys={
            int(k.split("_")[1]): jnp.asarray(v)
            for k, v in z.items() if k.startswith("rlk_")})
        return KeySet(sk=sk, pk=pk, rlk=rlk)

    def _require_keys(self) -> KeySet:
        if self.keys is None:
            raise RuntimeError("no keys loaded; call generate_keys() first")
        return self.keys

    # -- core ops ----------------------------------------------------------
    def encrypt(self, m, seed: Optional[int] = None) -> Ciphertext:
        """Encrypt with FRESH randomness by default (seed=None); pass an
        integer seed only for deterministic tests."""
        return self._encrypt_sym(self._require_keys().sk, _prng_key(seed),
                                 jnp.asarray(m, dtype=jnp.int32))

    def encrypt_public(self, m, seed: Optional[int] = None) -> Ciphertext:
        return self._encrypt_pk(self._require_keys().pk, _prng_key(seed),
                                jnp.asarray(m, dtype=jnp.int32))

    def decrypt(self, ct: Ciphertext):
        return self._decrypt(self._require_keys().sk, ct)

    def add(self, a, b):
        return self._add(a, b)

    def sub(self, a, b):
        return self._sub(a, b)

    def neg(self, a):
        return self._neg(a)

    def mul_ct(self, a, b, relinearize: bool = True):
        prod = self._mul_ct(a, b)
        if relinearize:
            prod = self._relin(self._require_keys().rlk.keys, prod)
        return prod

    def mod_switch(self, a):
        return self._mod_switch(a)

    # -- vector / dot-product API -----------------------------------------
    def encrypt_vector(self, vec, seed: Optional[int] = None,
                       rev: bool = False):
        fn = self._encrypt_vec_rev if rev else self._encrypt_vec
        return fn(self._require_keys().sk, _prng_key(seed),
                  jnp.asarray(vec, dtype=jnp.int32))

    def dot_ct_pt(self, ct, vec_clear):
        return self._dot_ct_pt(ct, jnp.asarray(vec_clear, dtype=jnp.int32))

    def dot_ct_ct(self, ct_a, ct_b_rev, relinearize: bool = True):
        """Encrypted dot product.  relinearize=False returns the degree-2
        product — bit-identical on decryption and much faster; use when
        the result is decrypted immediately rather than stored/composed."""
        if not relinearize:
            return self._dot_ct_ct_deg2(ct_a, ct_b_rev)
        return self._dot_ct_ct(self._require_keys().rlk.keys, ct_a, ct_b_rev)

    def matvec(self, cts, query_clear):
        return self._matvec(cts, jnp.asarray(query_clear, dtype=jnp.int32))

    def decrypt_dot(self, ct, d: int):
        return self._decrypt_dot(self._require_keys().sk, ct, d)

    # -- Galois rotations / SIMD slots (ops/galois.py) ----------------------
    def rotation_keys(self, seed: Optional[int] = None, levels=None,
                      digit_bits: int = 16):
        """Generate (and cache) rotation + row-flip Galois keys.

        digit_bits=16 (default) gives fine-digit keys — required for the
        rotate-and-sum chain to stay decryptable at compact presets;
        digit_bits=0 halves keygen/apply cost for roomy presets."""
        from . import galois
        if getattr(self, "_gkeys", None) is None:
            self._gkeys = galois.rotation_keygen(
                self.ctx, self._require_keys().sk, _prng_key(seed),
                levels=levels, digit_bits=digit_bits)
        return self._gkeys

    def _gkeys_for_level(self, level: int):
        """Rotation keys guaranteed to cover `level`, generating the
        missing per-level keyswitch keys on first use (rotation keys are
        otherwise level-rigid: a modulus-switched ciphertext would
        KeyError on gkeys.keys[(g, l)])."""
        from . import galois
        gk = self.rotation_keys()
        if not any(lv == level for (_, lv) in gk.keys):
            extra = galois.rotation_keygen(
                self.ctx, self._require_keys().sk, fresh_prng_key(),
                levels=[level])
            gk.keys.update(extra.keys)
        return gk

    def encrypt_slots(self, vals, seed: Optional[int] = None):
        """Encrypt (..., 2, N/2) int32 SIMD slot values."""
        from . import galois
        import numpy as np
        m = np.asarray(galois.encode_slots(self.ctx, jnp.asarray(vals)))
        return self.encrypt(m, seed=seed)

    def decrypt_slots(self, ct):
        from . import galois
        return galois.decode_slots(self.ctx, self.decrypt(ct))

    def rotate_slots(self, ct, k: int):
        from . import galois
        return galois.rotate_slots(self.ctx, self._gkeys_for_level(ct.level),
                                   ct, k)

    def dot_ct_ct_slots(self, ct_a, ct_b, d: int | None = None):
        """Fully encrypted slotwise inner product (rotate-and-sum).

        Pass a power-of-two `d` when the operands live in slots 0..d-1
        of row 0: only log2(d) prefix rotations run and the score sits
        in slot [0, 0] — the variant that stays decryptable at the
        compact production preset (ops/galois.dot_ct_ct_slots)."""
        from . import galois
        return galois.dot_ct_ct_slots(self.ctx, self._require_keys().rlk.keys,
                                      self._gkeys_for_level(ct_a.level),
                                      ct_a, ct_b, d=d)
